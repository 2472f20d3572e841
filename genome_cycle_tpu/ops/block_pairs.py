"""Sorted-block range pair engine: density-robust TPU formulation.

The dense cell-slab engine (:mod:`dense_grid`) pays ``cells * 27 * M**2``
pair lanes with M = the *globally densest* cell's capacity — one hot cell
inflates every cell's block quadratically (measured: the driver bench ran 25k
beads at M=256 for a ~60-bead mean fill, >100x lane waste over true
candidates).  This module reformulates the same computation with lanes
**linear** in the density skew:

1. beads are sorted by flat cell id (one argsort per call — the slab engine
   already paid this);
2. the sorted order is cut into fixed blocks of ``B`` consecutive beads
   (B = 128: one full TPU lane tile per i-row);
3. for a block spanning sorted cells [c_lo, c_hi] and each of the 9 stencil
   columns g = (dx, dy), the candidate partners — all beads in cells
   [c_lo + base_g - 1, c_hi + base_g + 1] (the dz in {-1,0,1} span merges
   into one id interval) — occupy ONE CONTIGUOUS SLICE of the sorted bead
   arrays, because cell id -> sorted position is monotone.  Each block
   therefore reads 9 dynamic windows, not 27 capacity-padded cell blocks;
4. j-side channels are fetched as whole 128-lane rows (slice starts snapped
   down to a row boundary): per-element gathers cost ~30x their bytes on
   TPU — the element-gather variant of this engine ran 28x fewer lanes than
   the slab engine at the same wall time; row gathers are the fast path;
5. pair math runs on dense (B, Wq) tiles per block and column — elementwise
   VPU work — then reduces over the window axis and scatters back through
   the sort permutation.

Total lanes = N * 9 * Wq.  Density skew widens the window *linearly* (a hot
cell stretches only the slices containing it), the empty-cube overhead of
the slab layout disappears (empty cells occupy no sorted positions), and the
largest temporary is a (N/B, B, Wq) tile block — no multi-GB resident set
at 100k beads (the slab engine's 27 unrolled offsets crashed the device
there).  Measured on v5e (bench_block_vs_slab.py, full call including sort
and scatter-back): 10.7 ms vs 57.6 ms at 25k beads, 27 ms vs 531 ms at
100k, force agreement 2e-7 relative.

Stencil-column intervals of one block can overlap when the block spans
nearly a whole z-column of cells (sparse regions, small grids); overlapping
cells would double-count pairs.  The columns are processed in ascending
static base order and each interval's end is clipped to the next interval's
start — the union is unchanged, so every candidate cell is covered exactly
once (`test_block_pairs.py` covers degenerate grids).

Correctness contract matches :func:`neighbor.pairwise_forces_cell`: beads
outside the grid clamp to boundary cells (true coordinates still used),
window-width overflow is counted and surfaced, never silently dropped.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_FAR = 1e15
_ROW = 128   # j-side gather granularity (one lane tile)
_SUB = 2048  # max pair-block lane width per fused compute chunk: the
             # (n_blocks, B, Wq) elementwise temporaries scale with the
             # window width, and the relaxation structure's density skew
             # can push W past 7000 (probed on the 60k-bead hg38 spline
             # structure) — unchunked that is multiple GB per live
             # temporary and crashed the TPU worker.


@dataclasses.dataclass(frozen=True)
class BlockGrid:
    """Static geometry + engine shape (jit cache key).

    ``width`` is the per-column candidate-window capacity W; the engine
    reports the widest window actually needed so drivers can retry a grown
    width exactly like cell-capacity overflow.
    """

    lower: tuple[float, float, float]
    cell_size: float
    dims: tuple[int, int, int]
    width: int
    block: int = 128

    @classmethod
    def cubic(cls, bound: float, cell_size: float, width: int,
              block: int = 128) -> "BlockGrid":
        n = max(int(np.ceil(2.0 * bound / cell_size)), 1)
        return cls(
            lower=(-bound, -bound, -bound),
            cell_size=float(cell_size),
            dims=(n, n, n),
            width=int(width),
            block=int(block),
        )

    @property
    def num_cells(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz

    @property
    def column_bases(self) -> tuple[int, ...]:
        """The 9 (dx, dy) stencil-column id offsets, ascending (static)."""
        _, ny, nz = self.dims
        return tuple(
            sorted((dx * ny + dy) * nz for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        )


class BlockStructure(NamedTuple):
    """Sorted bead layout + per-block candidate windows (one build per call;
    the force and contact consumers share it when evaluated at the same
    positions)."""

    order: jnp.ndarray        # (n,) sorted position -> original bead id
    planes_r: tuple           # 3x (n_rows, 128) sorted coordinate rows
    extras_r: tuple           # per-channel (n_rows, 128) sorted rows
    j_lo: jnp.ndarray         # (9, n_blocks) window starts (sorted space)
    j_hi: jnp.ndarray         # (9, n_blocks) window ends, exclusive
    overflow: jnp.ndarray     # () int32 candidates beyond the width capacity
    max_width: jnp.ndarray    # () int32 widest window needed (watermark)


def _shape(grid: BlockGrid, n: int):
    b = grid.block
    n_blocks = -(-n // b)
    n_pad = n_blocks * b
    n_rows = -(-n_pad // _ROW)
    wq = (-(-grid.width // _ROW) + 1) * _ROW  # whole rows covering W + snap
    return b, n_blocks, n_pad, n_rows, wq


def build_structure(grid: BlockGrid, positions, extras=(),
                    valid=None) -> BlockStructure:
    """Sort beads by cell id and derive each block's 9 candidate windows.

    ``valid`` optionally masks rows out entirely (empty slots of a
    fixed-capacity bead buffer, e.g. the halo engine's slab layout): masked
    rows sort past every real cell, never enter any window, and never open
    their own (without the mask, hundreds of FAR-padded slots clump into
    the corner cell and inflate every window watermark that touches it).
    """
    n = positions.shape[0]
    b, n_blocks, n_pad, n_rows, _ = _shape(grid, n)
    dtype = positions.dtype

    lower = jnp.asarray(grid.lower, dtype)
    dims = jnp.asarray(grid.dims, jnp.int32)
    coords = jnp.floor((positions - lower) / grid.cell_size).astype(jnp.int32)
    coords = jnp.clip(coords, 0, dims - 1)
    _, ny, nz = grid.dims
    cid = (coords[:, 0] * ny + coords[:, 1]) * nz + coords[:, 2]
    if valid is not None:
        cid = jnp.where(valid, cid, grid.num_cells)

    order = jnp.argsort(cid)
    cid_s = cid[order]

    rows_pad = n_rows * _ROW - n

    def sort_rows(v, fill):
        v = v[order]
        if valid is not None:
            v = jnp.where(cid_s < grid.num_cells, v, fill)
        if rows_pad:
            v = jnp.concatenate([v, jnp.full((rows_pad,), fill, v.dtype)])
        return v.reshape(n_rows, _ROW)

    planes_r = tuple(sort_rows(positions[:, k], _FAR) for k in range(3))
    extras_r = tuple(sort_rows(e, 0.0) for e in extras)

    # cell id -> sorted bead range (monotone).
    cell_ids = jnp.arange(grid.num_cells + 1, dtype=cid_s.dtype)
    starts = jnp.searchsorted(cid_s, cell_ids, side="left").astype(jnp.int32)

    blk = jnp.arange(n_blocks, dtype=jnp.int32)
    if valid is None:
        last_valid = n - 1
    else:
        # Masked rows all sort after every real one.
        last_valid = jnp.sum(cid_s < grid.num_cells).astype(jnp.int32) - 1
    c_lo = cid_s[jnp.clip(blk * b, 0, jnp.maximum(last_valid, 0))]
    c_hi = cid_s[jnp.clip(blk * b + b - 1, 0, jnp.maximum(last_valid, 0))]
    # Blocks that start past the last real row open no windows at all.
    dead = blk * b > last_valid

    bases = grid.column_bases
    j_lo_list, j_hi_list = [], []
    for base in bases:
        lo_cell = jnp.clip(c_lo + base - 1, 0, grid.num_cells)
        hi_cell = jnp.clip(c_hi + base + 2, 0, grid.num_cells)  # exclusive
        j_lo = starts[lo_cell]
        j_hi = starts[hi_cell]
        j_lo_list.append(j_lo)
        j_hi_list.append(jnp.where(dead, j_lo, j_hi))
    for g in range(len(bases) - 1):
        # Ascending disjoint intervals: drop any overlap into the next column
        # (cell coverage of the union is unchanged).
        j_hi_list[g] = jnp.minimum(j_hi_list[g], j_lo_list[g + 1])

    widths = [jnp.maximum(hi - lo, 0) for lo, hi in zip(j_lo_list, j_hi_list)]
    max_width = jnp.maximum(
        jnp.max(jnp.stack([jnp.max(wd) for wd in widths])), 0
    ).astype(jnp.int32)
    overflow = sum(
        jnp.sum(jnp.maximum(wd - grid.width, 0)) for wd in widths
    ).astype(jnp.int32)

    return BlockStructure(
        order=order.astype(jnp.int32),
        planes_r=planes_r,
        extras_r=extras_r,
        j_lo=jnp.stack(j_lo_list),
        j_hi=jnp.stack(j_hi_list),
        overflow=overflow,
        max_width=max_width,
    )


def _window(grid: BlockGrid, struct: BlockStructure, g: int, n: int):
    """Column g's row-quantized j-side window.

    Returns (j_planes 3x(n_blocks, Wq), j_extras, sj (n_blocks, Wq) sorted
    lane ids, valid (n_blocks, Wq)).
    """
    b, n_blocks, n_pad, n_rows, wq = _shape(grid, n)
    k_rows = wq // _ROW
    j_lo = struct.j_lo[g]
    j_hi = struct.j_hi[g]
    row0 = j_lo // _ROW
    rows_raw = row0[:, None] + jnp.arange(k_rows, dtype=jnp.int32)[None, :]
    rows = jnp.minimum(rows_raw, n_rows - 1)
    j_planes = tuple(p[rows].reshape(n_blocks, wq) for p in struct.planes_r)
    j_extras = tuple(e[rows].reshape(n_blocks, wq) for e in struct.extras_r)
    # Lane ids from the UNCLAMPED rows: a clamped duplicate row re-reads real
    # beads, and ids past the end make the validity mask reject them (ids
    # from the clamped rows would double-count the final rows).
    sj = (rows_raw[:, :, None] * _ROW
          + jnp.arange(_ROW, dtype=jnp.int32)).reshape(n_blocks, wq)
    valid = (sj >= j_lo[:, None]) & (sj < j_hi[:, None])
    return j_planes, j_extras, sj, valid


def _i_tiles(grid: BlockGrid, struct: BlockStructure, n: int):
    b, n_blocks, n_pad, _, _ = _shape(grid, n)
    si = jnp.arange(n_pad, dtype=jnp.int32).reshape(n_blocks, b)
    i_planes = tuple(
        p.reshape(-1)[:n_pad].reshape(n_blocks, b) for p in struct.planes_r
    )
    i_extras = tuple(
        e.reshape(-1)[:n_pad].reshape(n_blocks, b) for e in struct.extras_r
    )
    return si, i_planes, i_extras


def block_pair_forces(grid: BlockGrid, positions, extras, coeff_fn,
                      energy_fn=None, struct: BlockStructure | None = None):
    """Pairwise forces via sorted-block range windows.

    ``coeff_fn(r2, e_i, e_j) -> c`` with F_i = sum_j c_ij (x_i - x_j);
    ``e_i``/``e_j`` are tuples of the ``extras`` channels broadcast to the
    pair block, mirroring :func:`dense_grid.pair_forces_slab`'s contract.
    ``energy_fn`` same signature for u(r2) (each unordered pair seen twice;
    the half factor is applied here).

    Returns ``(forces (N, 3), energy, overflow, max_width)`` where
    ``overflow`` counts candidate beads beyond the width capacity (any
    nonzero means dropped pairs -> caller must retry with a wider grid) and
    ``max_width`` is the watermark for adaptive sizing.
    """
    n = positions.shape[0]
    b, n_blocks, n_pad, _, _ = _shape(grid, n)
    dtype = positions.dtype
    if struct is None:
        struct = build_structure(grid, positions, extras)

    si, i_planes, i_extras = _i_tiles(grid, struct, n)
    forces = [jnp.zeros((n_blocks, b), dtype) for _ in range(3)]
    energy = jnp.asarray(0.0, dtype)

    _, _, _, _, wq = _shape(grid, n)
    for g in range(len(grid.column_bases)):
        j_planes_f, j_extras_f, sj_f, valid_f = _window(grid, struct, g, n)

        for s0 in range(0, wq, _SUB):
            sl = slice(s0, min(s0 + _SUB, wq))
            j_planes = tuple(p[:, sl] for p in j_planes_f)
            j_extras = tuple(e[:, sl] for e in j_extras_f)
            sj = sj_f[:, sl]
            valid_j = valid_f[:, sl]

            dxs = [
                ip[:, :, None] - jp[:, None, :]
                for ip, jp in zip(i_planes, j_planes)
            ]
            r2 = dxs[0] * dxs[0] + dxs[1] * dxs[1] + dxs[2] * dxs[2]
            # Self-pairs: same sorted position.
            r2 = jnp.where(si[:, :, None] == sj[:, None, :], _FAR, r2)

            e_i = tuple(ie[:, :, None] for ie in i_extras)
            e_j = tuple(je[:, None, :] for je in j_extras)
            c = coeff_fn(r2, e_i, e_j)
            c = jnp.where(valid_j[:, None, :], c, 0.0)
            for k in range(3):
                forces[k] = forces[k] + jnp.sum(c * dxs[k], axis=-1)

            if energy_fn is not None:
                u = energy_fn(r2, e_i, e_j)
                u = jnp.where(valid_j[:, None, :], u, 0.0)
                u = jnp.where(si[:, :, None] < n, u, 0.0)
                energy = energy + 0.5 * jnp.sum(u)

    # Sorted forces -> original bead order (inverse of the sort gather).
    out = jnp.zeros((n, 3), dtype)
    force_rows = jnp.stack(
        [f.reshape(n_pad) for f in forces], axis=-1
    )[:n]
    out = out.at[struct.order].set(force_rows, unique_indices=True)
    return out, energy, struct.overflow, struct.max_width


def block_contact_events(grid: BlockGrid, positions, cutoff,
                         events_capacity: int,
                         struct: BlockStructure | None = None):
    """All pairs within ``cutoff`` as a fixed-capacity event list, scatter-free.

    A tick needs the (i, j) identity of every in-range pair.  Any
    formulation that scatters from the full candidate-lane domain pays the
    TPU's per-update scatter cost on N*9*Wq lanes — measured 2.4 s per tick
    at 25k beads, 220x the pair force, with masks+cumsum at only 28 ms.
    This extraction never scatters:

    1. hit masks are computed per column exactly as the pair force does,
       reduced to per-(row, column, 128-lane tile) counts, and stored as
       bytes (one elementwise pass);
    2. a hierarchical exclusive cumsum (per-row totals, then per-row tile
       prefix) assigns every hit a dense event index;
    3. each event index finds its row by one binary search over the per-row
       offsets, its tile by comparing against the row's (9*K,) tile prefix
       (one 128-byte-granular row gather), and its lane by a cumsum over
       the tile's 128 stored mask bytes (another row gather) — all gathers
       are row-granular, the fast TPU path.

    Each unordered pair is emitted exactly once (sorted-index ownership
    i < j; no per-row capacity exists to balance).  Returns ``(events
    (E, 3) int32 [i, j, 1] in ORIGINAL bead ids with i = -1 padding,
    n_events, width_overflow, max_width)``; ``n_events > events_capacity``
    means truncation (the driver grows the capacity and reruns).
    """
    n = positions.shape[0]
    b, n_blocks, n_pad, _, wq = _shape(grid, n)
    if struct is None:
        struct = build_structure(grid, positions)
    cutoff2 = jnp.asarray(cutoff * cutoff, positions.dtype)
    si, i_planes, _ = _i_tiles(grid, struct, n)
    n_cols = len(grid.column_bases)
    k_tiles = wq // _ROW

    word_shift = jnp.arange(32, dtype=jnp.uint32)
    sub_tiles = _SUB // _ROW
    take_cols = []
    counts_cols = []
    for g in range(n_cols):
        j_planes_f, _, sj_f, valid_f = _window(grid, struct, g, n)
        packed_chunks = []
        # Lane-chunked like the force path: bounded temporaries at any
        # window width (the relaxation structure's skew).
        for t0 in range(0, k_tiles, sub_tiles):
            t1 = min(t0 + sub_tiles, k_tiles)
            sl = slice(t0 * _ROW, t1 * _ROW)
            j_planes = tuple(p[:, sl] for p in j_planes_f)
            sj = sj_f[:, sl]
            valid_j = valid_f[:, sl]
            dxs = [
                ip[:, :, None] - jp[:, None, :]
                for ip, jp in zip(i_planes, j_planes)
            ]
            r2 = dxs[0] * dxs[0] + dxs[1] * dxs[1] + dxs[2] * dxs[2]
            take = (
                valid_j[:, None, :]
                & (si[:, :, None] < sj[:, None, :])
                & (r2 < cutoff2)
            )
            # Bit-pack 32 lanes per word: byte masks at production size are
            # ~1.7 GB per tick and OOM'd the fused 100k chunk at compile.
            # The packed words are the ONLY consumer of the big elementwise
            # chain — counts derive from popcount on the words — so XLA
            # fuses the whole mask computation into this one reduction
            # instead of materializing (N, K, 128) temporaries (which
            # OOM'd the fused 25k chunk: ~20 live 208 MB buffers).
            packed_chunks.append(
                jnp.sum(
                    take.reshape(n_pad, t1 - t0, 4, 32).astype(jnp.uint32)
                    << word_shift[None, None, None, :],
                    axis=-1,
                    dtype=jnp.uint32,
                )
            )
        packed = jnp.concatenate(packed_chunks, axis=1)
        take_cols.append(packed)                       # (n_pad, K, 4) u32
        counts_cols.append(
            jnp.sum(
                jax.lax.population_count(packed).astype(jnp.int32), axis=-1
            )
        )

    # (n_pad, n_cols*K) per-tile counts and packed masks.
    tile_counts = jnp.concatenate(counts_cols, axis=1)
    take_bits = jnp.concatenate(take_cols, axis=1)     # (n_pad, G*K, 4)

    # Hierarchical event indexing.
    tile_prefix = jnp.cumsum(tile_counts, axis=1)      # inclusive, per row
    row_counts = tile_prefix[:, -1]
    row_offsets = jnp.cumsum(row_counts)               # inclusive
    n_events = row_offsets[-1].astype(jnp.int32)

    e_cap = int(events_capacity)

    def extract(e_ids):
        """Locate a block of event indices; all temporaries are E-chunk
        sized (an adaptive capacity in the millions would otherwise hold
        ~10 E-sized temporaries per tick x 10 unrolled ticks — a 60k-bead
        chunk compile demanded 58 GB of HBM before this bound)."""
        valid_e = e_ids < n_events
        # Row: first row whose inclusive offset exceeds the event index.
        row = jnp.searchsorted(
            row_offsets, e_ids, side="right"
        ).astype(jnp.int32)
        row = jnp.minimum(row, n_pad - 1)
        row_start = jnp.where(row > 0, row_offsets[row - 1], 0)
        rank_in_row = e_ids - row_start.astype(jnp.int32)

        # Tile within the row: compare against the row's tile prefix
        # (row-gather of the (G*K,) prefix, then a lane-wise count).
        prefix_rows = tile_prefix[row]                 # (E, G*K)
        tile = jnp.sum(
            (prefix_rows <= rank_in_row[:, None]).astype(jnp.int32), axis=1
        )
        tile = jnp.minimum(tile, n_cols * k_tiles - 1)
        tile_start = jnp.where(
            tile > 0,
            jnp.take_along_axis(
                prefix_rows, jnp.maximum(tile - 1, 0)[:, None], axis=1
            )[:, 0],
            0,
        )
        rank_in_tile = rank_in_row - tile_start

        # Lane within the tile: unpack the tile's 4 mask words, cumsum over
        # the 128 bits.
        flat_tile = row * (n_cols * k_tiles) + tile
        words = take_bits.reshape(-1, 4)[flat_tile]    # (E, 4) u32
        bits = (
            (words[:, :, None] >> word_shift[None, None, :]) & jnp.uint32(1)
        ).reshape(-1, _ROW).astype(jnp.int32)          # (E, 128)
        lane_prefix = jnp.cumsum(bits, axis=1)
        lane = jnp.argmax(
            (lane_prefix == rank_in_tile[:, None] + 1) & (bits > 0), axis=1
        ).astype(jnp.int32)

        # Decode (column, tile) -> sorted j id via the window row base.
        g_of = tile // k_tiles
        t_of = tile % k_tiles
        blk = row // b
        row0 = (struct.j_lo // _ROW)[g_of, blk]        # (E,)
        sj = (row0 + t_of) * _ROW + lane

        # Sorted -> original ids.
        i_ids = struct.order[jnp.minimum(row, n - 1)]
        j_ids = struct.order[jnp.clip(sj, 0, n - 1)]
        i_out = jnp.where(valid_e, i_ids, -1)
        j_out = jnp.where(valid_e, j_ids, -1)
        ones = jnp.where(valid_e, 1, 0).astype(jnp.int32)
        return jnp.stack([i_out, j_out, ones], axis=1)

    e_sub = 1 << 18
    if e_cap <= e_sub:
        events = extract(jnp.arange(e_cap, dtype=jnp.int32))
    else:
        n_chunks = -(-e_cap // e_sub)
        chunks = jax.lax.map(
            lambda c0: extract(c0 * e_sub + jnp.arange(e_sub, dtype=jnp.int32)),
            jnp.arange(n_chunks, dtype=jnp.int32),
        )
        events = chunks.reshape(n_chunks * e_sub, 3)[:e_cap]
    return events, n_events, struct.overflow, struct.max_width


def block_contact_rows(grid: BlockGrid, positions, cutoff, row_capacity: int,
                       struct: BlockStructure | None = None):
    """All pairs within ``cutoff`` as fixed-capacity owner rows.

    The contact-tick analogue of :func:`contact.build_contact_list` on the
    sorted-block structure: per column, hit lanes compact into per-row slots
    with a running-fill prefix scan; each unordered pair lands on exactly one
    owner row (parity of the sorted indices — the same load-balancing trick
    as :func:`contact.owns_pair`, in sorted space).

    Returns ``(ids (n_pad, cap) int32 ORIGINAL partner ids (-1 empty),
    row_ids (n_pad,) original id per row (-1 on padding), row_overflow,
    width_overflow, max_width)``.  Feed to
    :func:`contact.compact_contact_events` with ``row_ids``.
    """
    n = positions.shape[0]
    b, n_blocks, n_pad, _, wq = _shape(grid, n)
    if struct is None:
        struct = build_structure(grid, positions)
    cutoff2 = jnp.asarray(cutoff * cutoff, positions.dtype)

    si, i_planes, _ = _i_tiles(grid, struct, n)
    cap = int(row_capacity)
    ids = jnp.full((n_pad, cap), -1, jnp.int32)
    fill = jnp.zeros((n_pad,), jnp.int32)
    over = jnp.zeros((), jnp.int32)
    row_idx = jnp.arange(n_pad, dtype=jnp.int32).reshape(n_blocks, b)

    for g in range(len(grid.column_bases)):
        j_planes, _, sj, valid_j = _window(grid, struct, g, n)
        dxs = [
            ip[:, :, None] - jp[:, None, :]
            for ip, jp in zip(i_planes, j_planes)
        ]
        r2 = dxs[0] * dxs[0] + dxs[1] * dxs[1] + dxs[2] * dxs[2]
        sj3 = sj[:, None, :]
        si3 = si[:, :, None]
        lower = si3 < sj3
        even = ((si3 + sj3) % 2) == 0
        owns = jnp.where(even, lower, ~lower) & (si3 != sj3)
        take = valid_j[:, None, :] & owns & (r2 < cutoff2)

        prefix = jnp.cumsum(take.astype(jnp.int32), axis=-1)
        slot = fill.reshape(n_blocks, b)[:, :, None] + prefix - 1
        ok = take & (slot < cap)
        rows3 = jnp.broadcast_to(row_idx[:, :, None], slot.shape)
        # Every in-bounds (row, slot) target is written by exactly one lane
        # (the prefix compaction guarantees it; rejected lanes aim at the
        # out-of-bounds dump column and are dropped).  Declaring that lets
        # XLA parallelize the scatter — without it the TPU serializes all
        # ~N*9*Wq updates (measured 2.45 s per tick at 25k beads, 220x the
        # pair force).
        ids = ids.at[rows3, jnp.where(ok, slot, cap)].set(
            jnp.broadcast_to(sj3, slot.shape), mode="drop",
            unique_indices=True,
        )
        fill = fill + prefix[:, :, -1].reshape(n_pad)
        over = over + jnp.sum(take & ~ok).astype(jnp.int32)

    # Sorted partner ids -> original bead ids (small (n_pad, cap) gather).
    safe = jnp.minimum(jnp.maximum(ids, 0), n - 1)
    ids = jnp.where(ids >= 0, struct.order[safe], -1)
    row_ids = jnp.concatenate(
        [struct.order, jnp.full((n_pad - n,), -1, jnp.int32)]
    ) if n_pad > n else struct.order
    return ids, row_ids, over, struct.overflow, struct.max_width
