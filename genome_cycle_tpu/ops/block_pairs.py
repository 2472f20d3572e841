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
   therefore reads 9 dynamic slices of width W ~ B + O(cell fill), not 27
   capacity-padded cell blocks;
4. pair math runs on dense (B, W) tiles per block and column — elementwise
   VPU work with no per-element gathers in the pair loop (the slice gather
   is 9 contiguous row-reads per block);
5. per-bead forces reduce over the W axis and scatter back through the sort
   permutation.

Total lanes = N * 9 * W.  Density skew widens W *linearly* (a hot cell
stretches only the slices that contain it), the empty-cube overhead of the
slab layout disappears (empty cells occupy no sorted positions), and the
largest temporary is a (N/B, B, W) tile block — no multi-GB resident set at
100k beads (the slab engine's 27 unrolled offsets crashed the device there).

Stencil-column intervals of one block can overlap when the block spans
nearly a whole z-column of cells (sparse regions, small grids); overlapping
cells would double-count pairs.  The columns are processed in ascending
static base order and each interval's end is clipped to the next interval's
start — the union is unchanged, so every candidate cell is covered exactly
once (`test_block_pairs.py` covers degenerate grids).

Correctness contract matches :func:`neighbor.pairwise_forces_cell`: beads
outside the grid clamp to boundary cells (true coordinates still used),
slice-width overflow is counted and surfaced, never silently dropped.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_FAR = 1e15


@dataclasses.dataclass(frozen=True)
class BlockGrid:
    """Static geometry + engine shape (jit cache key).

    ``width`` is the per-column candidate-slice capacity W; the engine
    reports the widest slice actually needed so drivers can retry a grown
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


def block_pair_forces(grid: BlockGrid, positions, extras, coeff_fn,
                      energy_fn=None):
    """Pairwise forces via sorted-block range slices.

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
    b = grid.block
    w = grid.width
    n_blocks = -(-n // b)
    n_pad = n_blocks * b
    dtype = positions.dtype

    lower = jnp.asarray(grid.lower, dtype)
    dims = jnp.asarray(grid.dims, jnp.int32)
    coords = jnp.floor((positions - lower) / grid.cell_size).astype(jnp.int32)
    coords = jnp.clip(coords, 0, dims - 1)
    _, ny, nz = grid.dims
    cid = (coords[:, 0] * ny + coords[:, 1]) * nz + coords[:, 2]

    order = jnp.argsort(cid)
    cid_s = cid[order]

    # Sorted per-coordinate planes + extra channels, padded to whole blocks.
    pad = n_pad - n

    def sort_pad(v, fill):
        v = v[order]
        if pad:
            v = jnp.concatenate([v, jnp.full((pad,), fill, v.dtype)])
        return v

    planes_s = tuple(sort_pad(positions[:, k], _FAR) for k in range(3))
    extras_s = tuple(sort_pad(e, 0.0) for e in extras)

    # cell id -> sorted bead range (monotone).
    cell_ids = jnp.arange(grid.num_cells + 1, dtype=cid_s.dtype)
    starts = jnp.searchsorted(cid_s, cell_ids, side="left").astype(jnp.int32)

    # Block cell spans.
    blk = jnp.arange(n_blocks, dtype=jnp.int32)
    c_lo = cid_s[blk * b]
    c_hi = cid_s[jnp.minimum(blk * b + b - 1, n - 1)]

    # Per-column candidate slices [j_lo, j_hi), clipped disjoint.
    bases = grid.column_bases
    j_lo_list, j_hi_list = [], []
    for base in bases:
        lo_cell = jnp.clip(c_lo + base - 1, 0, grid.num_cells)
        hi_cell = jnp.clip(c_hi + base + 2, 0, grid.num_cells)  # exclusive
        j_lo_list.append(starts[lo_cell])
        j_hi_list.append(starts[hi_cell])
    for g in range(len(bases) - 1):
        # Ascending disjoint intervals: drop any overlap into the next column
        # (cell coverage of the union is unchanged).
        j_hi_list[g] = jnp.minimum(j_hi_list[g], j_lo_list[g + 1])
        j_lo_list[g + 1] = jnp.maximum(j_lo_list[g + 1], j_hi_list[g])

    widths = [jnp.maximum(hi - lo, 0) for lo, hi in zip(j_lo_list, j_hi_list)]
    max_width = jnp.maximum(
        jnp.max(jnp.stack([jnp.max(wd) for wd in widths])), 0
    ).astype(jnp.int32)
    overflow = sum(
        jnp.sum(jnp.maximum(wd - w, 0)) for wd in widths
    ).astype(jnp.int32)

    # i-side tiles.
    si = jnp.arange(n_pad, dtype=jnp.int32).reshape(n_blocks, b)
    i_planes = tuple(p.reshape(n_blocks, b) for p in planes_s)
    i_extras = tuple(e.reshape(n_blocks, b) for e in extras_s)

    forces = [jnp.zeros((n_blocks, b), dtype) for _ in range(3)]
    energy = jnp.asarray(0.0, dtype)

    # Row-quantized candidate windows: snap each slice start down to a
    # 128-lane row and fetch whole rows — per-element gathers of the j-side
    # channels cost ~30x their bytes on TPU (measured: the element-gather
    # variant ran 28x fewer lanes than the slab engine at the same speed);
    # row gathers of 512-byte lines are the supported fast path.  One extra
    # row absorbs the snap; masks handle both ragged ends.
    g_row = 128
    wq = (-(-w // g_row) + 1) * g_row  # whole rows covering W plus the snap
    k_rows = wq // g_row
    n_rows = n_pad // g_row if n_pad % g_row == 0 else -(-n_pad // g_row)
    rows_pad = n_rows * g_row - n_pad
    row_of = jnp.arange(k_rows, dtype=jnp.int32)

    def as_rows(v, fill):
        if rows_pad:
            v = jnp.concatenate([v, jnp.full((rows_pad,), fill, v.dtype)])
        return v.reshape(n_rows, g_row)

    planes_r = tuple(as_rows(p, _FAR) for p in planes_s)
    extras_r = tuple(as_rows(e, 0.0) for e in extras_s)

    for g in range(len(bases)):
        j_lo = j_lo_list[g]
        j_hi = j_hi_list[g]
        row0 = j_lo // g_row
        rows_raw = row0[:, None] + row_of[None, :]
        rows = jnp.minimum(rows_raw, n_rows - 1)
        # (n_blocks, K, 128) -> (n_blocks, Wq) lane windows.
        j_planes = tuple(p[rows].reshape(n_blocks, wq) for p in planes_r)
        j_extras = tuple(e[rows].reshape(n_blocks, wq) for e in extras_r)
        # Lane ids from the UNCLAMPED rows: a clamped duplicate row re-reads
        # real beads, and ids past n_pad make the validity mask reject them
        # (ids from the clamped rows would double-count the final rows).
        sj = (rows_raw[:, :, None] * g_row
              + jnp.arange(g_row, dtype=jnp.int32)).reshape(n_blocks, wq)
        valid_j = (sj >= j_lo[:, None]) & (sj < j_hi[:, None])

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
    out = out.at[order].set(force_rows, unique_indices=True)
    return out, energy, overflow, max_width
