"""Microbench: pieces of the slab contact enumeration on the current backend.

contact_events_slab measured ~30 s/tick at 25k beads inside the segment —
this isolates which piece: the dense hit-mask blocks, jnp.nonzero
compaction (at several output sizes), the id-decode gathers, or the final
concat+compact stage.

    python bench_compact_variants.py [n_beads]
"""

import json
import sys
import time


def t(fn, *args, reps=3, sync=None):
    import jax

    out = fn(*args)
    jax.block_until_ready(out if sync is None else sync(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out if sync is None else sync(out))
    return (time.perf_counter() - t0) / reps


def note(res, key, value):
    res[key] = value
    print(f"{key}: {value}", file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    sys.path.insert(0, ".")
    import bench
    import jax
    import jax.numpy as jnp

    from genome_cycle_tpu.ops.contact import owns_pair
    from genome_cycle_tpu.ops.dense_grid import (
        _FAR,
        _OFFSETS,
        _shifted,
        DenseGrid,
        build_slabs,
    )

    res = {"backend": jax.default_backend(), "n": n}
    radius = bench._ball_radius(n)
    x = jnp.asarray(bench._chain_walk(n, bench.CHAINS, radius))
    cutoff = 0.12
    cap_events = 14 * n

    cell = 0.24
    fill = bench._grid_max_fill(
        bench._chain_walk(n, bench.CHAINS, radius), radius + 0.5, cell
    )
    cap = bench._round_up(max(int(fill * 1.3), 16), 8)
    grid = DenseGrid.cubic(bound=radius + 0.5, cell_size=cell, capacity=cap)
    note(res, "cell_cap", cap)

    # a. slab build alone
    fb = jax.jit(lambda x: build_slabs(grid, x))
    note(res, "slab_build_s", t(fb, x, sync=lambda s: s.ids))

    # b. all 27 hit-mask blocks, reduced to counts only (no compaction)
    @jax.jit
    def hits_only(x):
        slabs = build_slabs(grid, x)
        ids = slabs.ids
        valid = ids >= 0
        planes = [slabs.pos[..., k] for k in range(3)]
        pad4 = ((1, 1), (1, 1), (1, 1), (0, 0))
        planes_p = [jnp.pad(p, pad4, constant_values=_FAR) for p in planes]
        ids_p = jnp.pad(ids, pad4, constant_values=-1)
        total = jnp.zeros((), jnp.int32)
        for off in _OFFSETS:
            nbr_planes = [_shifted(p, off, grid.dims, False) for p in planes_p]
            nbr_ids = _shifted(ids_p, off, grid.dims, False)
            r2 = sum(
                (p[..., :, None] - q[..., None, :]) ** 2
                for p, q in zip(planes, nbr_planes)
            )
            hit = (
                (r2 < cutoff * cutoff)
                & valid[..., :, None]
                & (nbr_ids >= 0)[..., None, :]
                & owns_pair(ids[..., :, None], nbr_ids[..., None, :])
            )
            total = total + jnp.sum(hit).astype(jnp.int32)
        return total

    note(res, "hit_blocks_s", t(hits_only, x))
    note(res, "n_hits", int(hits_only(x)))

    # c. one nonzero over a block-sized mask at several output sizes
    m = grid.capacity
    nlanes = int(jnp.prod(jnp.asarray(grid.dims))) * m * m
    mask = jax.random.bernoulli(jax.random.PRNGKey(0), 0.001, (nlanes,))
    for size in (cap_events, cap_events // 8, 4096):
        fn = jax.jit(
            lambda mk, size=size: jnp.nonzero(mk, size=size, fill_value=nlanes)[0]
        )
        note(res, f"nonzero_{nlanes}_to_{size}_s", t(fn, mask))

    print(json.dumps(res), flush=True)


if __name__ == "__main__" and not (len(sys.argv) > 2 and sys.argv[2] == "cloop"):
    main()


def rows_cloop(grid, x, cutoff, C):
    """Per-slot contact rows via C masked reductions per offset — no scatter
    or gather touches the big block domain."""
    import jax.numpy as jnp

    from genome_cycle_tpu.ops.contact import owns_pair
    from genome_cycle_tpu.ops.dense_grid import (
        _FAR,
        _OFFSETS,
        _shifted,
        build_slabs,
    )

    slabs = build_slabs(grid, x)
    ids = slabs.ids
    valid = ids >= 0
    cutoff2 = cutoff * cutoff
    planes = [slabs.pos[..., k] for k in range(3)]
    pad4 = ((1, 1), (1, 1), (1, 1), (0, 0))
    planes_p = [jnp.pad(p, pad4, constant_values=_FAR) for p in planes]
    ids_p = jnp.pad(ids, pad4, constant_values=-1)

    rows = jnp.full(ids.shape + (C,), -1, jnp.int32)
    fill = jnp.zeros(ids.shape, jnp.int32)
    over = jnp.zeros((), jnp.int32)
    for off in _OFFSETS:
        nbr_planes = [_shifted(p, off, grid.dims, False) for p in planes_p]
        nbr_ids = _shifted(ids_p, off, grid.dims, False)
        r2 = sum(
            (p[..., :, None] - q[..., None, :]) ** 2
            for p, q in zip(planes, nbr_planes)
        )
        hit = (
            (r2 < cutoff2)
            & valid[..., :, None]
            & (nbr_ids >= 0)[..., None, :]
            & owns_pair(ids[..., :, None], nbr_ids[..., None, :])
        )
        p_slot = fill[..., None] + jnp.cumsum(hit.astype(jnp.int32), axis=-1)
        jid1 = nbr_ids[..., None, :] + 1  # -1 -> 0 so max() decodes empties
        sel_base = hit & (p_slot <= C)
        cols = []
        for c in range(C):
            sel = sel_base & (p_slot == c + 1)
            cols.append(jnp.max(jnp.where(sel, jid1, 0), axis=-1) - 1)
        new = jnp.stack(cols, axis=-1)
        rows = jnp.maximum(rows, new)
        nhit = p_slot[..., -1]
        over = over + jnp.sum(jnp.maximum(nhit - C, fill - fill)).astype(jnp.int32) * 0 \
            + jnp.sum(jnp.maximum(nhit - C, 0)).astype(jnp.int32)
        fill = jnp.minimum(nhit, C)
    return rows, fill, over, slabs


def extra_main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    sys.path.insert(0, ".")
    import bench
    import jax
    import jax.numpy as jnp

    from genome_cycle_tpu.ops.contact import (
        compact_contact_events,
        ContactList,
    )
    from genome_cycle_tpu.ops.dense_grid import DenseGrid, scatter_from_slab

    res = {"backend": jax.default_backend(), "n": n}
    radius = bench._ball_radius(n)
    xh = bench._chain_walk(n, bench.CHAINS, radius)
    x = jnp.asarray(xh)
    cutoff = 0.122
    C = 24

    cell = 0.125
    fill = bench._grid_max_fill(xh, radius + 0.5, cell)
    cap = bench._round_up(max(int(fill * 1.3), 8), 8)
    grid = DenseGrid.cubic(bound=radius + 0.5, cell_size=cell, capacity=cap)
    note(res, "cloop_cell_cap", cap)

    @jax.jit
    def full(x):
        rows, rfill, over, slabs = rows_cloop(grid, x, cutoff, C)
        # slab rows -> bead rows (N, C), then compact in the small domain
        bead_rows = scatter_from_slab(rows, slabs.ids, n).astype(jnp.int32)
        ct = ContactList(
            ids=bead_rows,
            counts=(bead_rows >= 0).astype(jnp.int32),
            fill=jnp.zeros((n,), jnp.int32),
            overflow=over,
            ref_pos=x,
            drift2=jnp.zeros((), x.dtype),
        )
        ev, ne = compact_contact_events(ct, 14 * n)
        return ev, ne, over, slabs.overflow

    ev, ne, over, sov = full(x)
    note(res, "cloop_n_events", int(ne))
    note(res, "cloop_row_overflow", int(over))
    note(res, "cloop_slab_overflow", int(sov))
    note(res, "cloop_full_s", t(full, x, sync=lambda r: r[0]))
    print(json.dumps(res), flush=True)


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "cloop":
    extra_main()
