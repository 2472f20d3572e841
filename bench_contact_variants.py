"""Microbench: contact-accumulation and dense-pair formulations on TPU.

Motivated by bench_diag at 25k beads: the coarse contact grid (cell =
cutoff+margin = 0.49, per-cell capacity ~256) costs 14.2 s per list build —
73% of a segment — because gather-fold lanes scale with capacity^2.  The
margin-free alternative builds the list AT the tick step (cutoff = contact
distance itself, 0.12) on a grid 4x finer: ~60x fewer fold lanes, and the
listed pairs ARE the tick's contact events (reference semantics exactly:
fresh search every update, contact_map.cpp:33-63 — no margin, no drift
machinery at all).

Also times the dense pair force across cell-size buckets: the round-2
"finer cell buckets" change (cell 0.165, M=32) was never validated on
hardware and bench_diag shows 1.7 Glanes/s vs ~10 at round-1 shapes.

    python bench_contact_variants.py [n_beads]
"""

import json
import sys
import time

import numpy as np


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

    from genome_cycle_tpu.ops import potentials as pot
    from genome_cycle_tpu.ops.contact import (
        build_contact_list,
        compact_contact_events,
    )
    from genome_cycle_tpu.ops.dense_grid import (
        DenseGrid,
        build_slabs,
        pair_forces_slab,
        scatter_from_slab,
    )
    from genome_cycle_tpu.ops.neighbor import CellGrid, build_cell_table

    res = {"backend": jax.default_backend(), "n": n}
    radius = bench._ball_radius(n)
    xh = bench._chain_walk(n, bench.CHAINS, radius)
    x = jnp.asarray(xh)
    af = jnp.zeros((n,), jnp.float32).at[::2].set(1.0)
    bf = jnp.zeros((n,), jnp.float32).at[1::2].set(1.0)
    bound = radius + 0.5

    # --- contact builds ----------------------------------------------------
    dist = 0.24 * 0.5  # contact distance at early-G1 core_scale

    def probe_cap(cell, mult=1.5, floor=8):
        fill = bench._grid_max_fill(xh, bound, cell)
        return bench._round_up(max(int(fill * mult), floor), 8)

    def build_at(name, cell, cutoff, row_cap):
        cap = probe_cap(cell)
        grid = CellGrid.cubic(bound=bound, cell_size=cell, capacity=cap)

        @jax.jit
        def fn(x):
            table, ov, _ = build_cell_table(grid, x)
            ct = build_contact_list(grid, table, x, cutoff, row_cap)
            return ct

        ct = fn(x)
        note(res, f"{name}_overflow", int(ct.overflow))
        note(res, f"{name}_cell_cap", cap)
        note(res, f"{name}_build_s", t(fn, x, sync=lambda c: c.ids))

        @jax.jit
        def fn_events(x):
            table, ov, _ = build_cell_table(grid, x)
            ct = build_contact_list(grid, table, x, cutoff, row_cap)
            ct = ct._replace(counts=(ct.ids >= 0).astype(jnp.int32))
            ev, ne = compact_contact_events(ct, 14 * n)
            return ev, ne

        note(
            res, f"{name}_build_compact_s",
            t(fn_events, x, sync=lambda r: r[0]),
        )
        return fn_events

    # margin-free at the tick step: cutoff = distance itself, fine grid
    fine = build_at("fine_marginfree", cell=max(dist, 0.125), cutoff=dist,
                    row_cap=16)
    # mid: small margin (rebuild every ~5 steps)
    build_at("mid_margin05", cell=dist + 0.05, cutoff=dist + 0.05, row_cap=24)

    # --- dense pair force buckets -----------------------------------------
    params = dict(a_energy=2.5, a_diameter=0.30 * 0.5,
                  b_energy=2.5, b_diameter=0.24 * 0.5)

    def coeff(r2, ai, bi, aj, bj):
        return pot.ab_pair_force_coeff(
            r2, 0.5 * (ai + aj), 0.5 * (bi + bj), params
        )

    for name, cell in (("dense_cell0165", 0.165), ("dense_cell030", 0.30),
                       ("dense_cell0225", 0.225)):
        cap = probe_cap(cell, mult=1.5, floor=16)
        cap = bench._round_up(cap, 32)
        grid = DenseGrid.cubic(bound=bound, cell_size=cell, capacity=cap)

        @jax.jit
        def pair(x, grid=grid):
            slabs = build_slabs(grid, x, extras=(af, bf))
            fs, _ = pair_forces_slab(grid, slabs, coeff, None)
            return scatter_from_slab(fs, slabs.ids, n)

        sec = t(pair, x)
        lanes = int(np.prod(grid.dims)) * 27 * grid.capacity**2
        note(res, f"{name}_cap", cap)
        note(res, f"{name}_s", sec)
        note(res, f"{name}_glanes_per_s", lanes / sec / 1e9)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
