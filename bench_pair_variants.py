"""Microbench: the three pair-force formulations at production density.

Times ONLY the A/B copolymer pair force (the dominant cost of the interphase
step) for each engine formulation on the current default backend:

- ``dense``:    gather-free dense cell slabs (ops/dense_grid.py) — the hot path
- ``gather``:   cell-table gather fold (ops/neighbor.py) — readable reference

(The Verlet-rows variant ops/pairlist.py was deleted in round 4: the
sorted-block engine — bench_block_vs_slab.py — fills its design niche with
measured wins, so the dead module went per VERDICT item 10.)  Run with the
TPU free:

    python bench_pair_variants.py [n_beads]
"""

import json
import math
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000

    sys.path.insert(0, ".")
    import bench
    import jax
    import jax.numpy as jnp

    from genome_cycle_tpu.ops import potentials as pot
    from genome_cycle_tpu.ops.dense_grid import (
        DenseGrid,
        build_slabs,
        pair_forces_slab,
        scatter_from_slab,
    )
    from genome_cycle_tpu.ops.neighbor import (
        CellGrid,
        build_cell_table,
        pairwise_forces_cell,
    )

    radius = bench._ball_radius(n)
    x = jnp.asarray(bench._chain_walk(n, bench.CHAINS, radius))
    af = jnp.zeros((n,), jnp.float32).at[::2].set(1.0)
    bf = jnp.zeros((n,), jnp.float32).at[1::2].set(1.0)

    core_scale = 0.5  # early-G1 bucket, as in bench.py
    params = dict(
        a_energy=2.5,
        a_diameter=0.30 * core_scale,
        b_energy=2.5,
        b_diameter=0.24 * core_scale,
    )
    cutoff = 0.30 * core_scale

    def coeff(r2, ai, bi, aj, bj):
        return pot.ab_pair_force_coeff(r2, 0.5 * (ai + aj), 0.5 * (bi + bj), params)

    def time_call(fn, *args, reps=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    results = {}

    # dense slabs
    bound = radius + 0.5
    cell = cutoff
    fill = bench._grid_max_fill(np.asarray(x), bound, cell)
    cap = bench._round_up(max(int(fill * 1.5), 32), 32)
    dgrid = DenseGrid.cubic(bound=bound, cell_size=cell, capacity=cap)

    @jax.jit
    def dense(x):
        slabs = build_slabs(dgrid, x, extras=(af, bf))
        fs, _ = pair_forces_slab(dgrid, slabs, coeff, None)
        return scatter_from_slab(fs, slabs.ids, n)

    results["dense"] = time_call(dense, x)

    # gather fold
    ggrid = CellGrid.cubic(bound=bound, cell_size=cell, capacity=cap)

    def coeff_ids(r2, i_ids, j_ids):
        a = 0.5 * (af[i_ids] + af[j_ids])
        b = 0.5 * (bf[i_ids] + bf[j_ids])
        return pot.ab_pair_force_coeff(r2, a, b, params)

    @jax.jit
    def gather(x):
        table, _, _ = build_cell_table(ggrid, x)
        f, _ = pairwise_forces_cell(ggrid, table, x, coeff_ids, None)
        return f

    results["gather"] = time_call(gather, x)


    out = {
        "backend": jax.default_backend(),
        "n": n,
        "per_step_s": {k: v for k, v in results.items() if isinstance(v, float)},
        "bead_steps_per_s": {
            k: n / results[k] for k in ("dense", "gather")
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
