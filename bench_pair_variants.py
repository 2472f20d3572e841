"""Microbench: the three pair-force formulations at production density.

Times ONLY the A/B copolymer pair force (the dominant cost of the interphase
step) for each engine formulation on the current default backend:

- ``dense``:    gather-free dense cell slabs (ops/dense_grid.py) — the hot path
- ``gather``:   cell-table gather fold (ops/neighbor.py) — readable reference
- ``pairlist``: Verlet neighbor rows (ops/pairlist.py) — amortized build +
                per-step re-measure over (N, K) id tables

Decides the fate of ops/pairlist.py (VERDICT round 2, item 7): the verdict
is written into BASELINE.md.  Run with the TPU free:

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
    from genome_cycle_tpu.ops.pairlist import (
        build_neighbor_rows,
        pair_forces_rows_list,
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

    # pairlist: margin sized for a ~20-step lifetime (measured drift ~0.1 over
    # 25 steps at this density — bench.py provenance), amortize build over 20.
    margin = 0.12
    lradius = cutoff + margin
    lgrid = CellGrid.cubic(bound=bound, cell_size=lradius, capacity=4 * cap)
    density = n / (4.0 / 3.0 * math.pi * radius**3)
    k_est = density * 4.0 / 3.0 * math.pi * lradius**3
    k_cap = bench._round_up(max(int(k_est * 3.0), 16), 8)

    @jax.jit
    def build_rows(x):
        table, _, _ = build_cell_table(lgrid, x)
        return build_neighbor_rows(lgrid, table, x, lradius, k_cap)

    @jax.jit
    def list_force(x, rows):
        f, _ = pair_forces_rows_list(x, rows, coeff_ids, None)
        return f

    rows = build_rows(x)
    jax.block_until_ready(rows.ids)
    if int(rows.overflow) > 0:
        print(f"pairlist overflow {int(rows.overflow)} at K={k_cap}",
              file=sys.stderr)
    t_build = time_call(build_rows, x)
    t_force = time_call(list_force, x, rows)
    results["pairlist"] = t_force + t_build / 20.0
    results["pairlist_build"] = t_build
    results["pairlist_force"] = t_force
    results["pairlist_K"] = k_cap

    out = {
        "backend": jax.default_backend(),
        "n": n,
        "per_step_s": {k: v for k, v in results.items() if isinstance(v, float)},
        "bead_steps_per_s": {
            k: n / results[k] for k in ("dense", "gather", "pairlist")
        },
        "pairlist_K": k_cap,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
