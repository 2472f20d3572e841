"""Microbench: sorted-block range engine vs dense cell slabs, on-device.

Times the full pair-force call (sort/build + pair math + scatter-back) for
both formulations at matched geometry and checks force agreement on the same
structure.  Run with the TPU free:

    python bench_block_vs_slab.py [n_beads] [core_scale]
"""

import json
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    core_scale = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    sys.path.insert(0, ".")
    import bench
    import jax
    import jax.numpy as jnp

    from genome_cycle_tpu.ops import potentials as pot
    from genome_cycle_tpu.ops.block_pairs import BlockGrid, block_pair_forces
    from genome_cycle_tpu.ops.dense_grid import (
        DenseGrid, build_slabs, pair_forces_slab, scatter_from_slab,
    )

    radius = bench._ball_radius(n)
    x_host = bench._chain_walk(n, bench.CHAINS, radius)
    n = len(x_host)
    x = jnp.asarray(x_host)
    af = jnp.zeros((n,), jnp.float32).at[::2].set(1.0)
    bf = 1.0 - af

    params = dict(
        a_energy=2.5, a_diameter=0.30 * core_scale,
        b_energy=2.5, b_diameter=0.24 * core_scale,
    )
    cell = 0.30  # max interaction diameter at core_scale 1 (whole-run grid)
    bound = radius + 0.5

    def time_call(fn, *args, reps=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    res = {"backend": jax.default_backend(), "n": n, "core_scale": core_scale}

    # --- block engine ---
    fill = bench._grid_max_fill(x_host, bound, cell)
    width = (
        int(sys.argv[3]) if len(sys.argv) > 3
        else bench._round_up(128 + 4 * fill, 128)
    )

    def coeff_b(r2, e_i, e_j):
        a = 0.5 * (e_i[0] + e_j[0])
        b = 0.5 * (e_i[1] + e_j[1])
        return pot.ab_pair_force_coeff(r2, a, b, params)

    bgrid = BlockGrid.cubic(bound=bound, cell_size=cell, width=width)

    @jax.jit
    def block(x):
        f, _, ov, mw = block_pair_forces(bgrid, x, (af, bf), coeff_b)
        return f, ov, mw

    f_block, ov, mw = block(x)
    jax.block_until_ready(f_block)
    res["block_overflow"] = int(ov)
    res["block_max_width"] = int(mw)
    res["block_width_cap"] = width
    res["block_s"] = time_call(lambda x: block(x)[0], x)
    res["block_lanes"] = -(-n // 128) * 128 * 9 * width
    print(json.dumps(res), file=sys.stderr, flush=True)

    # --- slab engine ---
    cap = bench._round_up(max(int(fill * 1.5), 32), 32)
    dgrid = DenseGrid.cubic(bound=bound, cell_size=cell, capacity=cap)

    def coeff_s(r2, ai, bi, aj, bj):
        return pot.ab_pair_force_coeff(
            r2, 0.5 * (ai + aj), 0.5 * (bi + bj), params
        )

    @jax.jit
    def slab(x):
        slabs = build_slabs(dgrid, x, extras=(af, bf))
        fs, _ = pair_forces_slab(dgrid, slabs, coeff_s, None)
        return scatter_from_slab(fs, slabs.ids, n), slabs.overflow

    f_slab, ov_s = slab(x)
    jax.block_until_ready(f_slab)
    res["slab_overflow"] = int(ov_s)
    res["slab_capacity"] = cap
    res["slab_s"] = time_call(lambda x: slab(x)[0], x)
    res["slab_lanes"] = dgrid.num_cells * 27 * cap * cap

    # Agreement on-device.
    diff = float(jnp.max(jnp.abs(f_block - f_slab)))
    scale = float(jnp.max(jnp.abs(f_slab))) or 1.0
    res["max_force_diff_rel"] = diff / scale
    res["speedup_block_over_slab"] = res["slab_s"] / res["block_s"]
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
