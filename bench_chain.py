"""Chained-dependency timing of the pair call: each iteration's output
perturbs the next input, so async dispatch / lazy sync cannot distort the
measurement (microbenches with independent repeated calls measured 0.02 ms
argsorts through the axon tunnel — nonsense)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench
from genome_cycle_tpu.ops import potentials as pot
from genome_cycle_tpu.ops.block_pairs import (
    BlockGrid, _shape, block_pair_forces, build_structure,
)

PARAMS = dict(a_energy=2.5, a_diameter=0.3, b_energy=2.0, b_diameter=0.24)


def coeff(r2, e_i, e_j):
    return pot.ab_pair_force_coeff(
        r2, 0.5 * (e_i[0] + e_j[0]), 0.5 * (e_i[1] + e_j[1]), PARAMS
    )


def chain(fn, x0, reps=20):
    x = fn(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(reps):
        x = fn(x)
    jax.block_until_ready(x)
    np.asarray(x[:1])
    return (time.perf_counter() - t0) / reps


def run(N, block, width_hint=640):
    radius = bench._ball_radius(N)
    x = jnp.asarray(bench._chain_walk(N, bench.CHAINS, radius))
    af = jnp.asarray(np.random.default_rng(0).uniform(0, 1, N), jnp.float32)
    bf = 1.0 - af
    grid = BlockGrid.cubic(
        bound=radius + 0.5, cell_size=0.3, width=width_hint, block=block,
        slots=-(-int(N * 1.25) // 128) * 128,
    )

    @jax.jit
    def pair_step(q):
        f, _, _, _ = block_pair_forces(grid, q, (af, bf), coeff)
        return q + 1e-9 * f

    @jax.jit
    def build_step(q):
        s = build_structure(grid, q, (af, bf))
        # Touch every field so nothing dead-codes; fold into q.
        acc = (
            s.order.sum() + s.islot.sum() + s.j_lo.sum() + s.j_hi.sum()
            + s.overflow + s.max_width + s.slot_need
        ).astype(q.dtype) + sum(p.sum() for p in s.planes_r)
        return q + 1e-30 * acc

    @jax.jit
    def sort_step(q):
        lower = jnp.asarray(grid.lower, q.dtype)
        dims = jnp.asarray(grid.dims, jnp.int32)
        coords = jnp.clip(
            jnp.floor((q - lower) / grid.cell_size).astype(jnp.int32),
            0, dims - 1,
        )
        cid = (coords[:, 0] * grid.dims[1] + coords[:, 1]) * grid.dims[2] \
            + coords[:, 2]
        order = jnp.argsort(cid)
        return q + 1e-30 * order[:, None].astype(q.dtype)

    t_pair = chain(pair_step, x)
    t_build = chain(build_step, x)
    t_sort = chain(sort_step, x)
    print(
        f"N={N} B={block}: pair {t_pair*1e3:.2f} ms | build "
        f"{t_build*1e3:.2f} ms | argsort {t_sort*1e3:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    import os

    for n in (int(v) for v in os.environ.get("NS", "99958").split(",")):
        run(n, int(os.environ.get("B", "32")))
