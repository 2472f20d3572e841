"""Microbench: column-aligned block engine pair force on the real chip.

Sweeps block size B at the bench workload geometry and reports per-call
wall time, probed window watermark, slot need, and the implied candidate
lanes per bead-step — the quantity round 5 is driving down (round 4 banked
~19.7k lanes/bead at 25k beads; the physical 27-cell neighbourhood is
~1.6k).
"""

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


def run(n_beads, block):
    radius = bench._ball_radius(n_beads)
    x_host = bench._chain_walk(n_beads, bench.CHAINS, radius)
    bound = radius + 0.5
    x = jnp.asarray(x_host)
    af = jnp.asarray(np.random.default_rng(0).uniform(0, 1, len(x_host)),
                     jnp.float32)
    bf = 1.0 - af

    probe = BlockGrid.cubic(bound=bound, cell_size=0.3, width=128,
                            block=block)
    def _probe(q):
        s = build_structure(probe, q)
        return s.max_width, s.slot_need

    mw, need = (int(v) for v in jax.jit(_probe)(x))
    width = max(-(-int(mw * 1.25) // 128) * 128, 256)
    slots = -(-int(need * 1.15) // 128) * 128
    grid = BlockGrid.cubic(bound=bound, cell_size=0.3, width=width,
                           block=block, slots=slots)
    b, n_blocks, n_slots, _, wq = _shape(grid, n_beads)

    def timeit(fn, *args, reps=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    dt = timeit(
        jax.jit(lambda q: block_pair_forces(grid, q, (af, bf), coeff)[0]), x
    )
    dt_build = timeit(
        jax.jit(lambda q: build_structure(grid, q, (af, bf)).j_lo), x
    )
    struct = jax.jit(lambda q: build_structure(grid, q, (af, bf)))(x)
    dt_math = timeit(
        jax.jit(
            lambda q, s: block_pair_forces(grid, q, (af, bf), coeff,
                                           struct=s)[0]
        ),
        x, struct,
    )
    lanes = n_blocks * b * 9 * wq
    print(
        f"n={n_beads} B={block}: {dt*1e3:7.2f} ms (build {dt_build*1e3:.2f}, "
        f"math {dt_math*1e3:.2f})  mw={mw} width={width} "
        f"wq={wq} slots={n_slots} (need {need})  "
        f"lanes/bead={lanes/n_beads:,.0f}  {lanes/dt/1e9:.1f} Glanes/s",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    import os

    blocks = tuple(
        int(v) for v in os.environ.get("BLOCKS", "32,64,128").split(",")
    )
    ns = tuple(
        int(v) for v in os.environ.get("NS", "24978,99958").split(",")
    )
    for n in ns:
        for blk in blocks:
            run(n, blk)
