"""Fused Pallas pair-force kernel vs brute force (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genome_cycle_tpu.ops import potentials as pot
from genome_cycle_tpu.ops.dense_grid import (
    DenseGrid,
    build_slabs,
    scatter_from_slab,
)
from genome_cycle_tpu.ops.neighbor import pairwise_forces_dense
from genome_cycle_tpu.ops.pallas_kernels import (
    ab_pair_forces_pallas,
    build_padded_slab,
    forces_to_beads,
)


@pytest.mark.parametrize("core_scale", [0.5, 1.0])
def test_pallas_matches_brute_force(rng, core_scale):
    n = 300
    positions = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)), jnp.float32)
    af = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
    bf = 1.0 - af
    grid = DenseGrid.cubic(bound=1.2, cell_size=0.3, capacity=16)
    slab, ids, overflow, max_fill = build_padded_slab(grid, positions, af, bf)
    assert int(overflow) == 0

    a_d, b_d = 0.3 * core_scale, 0.24 * core_scale
    params = jnp.asarray(
        [2.5, 1 / (a_d * a_d), 2.5, 1 / (b_d * b_d)], jnp.float32
    )
    # jb=8 exercises the sublane-blocked j loop (capacity 16 -> 2 blocks).
    planes = ab_pair_forces_pallas(
        slab, params, grid.dims, grid.capacity, jb=8, interpret=True
    )
    f_pallas = forces_to_beads(planes, ids, n)

    pp = dict(a_energy=2.5, a_diameter=a_d, b_energy=2.5, b_diameter=b_d)

    def coeff(r2, i, j):
        return pot.ab_pair_force_coeff(
            r2, 0.5 * (af[i] + af[j]), 0.5 * (bf[i] + bf[j]), pp
        )

    f_ref, _ = pairwise_forces_dense(positions, coeff)
    ref = np.asarray(f_ref)
    err = np.abs(np.asarray(f_pallas) - ref).max()
    assert err <= 1e-4 * max(np.abs(ref).max(), 1.0)


def test_pallas_boundary_cells(rng):
    # Beads at grid edges: flat-shift wraparound must not create phantom
    # forces (wrapped cells are spatially distant; cutoff kills them).
    positions = jnp.asarray(
        [[-1.15, -1.15, -1.15], [1.15, 1.15, 1.15], [1.15, -1.15, 1.15],
         [-1.1, -1.1, -1.1]],
        jnp.float32,
    )
    af = jnp.ones(4, jnp.float32)
    bf = jnp.zeros(4, jnp.float32)
    grid = DenseGrid.cubic(bound=1.2, cell_size=0.3, capacity=8)
    slab, ids, overflow, _ = build_padded_slab(grid, positions, af, bf)
    params = jnp.asarray([2.5, 1 / 0.09, 2.5, 1 / 0.0576], jnp.float32)
    planes = ab_pair_forces_pallas(
        slab, params, grid.dims, grid.capacity, interpret=True
    )
    f = np.asarray(forces_to_beads(planes, ids, 4))

    pp = dict(a_energy=2.5, a_diameter=0.3, b_energy=2.5, b_diameter=0.24)

    def coeff(r2, i, j):
        return pot.ab_pair_force_coeff(r2, 1.0, 0.0, pp)

    f_ref, _ = pairwise_forces_dense(positions, coeff)
    np.testing.assert_allclose(f, np.asarray(f_ref), atol=1e-5)
    # Beads 0 and 3 are within range of each other; 1 and 2 interact with
    # nothing (opposite corners).
    assert np.abs(f[0]).max() > 0
    np.testing.assert_allclose(f[1], 0.0, atol=1e-6)


def test_vmem_plan_budget():
    from genome_cycle_tpu.ops.pallas_kernels import (
        VMEM_LIMIT_BYTES,
        _round_up,
        plane_geometry,
        vmem_plan,
    )

    # Production-scale grid (the m=192 shape that crashed the round-2 bench
    # worker must now resolve to a provably fitting block size or None).
    dims = (37, 37, 37)
    for m in (32, 96, 192, 384):
        plan = vmem_plan(dims, m)
        if plan is None:
            continue
        chunk, jb = plan
        assert m % jb == 0 and chunk % 128 == 0
        _, ps, _ = plane_geometry(dims)
        pw = _round_up(dims[1] * dims[2], chunk)
        fixed = 4 * (3 * 6 * m * ps + 6 * m * ps + 3 * m * pw + 3 * m * ps)
        assert fixed + 4 * 10 * m * jb * chunk <= VMEM_LIMIT_BYTES

    # A grid too big for any block size must refuse, not crash.
    assert vmem_plan((40, 90, 90), 1024) is None
