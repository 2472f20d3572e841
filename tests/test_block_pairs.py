"""Sorted-block range pair engine vs O(N^2) brute force.

Covers the properties the formulation's correctness hangs on:
- force/energy equality with the dense reference at random configurations;
- column-interval clipping on degenerate grids (blocks spanning nearly a
  whole z-column of cells would double-count without the clip);
- out-of-grid clamping (true coordinates still interact);
- width overflow counted, never silently dropped;
- per-pair extra channels (a/b factors) broadcast matching the slab engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from genome_cycle_tpu.ops import potentials as pot
from genome_cycle_tpu.ops.block_pairs import BlockGrid, block_pair_forces
from genome_cycle_tpu.ops.neighbor import pairwise_forces_dense


def ab_fns(params):
    def coeff(r2, e_i, e_j):
        a = 0.5 * (e_i[0] + e_j[0])
        b = 0.5 * (e_i[1] + e_j[1])
        return pot.ab_pair_force_coeff(r2, a, b, params)

    def energy(r2, e_i, e_j):
        a = 0.5 * (e_i[0] + e_j[0])
        b = 0.5 * (e_i[1] + e_j[1])
        return pot.ab_pair_energy(r2, a, b, params)

    return coeff, energy


def dense_fns(params, af, bf):
    def coeff(r2, i, j):
        a = 0.5 * (af[i] + af[j])
        b = 0.5 * (bf[i] + bf[j])
        return pot.ab_pair_force_coeff(r2, a, b, params)

    def energy(r2, i, j):
        a = 0.5 * (af[i] + af[j])
        b = 0.5 * (bf[i] + bf[j])
        return pot.ab_pair_energy(r2, a, b, params)

    return coeff, energy


PARAMS = dict(a_energy=2.5, a_diameter=0.3, b_energy=2.0, b_diameter=0.24)


@pytest.mark.parametrize("n,block,width", [(500, 64, 256), (1000, 128, 384)])
def test_block_vs_dense(rng, n, block, width):
    x = jnp.asarray(rng.uniform(-1.0, 1.0, size=(n, 3)), jnp.float32)
    af = jnp.asarray(rng.uniform(0, 1, size=n), jnp.float32)
    bf = 1.0 - af
    grid = BlockGrid.cubic(bound=1.5, cell_size=0.3, width=width, block=block)
    coeff, u = ab_fns(PARAMS)
    f, e, overflow, max_w = block_pair_forces(grid, x, (af, bf), coeff, u)
    assert int(overflow) == 0
    assert 0 < int(max_w) <= width
    dc, du = dense_fns(PARAMS, af, bf)
    f_ref, e_ref = pairwise_forces_dense(x, dc, du)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=2e-4)
    assert float(e) == pytest.approx(float(e_ref), rel=1e-5)


def test_degenerate_grid_no_double_count(rng):
    # A tiny grid (3x3x3 cells) with blocks spanning most of the id space:
    # without interval clipping the 9 column windows overlap heavily and
    # every pair would be counted several times.
    n = 300
    x = jnp.asarray(rng.uniform(-0.44, 0.44, size=(n, 3)), jnp.float32)
    af = jnp.ones((n,), jnp.float32)
    bf = jnp.zeros((n,), jnp.float32)
    grid = BlockGrid.cubic(bound=0.45, cell_size=0.3, width=512, block=64)
    assert grid.dims == (3, 3, 3)
    coeff, u = ab_fns(PARAMS)
    f, e, overflow, _ = block_pair_forces(grid, x, (af, bf), coeff, u)
    assert int(overflow) == 0
    dc, du = dense_fns(PARAMS, af, jnp.zeros((n,), jnp.float32))
    f_ref, e_ref = pairwise_forces_dense(x, dc, du)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=2e-4)
    assert float(e) == pytest.approx(float(e_ref), rel=1e-5)


def test_out_of_grid_beads_still_interact():
    x = jnp.asarray(
        [[1.95, 0.0, 0.0], [2.15, 0.0, 0.0], [-2.4, 0.0, 0.0],
         [-2.5, 0.1, 0.0]],
        jnp.float32,
    )
    af = jnp.ones((4,), jnp.float32)
    bf = jnp.zeros((4,), jnp.float32)
    params = dict(a_energy=2.0, a_diameter=0.4, b_energy=1.0, b_diameter=0.3)
    grid = BlockGrid.cubic(bound=2.0, cell_size=0.4, width=64, block=4)
    coeff, u = ab_fns(params)
    f, e, overflow, _ = block_pair_forces(grid, x, (af, bf), coeff, u)
    assert int(overflow) == 0
    dc, du = dense_fns(params, af, bf)
    f_ref, e_ref = pairwise_forces_dense(x, dc, du)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=1e-5)
    assert float(e) == pytest.approx(float(e_ref), rel=1e-5)


def test_width_overflow_detected(rng):
    # All beads in one cell: candidate slice needs ~n lanes, width 32 cannot
    # hold them -> overflow must be reported.
    n = 128
    x = jnp.asarray(rng.uniform(-0.1, 0.1, size=(n, 3)), jnp.float32)
    af = jnp.ones((n,), jnp.float32)
    bf = jnp.zeros((n,), jnp.float32)
    grid = BlockGrid.cubic(bound=1.0, cell_size=0.3, width=32, block=32)
    coeff, _ = ab_fns(PARAMS)
    _, _, overflow, max_w = block_pair_forces(grid, x, (af, bf), coeff)
    assert int(overflow) > 0
    assert int(max_w) > 32


def test_uneven_block_padding(rng):
    # n not a multiple of the block size: pad rows must not contribute.
    n = 181
    x = jnp.asarray(rng.uniform(-0.9, 0.9, size=(n, 3)), jnp.float32)
    af = jnp.asarray(rng.uniform(0, 1, size=n), jnp.float32)
    bf = 1.0 - af
    grid = BlockGrid.cubic(bound=1.0, cell_size=0.3, width=256, block=64)
    coeff, u = ab_fns(PARAMS)
    f, e, overflow, _ = block_pair_forces(grid, x, (af, bf), coeff, u)
    assert int(overflow) == 0
    dc, du = dense_fns(PARAMS, af, bf)
    f_ref, e_ref = pairwise_forces_dense(x, dc, du)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=2e-4)
    assert float(e) == pytest.approx(float(e_ref), rel=1e-5)
