"""Verlet pair-list engine: equivalence with brute force, drift guard."""

import jax
import jax.numpy as jnp
import numpy as np

from genome_cycle_tpu.ops.neighbor import CellGrid, pairwise_forces_dense
from genome_cycle_tpu.ops.pairlist import (
    NeighborRows,
    build_neighbor_rows,
    drift_exceeded,
    pair_forces_rows_list,
    refresh_neighbor_rows,
)
from genome_cycle_tpu.ops import potentials as pot


def _coeff(r2, i, j):
    return pot.softcore_force_coeff(r2, 2.5, 0.3, 2, 3)


def _energy(r2, i, j):
    return pot.softcore_energy(r2, 2.5, 0.3, 2, 3)


def test_pairlist_matches_brute_force(rng):
    n = 400
    positions = jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3)), jnp.float32)
    grid = CellGrid.cubic(bound=1.5, cell_size=0.4, capacity=64)
    rows = refresh_neighbor_rows(grid, positions, radius=0.4, capacity=64)
    assert int(rows.overflow) == 0

    f_list, e_list = pair_forces_rows_list(positions, rows, _coeff, _energy)
    f_ref, e_ref = pairwise_forces_dense(positions, _coeff, _energy)
    np.testing.assert_allclose(np.asarray(f_list), np.asarray(f_ref), atol=1e-4)
    np.testing.assert_allclose(float(e_list), float(e_ref), rtol=1e-5)


def test_pairlist_stays_valid_within_margin(rng):
    """Forces from a stale list match brute force as long as no bead moved
    more than margin/2 — the drift-guard contract."""
    n = 300
    margin = 0.1
    positions = jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3)), jnp.float32)
    grid = CellGrid.cubic(bound=1.5, cell_size=0.3 + margin, capacity=96)
    rows = refresh_neighbor_rows(
        grid, positions, radius=0.3 + margin, capacity=96
    )
    assert int(rows.overflow) == 0

    # Random drift bounded by margin/2 per bead.
    step = rng.normal(size=(n, 3))
    step *= (0.5 * margin) * rng.uniform(0, 1, (n, 1)) / np.linalg.norm(
        step, axis=1, keepdims=True
    )
    moved = positions + jnp.asarray(step, jnp.float32)
    assert not bool(drift_exceeded(rows, moved, margin))

    f_list, e_list = pair_forces_rows_list(moved, rows, _coeff, _energy)
    f_ref, e_ref = pairwise_forces_dense(moved, _coeff, _energy)
    np.testing.assert_allclose(np.asarray(f_list), np.asarray(f_ref), atol=1e-4)
    np.testing.assert_allclose(float(e_list), float(e_ref), rtol=1e-5)


def test_drift_guard_trips(rng):
    n = 50
    positions = jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3)), jnp.float32)
    grid = CellGrid.cubic(bound=1.5, cell_size=0.4, capacity=64)
    rows = refresh_neighbor_rows(grid, positions, radius=0.4, capacity=64)
    moved = positions.at[7, 0].add(0.06)
    assert bool(drift_exceeded(rows, moved, margin=0.1))
    assert not bool(drift_exceeded(rows, moved, margin=0.13))


def test_pairlist_overflow_counted(rng):
    """A capacity too small for the densest row reports dropped partners."""
    n = 64
    positions = jnp.asarray(rng.uniform(-0.1, 0.1, (n, 3)), jnp.float32)
    grid = CellGrid.cubic(bound=1.0, cell_size=0.5, capacity=64)
    rows = refresh_neighbor_rows(grid, positions, radius=0.5, capacity=8)
    assert int(rows.overflow) > 0


def test_pairlist_jit_and_grad_safe(rng):
    n = 128
    positions = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    grid = CellGrid.cubic(bound=1.0, cell_size=0.35, capacity=64)

    @jax.jit
    def total(p):
        rows = refresh_neighbor_rows(grid, p, radius=0.35, capacity=64)
        f, e = pair_forces_rows_list(p, rows, _coeff, _energy)
        return f, e

    f, e = total(positions)
    assert np.isfinite(np.asarray(f)).all()
    assert np.isfinite(float(e))
