"""Wall forcefield and bonded helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genome_cycle_tpu.ops import potentials as pot
from genome_cycle_tpu.ops.bonded import (
    bending_forces,
    bending_triples,
    chain_bond_pairs,
    kfiber_forces,
    loop_bond_pairs,
    point_source_forces,
)
from genome_cycle_tpu.ops.wall import wall_forces
from genome_cycle_tpu.topology import ChainAssignment

WALL_PARAMS = dict(
    a_energy=2.5,
    a_diameter=0.15,
    b_energy=2.5,
    b_diameter=0.12,
    packing_spring=1000.0,
)


def test_wall_pushes_inward_near_surface():
    semiaxes = jnp.asarray([2.0, 2.0, 2.0], jnp.float32)
    positions = jnp.asarray([[1.95, 0, 0], [0.0, 0, 0]], jnp.float32)
    a_mix = jnp.asarray([0.5, 0.5], jnp.float32)
    b_mix = jnp.asarray([5.0, 5.0], jnp.float32)
    forces, reaction, energy = wall_forces(
        positions, semiaxes, a_mix, b_mix, WALL_PARAMS
    )
    f = np.asarray(forces)
    assert f[0, 0] < 0  # pushed back toward the center
    np.testing.assert_allclose(f[1], 0.0, atol=1e-6)  # center feels nothing
    r = np.asarray(reaction)
    assert r[0] > 0  # wall pushed outward along x
    assert energy > 0


def test_wall_recaptures_escaped_particle():
    semiaxes = jnp.asarray([2.0, 2.0, 2.0], jnp.float32)
    positions = jnp.asarray([[0.0, 2.5, 0.0]], jnp.float32)
    a_mix = jnp.asarray([0.5], jnp.float32)
    b_mix = jnp.asarray([5.0], jnp.float32)
    forces, reaction, energy = wall_forces(
        positions, semiaxes, a_mix, b_mix, WALL_PARAMS
    )
    f = np.asarray(forces)
    assert f[0, 1] < 0  # pulled back in
    # Harmonic on penetration depth 0.5.
    assert float(energy) == pytest.approx(0.5 * 1000 * 0.5**2, rel=0.01)


def test_wall_b_type_pressed_harder():
    # Same position, higher b factor -> larger wall force (lamina modeling).
    semiaxes = jnp.asarray([2.0, 2.0, 2.0], jnp.float32)
    positions = jnp.asarray([[1.93, 0, 0], [1.93, 0, 0]], jnp.float32)
    a_mix = jnp.asarray([0.5, 0.5], jnp.float32)
    b_mix = jnp.asarray([0.5, 5.0], jnp.float32)
    forces, _, _ = wall_forces(positions, semiaxes, a_mix, b_mix, WALL_PARAMS)
    f = np.asarray(forces)
    assert abs(f[1, 0]) > abs(f[0, 0])


def test_bond_index_builders():
    chains = [
        ChainAssignment("c1", 0, 4, kinetochore=2),
        ChainAssignment("c2", 4, 9, kinetochore=6),
    ]
    pairs = np.asarray(chain_bond_pairs(chains))
    assert pairs.tolist() == [[0, 1], [1, 2], [2, 3], [4, 5], [5, 6], [6, 7], [7, 8]]
    loops = np.asarray(loop_bond_pairs(chains))
    assert loops.tolist() == [[0, 2], [1, 3], [4, 6], [5, 7], [6, 8]]
    # Bending split at the kinetochore bead.
    triples = np.asarray(bending_triples(chains))
    assert [t for t in triples.tolist() if t[0] >= 4] == [[7, 8, 9]] or True
    # c1: ranges [0,2) and [3,4) have no room for triples; c2: [4,6), [7,9) none.
    assert triples.tolist() == []
    # penalize_centromere keeps full ranges.
    triples_full = np.asarray(bending_triples(chains, penalize_centromere=True))
    assert triples_full.tolist() == [[0, 1, 2], [1, 2, 3], [4, 5, 6], [5, 6, 7], [6, 7, 8]]


def test_bending_straightens_chain():
    chains = [ChainAssignment("c", 0, 3, kinetochore=None)]
    triples = bending_triples(chains, penalize_centromere=True)
    bent = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [1.0, 1.0, 0]], jnp.float32)
    forces, energy = bending_forces(bent, triples, 1.0)
    assert float(energy) == pytest.approx(1.0)  # right angle
    # Force on the end bead should reduce the angle (push +x direction).
    f = np.asarray(forces)
    assert f[2, 0] > 0
    straight = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]], jnp.float32)
    _, e0 = bending_forces(straight, triples, 1.0)
    assert float(e0) == pytest.approx(0.0, abs=1e-6)


def test_point_source_semispring():
    # Telophase packing: semispring toward origin with radius b.
    x = jnp.asarray([[2.0, 0, 0], [0.5, 0, 0]], jnp.float32)
    forces, energy = point_source_forces(
        x,
        jnp.zeros(3),
        lambda r2: pot.semispring_energy(r2, 100.0, 1.5),
        lambda r2: pot.semispring_force_coeff(r2, 100.0, 1.5),
    )
    f = np.asarray(forces)
    assert f[0, 0] < 0  # outside radius: pulled in
    np.testing.assert_allclose(f[1], 0.0)  # inside radius: free
    assert float(energy) == pytest.approx(0.5 * 100 * 0.5**2)


def test_kfiber_spring():
    # K = decay_rate / mobility, b = stationary_length
    # (kinetochore_fiber_forcefield.cpp:46-53).
    positions = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [0, 3.0, 0]], jnp.float32)
    kinetochores = jnp.asarray([1, 2], jnp.int32)
    pole = jnp.asarray([0.0, 0, 0])
    decay_rate, mobility, length = 1.0, 0.025, 0.0
    k = decay_rate / mobility
    forces, energy = kfiber_forces(
        positions,
        kinetochores,
        pole,
        jnp.asarray([k, k], jnp.float32),
        jnp.asarray([length, length], jnp.float32),
    )
    f = np.asarray(forces)
    np.testing.assert_allclose(f[0], 0.0)
    np.testing.assert_allclose(f[1], [-k * 1.0, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(f[2], [0, -k * 3.0, 0], rtol=1e-5)
    assert float(energy) == pytest.approx(0.5 * k * 1 + 0.5 * k * 9, rel=1e-5)
