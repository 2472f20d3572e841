"""Statistical tests of the Brownian-dynamics integrator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genome_cycle_tpu.ops.integrator import BDParams, bd_update, run_chunk
from genome_cycle_tpu.ops import potentials as pot


def test_free_diffusion_msd():
    # MSD of a free Brownian particle: <|x(t)-x(0)|^2> = 6 mu kT t.
    n = 4096
    mu, kt, dt, steps = 0.5, 1.3, 1e-3, 200
    params = BDParams(temperature=kt, timestep=dt)
    mobility = jnp.full((n,), mu, jnp.float32)
    positions = jnp.zeros((n, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    def step_fn(carry, step):
        x, key = carry
        key, sub = jax.random.split(key)
        forces = jnp.zeros_like(x)
        return bd_update(x, forces, mobility, sub, params), key

    (x, _) = jax.jit(lambda c: run_chunk(step_fn, c, 0, steps))((positions, key))
    msd = float(jnp.mean(jnp.sum(x * x, axis=-1)))
    expected = 6 * mu * kt * dt * steps
    assert msd == pytest.approx(expected, rel=0.05)


def test_harmonic_equilibrium_variance():
    # Overdamped particle in a harmonic well u = K/2 x^2 equilibrates to
    # variance kT/K per axis (checks the fluctuation-dissipation balance).
    n = 2048
    k_spring, mu, kt, dt = 50.0, 1.0, 1.0, 2e-4
    params = BDParams(temperature=kt, timestep=dt)
    mobility = jnp.full((n,), mu, jnp.float32)
    positions = jnp.zeros((n, 3), jnp.float32)
    key = jax.random.PRNGKey(1)

    def step_fn(carry, step):
        x, key = carry
        key, sub = jax.random.split(key)
        forces = -k_spring * x
        return bd_update(x, forces, mobility, sub, params), key

    run = jax.jit(lambda c: run_chunk(step_fn, c, 0, 3000))
    (x, key) = run((positions, key))
    var = float(jnp.mean(x * x))
    # Euler-Maruyama bias for OU: var = kT/K / (1 - K mu dt / 2).
    expected = kt / k_spring / (1 - k_spring * mu * dt / 2)
    assert var == pytest.approx(expected, rel=0.05)


def test_spacestep_limits_displacement():
    # With a huge force, spacestep caps the deterministic displacement.
    params = BDParams(temperature=0.0, timestep=1.0, spacestep=0.001)
    x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]], jnp.float32)
    forces = jnp.asarray([[1e6, 0, 0], [0.0, 0, 0]], jnp.float32)
    mobility = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(0)
    x2 = bd_update(x, forces, mobility, key, params)
    disp = np.linalg.norm(np.asarray(x2 - x), axis=1)
    assert disp[0] == pytest.approx(0.001, rel=1e-4)
    # Everyone shares the shrunken timestep (global adaptive dt).
    assert disp[1] == 0.0


def test_bonded_chain_bond_variance():
    # Two-bead semispring bond with b=0: u = K/2 |x1-x2|^2, so in equilibrium
    # each relative coordinate has Boltzmann variance kT/K (independent of
    # mobility) — the bond-fluctuation check SURVEY.md §4 calls for.
    from genome_cycle_tpu.ops.bonded import pair_bond_forces

    k_spring, kt, dt = 100.0, 1.0, 1e-4
    n_pairs = 1024
    params = BDParams(temperature=kt, timestep=dt)
    pairs = jnp.asarray(
        np.stack([np.arange(n_pairs) * 2, np.arange(n_pairs) * 2 + 1], axis=1),
        jnp.int32,
    )
    positions = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.05, (2 * n_pairs, 3)), jnp.float32
    )
    mobility = jnp.ones((2 * n_pairs,), jnp.float32)

    def step_fn(carry, step):
        x, key = carry
        key, sub = jax.random.split(key)
        forces, _ = pair_bond_forces(
            x,
            pairs,
            lambda r2: pot.semispring_energy(r2, k_spring, 0.0),
            lambda r2: pot.semispring_force_coeff(r2, k_spring, 0.0),
        )
        return bd_update(x, forces, mobility, sub, params), key

    key = jax.random.PRNGKey(7)
    (x, _) = jax.jit(lambda c: run_chunk(step_fn, c, 0, 4000))((positions, key))
    rel = np.asarray(x[pairs[:, 0]] - x[pairs[:, 1]])
    var = rel.var(axis=0).mean()
    expected = kt / k_spring
    assert var == pytest.approx(expected, rel=0.1)
