"""Statistical-physics validation of the full interphase force field.

SURVEY.md §4's golden-test strategy: since the C++ reference cannot run here
(micromd absent), validate the model's *physics* — equilibrium fluctuation
laws, polymer contact scaling, wall response — rather than bitwise
trajectories (which differ by RNG anyway).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genome_cycle_tpu.config import parse_config
from genome_cycle_tpu.models.interphase import EngineSettings, InterphaseModel
from genome_cycle_tpu.store import StageDesign
from genome_cycle_tpu.topology import ChainAssignment


def build_model(n=600, temperature=1.0, wall_mobility=0.0):
    config = parse_config(
        json.dumps(
            {
                "interphase": {
                    "temperature": temperature,
                    "wall_mobility": wall_mobility,
                    # Fixed scales: equilibrium statistics are cleaner without
                    # the expansion schedule.
                    "core_scale_init": 1.0,
                    "bond_scale_init": 1.0,
                }
            }
        )
    )
    ab = np.zeros((n, 2))
    ab[::2, 0] = 1.0
    ab[1::2, 1] = 1.0
    design = StageDesign(
        seed=11,
        chains=[ChainAssignment("chr:a", 0, n)],
        ab_factors=ab,
        nucleolar_bonds=np.zeros((0, 2), np.int64),
    )
    settings = EngineSettings(
        cell_capacity=64, contact_capacity=64, grid_bound=4.0,
        use_dense_grid=False,
    )
    return InterphaseModel.from_design(design, config, settings)


def run_steps(model, x, n_steps, seed=0, start=1):
    contact = model.fresh_contact_list(x, 1.0)
    stats = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    carry = (x, jax.random.PRNGKey(seed), jnp.asarray([2.0, 2.0, 2.0], jnp.float32),
             contact, stats)
    chunk = jax.jit(
        lambda c, s: jax.lax.scan(
            lambda cr, t: (model.interphase_step(cr, t), None),
            c, s + jnp.arange(n_steps),
        )[0]
    )
    return chunk(carry, jnp.asarray(start))


def random_walk_chain(rng, n, step=0.05):
    steps = rng.normal(scale=step / np.sqrt(3), size=(n, 3))
    x = np.cumsum(steps, axis=0)
    return x - x.mean(axis=0)


@pytest.fixture(scope="module")
def equilibrated():
    model = build_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(random_walk_chain(rng, model.n), jnp.float32)
    # Equilibrate, then sample positions over several decorrelated windows.
    carry = run_steps(model, x, 2000, seed=1)
    samples = []
    for w in range(10):
        carry = run_steps(model, carry[0], 400, seed=2 + w, start=2001 + 400 * w)
        samples.append(np.asarray(carry[0]))
    return model, samples


def test_bond_fluctuations_obey_boltzmann(equilibrated):
    """Bond extension samples follow the semispring Boltzmann statistics.

    With l=0 the chain bond is a 3-D spring u = K_eff/2 r^2 (K mixed per
    pair, at bond_scale 1), softened by core repulsion; the measured variance
    must sit within a factor ~2 of kT/K (repulsion stretches bonds slightly).
    """
    model, samples = equilibrated
    k_bond = np.asarray(model.bond_spring)  # per-bond mixed K
    rel = np.concatenate(
        [s[1:] - s[:-1] for s in samples], axis=0
    )
    var = (rel**2).mean()  # per-component variance over all bonds/samples
    kt_over_k = (1.0 / k_bond).mean()
    assert 0.7 * kt_over_k < var < 3.0 * kt_over_k


def test_contact_probability_decays_with_separation(equilibrated):
    """P(s): contact probability decreases with genomic separation — the
    polymer-physics signature every Hi-C map of this model shows."""
    model, samples = equilibrated
    seps = [1, 2, 5, 10, 30, 100]
    probs = []
    for s in seps:
        hits = []
        for x in samples:
            d = np.linalg.norm(x[s:] - x[:-s], axis=1)
            hits.append((d < 0.24).mean())
        probs.append(np.mean(hits))
    # Monotone (allowing tiny noise) and strongly decaying overall.
    for a, b in zip(probs[:-1], probs[1:]):
        assert b <= a * 1.2 + 1e-4
    assert probs[0] > 10 * max(probs[-1], 1e-6) or probs[-1] == 0


def test_chain_stays_compactly_confined(equilibrated):
    model, samples = equilibrated
    for x in samples:
        r = np.linalg.norm(x, axis=1)
        assert r.max() < 2.5  # inside/near the semiaxis-2 wall
    # Radius of gyration is bounded by the wall but larger than a collapsed
    # globule of 600 beads.
    rg = np.sqrt((samples[-1] ** 2).sum(axis=1).mean())
    assert 0.3 < rg < 2.0


def test_wall_inflates_under_pressure():
    """The wall ODE responds to chromatin pressure: an overfilled nucleus
    with mobile wall inflates its semiaxes (simulation_driver_interphase.cpp:79-90)."""
    model = build_model(n=600, wall_mobility=5e-3)
    rng = np.random.default_rng(3)
    # Pack everything into a small ball: huge outward pressure.
    v = rng.normal(size=(model.n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    x = jnp.asarray(
        v * 0.6 * rng.uniform(0, 1, (model.n, 1)) ** (1 / 3), jnp.float32
    )
    # Wall starts at semiaxes much smaller than equilibrium... actually start
    # at 2.0 with beads pressed near the wall by initial repulsion.
    carry = run_steps(model, x, 500, seed=4)
    semiaxes_packed = np.asarray(carry[2])

    # Without particles near the wall (tiny droplet, wall far away), the
    # spring relaxes the semiaxes toward zero instead.
    model2 = build_model(n=600, wall_mobility=5e-3)
    carry2 = run_steps(model2, x * 0.01, 500, seed=5)
    semiaxes_empty = np.asarray(carry2[2])

    assert (semiaxes_packed > semiaxes_empty).all()
    assert (semiaxes_empty < 2.0).all()  # spring-driven shrink
