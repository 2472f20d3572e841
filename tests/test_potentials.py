"""Unit tests for the potential library: F = -grad u for every pair."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genome_cycle_tpu.ops import potentials as pot

R2_SAMPLES = np.linspace(0.001, 0.5, 47)


def check_force_is_neg_grad(energy_fn, coeff_fn, r2_max=0.5):
    """Verify coeff(r2) == -(1/r) du/dr via autodiff of u(r2).

    F = c * dx and u depends on r2 = |dx|^2, so dU/d(dx) = 2 u'(r2) dx
    => c = -2 u'(r2).
    """
    r2s = jnp.asarray(np.linspace(1e-3, r2_max, 53))
    du_dr2 = jax.vmap(jax.grad(energy_fn))(r2s)
    c = jax.vmap(coeff_fn)(r2s)
    np.testing.assert_allclose(np.asarray(c), -2 * np.asarray(du_dr2), rtol=1e-3, atol=1e-5)


def test_softcore_2_3():
    e, d = 2.5, 0.3
    check_force_is_neg_grad(
        lambda r2: pot.softcore_energy(r2, e, d, 2, 3),
        lambda r2: pot.softcore_force_coeff(r2, e, d, 2, 3),
    )
    # Value checks: u(0) = e, u(d) = 0, zero beyond.
    assert float(pot.softcore_energy(jnp.asarray(0.0), e, d, 2, 3)) == pytest.approx(e)
    assert float(pot.softcore_energy(jnp.asarray(d * d), e, d, 2, 3)) == pytest.approx(
        0.0, abs=1e-12
    )
    assert float(pot.softcore_energy(jnp.asarray(4 * d * d), e, d, 2, 3)) == 0.0
    assert float(pot.softcore_force_coeff(jnp.asarray(4 * d * d), e, d, 2, 3)) == 0.0
    # Repulsive inside.
    assert float(pot.softcore_force_coeff(jnp.asarray(0.01), e, d, 2, 3)) > 0


def test_softcore_8_3():
    e, d = 2.5, 0.24
    check_force_is_neg_grad(
        lambda r2: pot.softcore_energy(r2, e, d, 8, 3),
        lambda r2: pot.softcore_force_coeff(r2, e, d, 8, 3),
        r2_max=d * d * 0.999,
    )
    # Harder shoulder than <2,3>: at r = 0.8 d the <8,3> core retains more energy.
    r2 = jnp.asarray((0.8 * d) ** 2)
    u8 = float(pot.softcore_energy(r2, e, d, 8, 3))
    u2 = float(pot.softcore_energy(r2, e, d, 2, 3))
    assert u8 > u2


def test_softwell():
    e, d = 0.3, 0.2
    check_force_is_neg_grad(
        lambda r2: pot.softwell_energy(r2, e, d, 6),
        lambda r2: pot.softwell_force_coeff(r2, e, d, 6),
    )
    # Attractive well: u(0) = -e, attraction (c < 0) at finite r.
    assert float(pot.softwell_energy(jnp.asarray(1e-12), e, d, 6)) == pytest.approx(-e)
    assert float(pot.softwell_force_coeff(jnp.asarray(0.04), e, d, 6)) < 0


def test_cutoff_shift():
    e, d = 0.3, 0.2
    cutoff = 0.4
    fn = lambda r2: pot.softwell_energy(r2, e, d, 6)
    u_at_cut = float(pot.cutoff_shift(fn, jnp.asarray(cutoff**2 * 0.9999), cutoff))
    assert abs(u_at_cut) < 1e-4
    assert float(pot.cutoff_shift(fn, jnp.asarray(cutoff**2 * 1.01), cutoff)) == 0.0
    # Shifted but same shape inside.
    u_in = float(pot.cutoff_shift(fn, jnp.asarray(0.01), cutoff))
    assert u_in == pytest.approx(float(fn(jnp.asarray(0.01)) - fn(jnp.asarray(cutoff**2))))


def test_springs():
    check_force_is_neg_grad(
        lambda r2: pot.spring_energy(r2, 100.0, 0.3),
        lambda r2: pot.spring_force_coeff(r2, 100.0, 0.3),
    )
    check_force_is_neg_grad(
        lambda r2: pot.harmonic_energy(r2, 50.0),
        lambda r2: pot.harmonic_force_coeff(r2, 50.0),
    )
    # Semispring: zero under equilibrium distance, spring beyond.
    b = 0.3
    assert float(pot.semispring_energy(jnp.asarray(0.04), 100.0, b)) == 0.0
    assert float(pot.semispring_force_coeff(jnp.asarray(0.04), 100.0, b)) == 0.0
    r2 = jnp.asarray(0.25)  # r = 0.5 > b
    assert float(pot.semispring_energy(r2, 100.0, b)) == pytest.approx(
        0.5 * 100 * (0.5 - 0.3) ** 2
    )
    check_force_is_neg_grad(
        lambda r2: pot.semispring_energy(r2, 100.0, b),
        lambda r2: pot.semispring_force_coeff(r2, 100.0, b),
        r2_max=1.0,
    )


def test_force_flux():
    f, b = 2.0, 0.5
    check_force_is_neg_grad(
        lambda r2: pot.force_flux_energy(r2, f, b),
        lambda r2: pot.force_flux_force_coeff(r2, f, b),
        r2_max=4.0,
    )
    # Near-constant force close to the pole, Coulomb-like far away
    # (force_flux_potential.hpp:8-17).
    near = float(pot.force_flux_force_coeff(jnp.asarray(1e-4), f, b)) * 1e-2
    assert near == pytest.approx(f, rel=0.05)
    far_r = 50.0
    far = float(pot.force_flux_force_coeff(jnp.asarray(far_r**2), f, b)) * far_r
    assert far == pytest.approx(f * b * b / far_r**2, rel=0.01)


def test_ab_pair_mix():
    params = dict(a_energy=2.5, a_diameter=0.3, b_energy=2.5, b_diameter=0.24)
    r2 = jnp.asarray(0.01)
    # Pure A pair equals the softcore<2,3>; pure B equals softcore<8,3>.
    ua = float(pot.ab_pair_energy(r2, 1.0, 0.0, params))
    assert ua == pytest.approx(float(pot.softcore_energy(r2, 2.5, 0.3, 2, 3)))
    ub = float(pot.ab_pair_energy(r2, 0.0, 1.0, params))
    assert ub == pytest.approx(float(pot.softcore_energy(r2, 2.5, 0.24, 8, 3)))
    # Mixed pair is the weighted sum.
    um = float(pot.ab_pair_energy(r2, 0.5, 0.5, params))
    assert um == pytest.approx(0.5 * ua + 0.5 * ub)


def test_cosine_bending():
    e = 1.0
    straight = pot.cosine_bending_energy(
        jnp.asarray([[1.0, 0, 0]]), jnp.asarray([[2.0, 0, 0]]), e
    )
    assert float(straight[0]) == pytest.approx(0.0, abs=1e-6)
    right_angle = pot.cosine_bending_energy(
        jnp.asarray([[1.0, 0, 0]]), jnp.asarray([[0.0, 1.0, 0]]), e
    )
    assert float(right_angle[0]) == pytest.approx(1.0)
    reversed_ = pot.cosine_bending_energy(
        jnp.asarray([[1.0, 0, 0]]), jnp.asarray([[-1.0, 0, 0]]), e
    )
    assert float(reversed_[0]) == pytest.approx(2.0)
