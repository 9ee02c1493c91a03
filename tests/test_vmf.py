"""vMF utilities: kappa smoothness at extremes (reference no-gate invariants),
log-normalizer stability, Hellinger bounds."""

import numpy as np
import jax.numpy as jnp

from fl_slam_tpu.core import vmf


def test_kappa_at_zero():
    k, _ = vmf.kappa_from_resultant(jnp.asarray(0.0))
    assert float(k) == 0.0


def test_kappa_near_one_finite():
    k, delta = vmf.kappa_from_resultant(jnp.asarray(1.0))
    assert np.isfinite(float(k))
    assert float(delta) > 0.0  # clamped


def test_kappa_monotone_below_blend():
    # The full blend is intentionally non-monotone near R ~ 0.8 (conservative
    # log barrier sits below the rational estimator; reference behavior).
    # Monotonicity must hold in the low-R regime where the estimator is exact.
    R = jnp.linspace(0.0, 0.7, 500)
    k, _ = vmf.kappa_from_resultant(R)
    assert np.all(np.diff(np.asarray(k)) > -1e-9)


def test_kappa_continuous_at_blend():
    R = jnp.linspace(0.7, 0.9, 2001)
    k, _ = vmf.kappa_from_resultant(R)
    dk = np.diff(np.asarray(k))
    assert dk.max() < 0.1  # no jumps across the blend point


def test_kappa_low_r_matches_banerjee():
    R = jnp.asarray([0.1, 0.3, 0.5])
    k, _ = vmf.kappa_from_resultant(R)
    expected = np.asarray(R) * (3 - np.asarray(R) ** 2) / (1 - np.asarray(R) ** 2 + 1e-6)
    np.testing.assert_allclose(np.asarray(k), expected, rtol=1e-3)


def test_log_normalizer_small_kappa():
    # Z(0) = 4 pi (uniform on S^2)
    a = vmf.log_normalizer(jnp.asarray(0.0))
    np.testing.assert_allclose(float(a), np.log(4 * np.pi), atol=1e-12)


def test_log_normalizer_matches_exact():
    k = jnp.asarray([0.01, 0.1, 1.0, 10.0, 100.0])
    a = np.asarray(vmf.log_normalizer(k))
    exact = np.log(4 * np.pi * np.sinh(np.asarray(k)) / np.asarray(k))
    np.testing.assert_allclose(a, exact, rtol=1e-10)


def test_log_normalizer_large_kappa_finite():
    a = vmf.log_normalizer(jnp.asarray(1e4))
    assert np.isfinite(float(a))


def test_hellinger_identity():
    eta = jnp.asarray([0.0, 0.0, 5.0])
    h2 = vmf.hellinger_sq(eta, eta)
    np.testing.assert_allclose(float(h2), 0.0, atol=1e-12)


def test_hellinger_opposite_high_kappa():
    e1 = jnp.asarray([0.0, 0.0, 50.0])
    e2 = jnp.asarray([0.0, 0.0, -50.0])
    h2 = vmf.hellinger_sq(e1, e2)
    assert float(h2) > 0.99


def test_hellinger_bounds(rng):
    e1 = jnp.asarray(rng.normal(size=(64, 3)) * 10)
    e2 = jnp.asarray(rng.normal(size=(64, 3)) * 10)
    h2 = np.asarray(vmf.hellinger_sq(e1, e2))
    assert np.all(h2 >= 0.0) and np.all(h2 <= 1.0)


def test_mean_resultant_length_limits():
    # A'(k) -> k/3 near 0, -> 1 for large k.
    np.testing.assert_allclose(
        float(vmf.mean_resultant_length(jnp.asarray(1e-6))), 1e-6 / 3, rtol=1e-3)
    np.testing.assert_allclose(
        float(vmf.mean_resultant_length(jnp.asarray(100.0))), 0.99, atol=0.011)


def test_moment_match_single_recovers_input():
    # At low kappa the Banerjee estimator is accurate (<1% for R<0.53), so a
    # single vMF should round-trip through moment matching; at high kappa the
    # estimator is deliberately conservative (reference behavior), so we only
    # require the direction to be preserved.
    eta = jnp.asarray([[0.0, 0.0, 1.0]])
    w = jnp.asarray([1.0])
    out = np.asarray(vmf.moment_match_resultant(eta, w))
    np.testing.assert_allclose(out[2], 1.0, rtol=0.05)
    np.testing.assert_allclose(out[:2], 0.0, atol=1e-9)

    eta_hi = jnp.asarray([[0.0, 0.0, 8.0]])
    out_hi = np.asarray(vmf.moment_match_resultant(eta_hi, w))
    assert out_hi[2] > 1.0  # direction kept, conservative magnitude
    np.testing.assert_allclose(out_hi[:2], 0.0, atol=1e-9)
