"""von Mises-Fisher utilities on S^2.

Parity targets: ``operators/kappa.py`` (continuous kappa-from-resultant blend)
and the vMF log-normalizer / Hellinger distance used by OT association
(``operators/primitive_association.py:141-197``).

All functions are batched (arbitrary leading dims), branch-free, and total.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VMF_D = 3.0  # sphere S^2 embedded in R^3
LOG_4PI = jnp.log(4.0 * jnp.pi)


def kappa_from_resultant(R_bar, eps_r: float = 1e-6, r0: float = 0.8,
                         tau: float = 0.03, d: float = VMF_D):
    """Continuous concentration estimate from mean resultant length.

    Smooth sigmoid blend of the Banerjee low-R rational estimator
    ``R (d - R^2) / (1 - R^2)`` with a conservative high-R log barrier
    ``-log(1 - R^2)`` (reference ``operators/kappa.py:84-160``; deliberately
    under-estimates kappa at high R). Returns (kappa, clamp_delta).
    """
    R = jnp.clip(R_bar, 0.0, 1.0 - eps_r)
    clamp_delta = jnp.abs(R_bar - R)
    R2 = R * R
    # Evaluate the low-R rational estimator at min(R, r0 + 5 tau): its
    # 1/(1-R^2) pole otherwise LEAKS through the (1-s) blend tail faster
    # than the sigmoid closes — at R_bar = 0.9999 the blended "conservative"
    # kappa reaches ~860 (0.0013 * 2/(1-R^2) >> the log barrier's 13.8 cap),
    # observed on clean-IMU windows where it armed the gravity factor far
    # beyond every other evidence term. The reference's operators/kappa.py
    # carries the same leak; capping the low branch at the blend boundary
    # changes nothing for R <= r0 + 5 tau and bounds the blend above it.
    R_lo = jnp.minimum(R, r0 + 5.0 * tau)
    R2_lo = R_lo * R_lo
    k_low = (R_lo * (d - R2_lo)) / (1.0 - R2_lo + eps_r)
    k_high = -jnp.log(jnp.maximum(1.0 - R2, eps_r))
    s = jax.nn.sigmoid((R - r0) / jnp.maximum(tau, 1e-6))
    return (1.0 - s) * k_low + s * k_high, clamp_delta


def log_normalizer(kappa, eps: float = 1e-12):
    """A(kappa) = log Z for vMF on S^2 wrt the uniform-scaled measure.

    Z(kappa) = 4 pi sinh(kappa)/kappa. Computed in log space, stable for both
    kappa -> 0 (Taylor: log Z -> log 4pi + kappa^2/6) and large kappa
    (log sinh(k) = k - log 2 + log(1 - e^{-2k})).
    """
    k = jnp.maximum(kappa, 0.0)
    small = k < 1e-4
    safe = jnp.maximum(k, eps)
    # log(sinh k / k) stable: k - log2 - log k + log1p(-exp(-2k))
    big_val = safe - jnp.log(2.0) - jnp.log(safe) + jnp.log1p(-jnp.exp(-2.0 * safe))
    small_val = k * k / 6.0
    return LOG_4PI + jnp.where(small, small_val, big_val)


def log_normalizer_nat(eta, eps: float = 1e-12):
    """A(|eta|) for natural-parameter vectors eta (..., 3)."""
    return log_normalizer(jnp.linalg.norm(eta, axis=-1), eps)


def bhattacharyya_coeff(eta1, eta2, eps: float = 1e-12):
    """BC between two vMFs in natural form: exp(A(.5(e1+e2)) - .5A(e1) - .5A(e2))."""
    a_mid = log_normalizer_nat(0.5 * (eta1 + eta2), eps)
    a1 = log_normalizer_nat(eta1, eps)
    a2 = log_normalizer_nat(eta2, eps)
    return jnp.exp(a_mid - 0.5 * a1 - 0.5 * a2)


def hellinger_sq(eta1, eta2, eps: float = 1e-12):
    """Squared Hellinger distance H^2 = 1 - BC in [0, 1]."""
    return jnp.clip(1.0 - bhattacharyya_coeff(eta1, eta2, eps), 0.0, 1.0)


def moment_match_resultant(etas, weights, eps: float = 1e-12):
    """Weighted mixture of vMFs -> single vMF by resultant matching.

    mean direction of vMF(eta) is A'(k) * mu where A'(k) = coth(k) - 1/k.
    Returns the natural parameter of the moment-matched vMF.
    """
    k = jnp.linalg.norm(etas, axis=-1, keepdims=True)
    mu = etas / jnp.maximum(k, eps)
    r = mean_resultant_length(k[..., 0])[..., None]  # A'(k)
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    w = weights / jnp.maximum(wsum, eps)
    rbar_vec = jnp.sum(w[..., None] * r * mu, axis=-2)
    rbar = jnp.linalg.norm(rbar_vec, axis=-1)
    kappa_new, _ = kappa_from_resultant(rbar)
    unit = rbar_vec / jnp.maximum(rbar[..., None], eps)
    return kappa_new[..., None] * unit


def mean_resultant_length(kappa, eps: float = 1e-12):
    """A'(kappa) = coth(kappa) - 1/kappa, stable near 0 (-> kappa/3)."""
    small = kappa < 1e-4
    safe = jnp.maximum(kappa, eps)
    val = 1.0 / jnp.tanh(safe) - 1.0 / safe
    return jnp.where(small, kappa / 3.0, val)
