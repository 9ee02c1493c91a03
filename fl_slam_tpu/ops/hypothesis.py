"""Hypothesis barycenter projection (parity: ``operators/hypothesis.py``).

The hypothesis bank is a leading vmap axis; this op is already batched dense
linear algebra — no list handling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fl_slam_tpu.core.linalg import psd_guard, spd_solve_lifted


def barycenter_projection(L_stack, h_stack, z_lin_stack, weights, *,
                          weight_floor: float, eps_psd: float, eps_lift: float,
                          means=None):
    """Weight-floored information barycenter + PSD projection.

    ``means`` (the per-hypothesis mean increments, for the spread diagnostic)
    may be passed by callers that know them analytically — after anchor drift
    ``h = L @ z_lin`` holds exactly, so the pipeline passes its z_lin stack
    and skips the batched 22x22 solve.

    Returns (L_out, h_out, z_lin_out, weights_normalized, certs).
    """
    w = jnp.maximum(weights, weight_floor)
    floor_adjust = jnp.sum(jnp.abs(w - weights))
    w = w / jnp.sum(w)

    L_out, proj = psd_guard(jnp.einsum("k,kij->ij", w, L_stack), eps_psd)
    h_out = jnp.einsum("k,ki->i", w, h_stack)
    z_lin_out = jnp.einsum("k,ki->i", w, z_lin_stack)

    if means is None:
        means = jax.vmap(lambda L, h: spd_solve_lifted(L, h, eps_lift)[0])(
            L_stack, h_stack)
    mean_bar = jnp.einsum("k,ki->i", w, means)
    spread = jnp.sum(w * jnp.sum((means - mean_bar) ** 2, axis=-1))

    certs = {
        "hyp.floor_adjustment": floor_adjust,
        "hyp.psd_projection": proj,
        "hyp.spread_proxy": spread,
        "hyp.ess": 1.0 / jnp.sum(w * w),
        # ExpectedEffect: information mass of the linear barycenter vs the
        # projected output (divergence = the I-projection's PSD repair).
        "hyp.effect_predicted": jnp.einsum(
            "k,kii->", w, L_stack),
        "hyp.effect_realized": jnp.trace(L_out),
    }
    return L_out, h_out, z_lin_out, w, certs
