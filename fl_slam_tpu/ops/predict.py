"""OU-bounded belief propagation (parity: ``operators/predict.py:43-214``).

Sigma' = e^{-2 lambda dt} Sigma + (1 - e^{-2 lambda dt}) / (2 lambda) Q,
PSD-projected, then returned to information form. Bounded: Sigma(inf) = Q/(2 lambda).
"""

from __future__ import annotations

import jax.numpy as jnp

from fl_slam_tpu.core.belief import Belief
from fl_slam_tpu.core.linalg import (
    project_psd,
    spd_inverse_lifted,
    spd_solve_lifted,
    cond_proxy,
)


def predict_diffusion(b: Belief, Q, dt_sec, *, lambda_ou: float, eps_psd: float,
                      eps_lift: float):
    """Returns (belief_pred, certs dict). All device-side; no host syncs."""
    mean_prev, _ = spd_solve_lifted(b.L, b.h, eps_lift)
    cov_prev, lift_prev = spd_inverse_lifted(b.L, eps_lift)

    exp_factor = jnp.exp(-2.0 * lambda_ou * dt_sec)
    diff_coeff = (1.0 - exp_factor) / (2.0 * lambda_ou + 1e-300)
    cov_pred = exp_factor * cov_prev + diff_coeff * Q

    cov_pred_psd, proj_cov = project_psd(cov_pred, eps_psd)
    L_pred, lift_inv = spd_inverse_lifted(cov_pred_psd, eps_lift)
    L_pred_psd, proj_L = project_psd(L_pred, eps_psd)
    h_pred = jnp.einsum("...ij,...j->...i", L_pred_psd, mean_prev)

    certs = {
        "predict.psd_projection": proj_cov + proj_L,
        "predict.lift": lift_prev + lift_inv,
        "predict.cond": cond_proxy(L_pred_psd),
        "predict.cov_trace": jnp.trace(cov_pred_psd, axis1=-2, axis2=-1),
        "predict.dt": dt_sec * jnp.ones(b.h.shape[:-1], b.h.dtype),
    }
    return b._replace(L=L_pred_psd, h=h_pred), certs
