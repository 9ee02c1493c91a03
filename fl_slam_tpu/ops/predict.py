"""Mechanized + OU-bounded belief propagation.

Covariance parity with the reference (``operators/predict.py:43-214``):
  Sigma' = e^{-2 lambda dt} Sigma + (1 - e^{-2 lambda dt}) / (2 lambda) Q,
PSD-projected, back to information form. Bounded: Sigma(inf) = Q / (2 lambda).

Architecture delta (deliberate, documented): the reference keeps the MEAN
fixed during prediction and feeds motion back only through relative IMU/odom
factors. Fusing a relative factor against a confident stay-put prior moves the
estimate by only E/(E+P) of the true motion every scan — an unbounded lag that
the reference's own failure-mode analysis shows (~2 m / 134 deg residual
modes, ``docs/PIPELINE_DESIGN_GAPS.md:146``). Here prediction is *mechanized*:
the pose mean advances by the preintegrated IMU delta plus the constant-
velocity translation, the velocity mean by the preintegrated Delta v, and the
pose covariance is coupled to velocity uncertainty through the transition
Jacobian F[trans, vel] = dt R_a^T. The relative IMU factors downstream then
measure ~zero residual and act as consistency evidence rather than a brake.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from fl_slam_tpu.config import D_Z, IDX_POSE, IDX_TRANS, IDX_VEL
from fl_slam_tpu.core import se3
from fl_slam_tpu.core.belief import Belief
from fl_slam_tpu.core.linalg import (
    psd_guard,
    spd_inverse_lifted,
    spd_solve_lifted,
    cond_proxy,
)


class MotionDelta(NamedTuple):
    """Mechanization input over the prediction interval (start-body frame).

    delta_rotvec: preintegrated rotation (gyro), body frame at interval start.
    delta_p_body: gravity-corrected preintegrated position (excl. v dt term).
    delta_v_body: preintegrated velocity change, start-body frame.
    """

    delta_rotvec: jnp.ndarray
    delta_p_body: jnp.ndarray
    delta_v_body: jnp.ndarray


def predict_diffusion(b: Belief, Q, dt_sec, *, lambda_ou: float, eps_psd: float,
                      eps_lift: float, motion: Optional[MotionDelta] = None,
                      mean_prev=None, cov_prev=None):
    """Returns (belief_pred, mean_pred, certs dict). All device-side.

    ``mean_pred`` is the exact mechanized mean the predicted belief encodes
    (h_pred = L_pred @ mean_pred): callers should use it instead of re-solving
    ``mean_increment(belief_pred)`` — one fewer serial 22x22 Cholesky per scan
    and exact (the lifted re-solve only approximates it to O(eps/lambda_min)).
    ``mean_prev`` may be passed in when the caller already solved it.
    """
    if mean_prev is None:
        mean_prev, _ = spd_solve_lifted(b.L, b.h, eps_lift)
    if cov_prev is None:
        # ``cov_prev`` may be threaded in from the scan carry (the previous
        # tail's (L + eps_lift I)^{-1}); identical to recomputing it here.
        cov_prev, lift_prev = spd_inverse_lifted(b.L, eps_lift)
    else:
        lift_prev = jnp.full(b.h.shape[:-1], eps_lift, dtype=b.h.dtype)
    dtype = b.h.dtype

    # ---- mean mechanization --------------------------------------------------
    mean_pred = mean_prev
    R_anchor = se3.quat_to_R(b.anchor[..., 3:7])
    if motion is not None:
        pose_inc = mean_prev[..., IDX_POSE]
        vel_w = mean_prev[..., IDX_VEL]
        # Body rotation at interval start: R_s = R_anchor Exp(dxi_rot).
        R_s = R_anchor @ se3.so3_exp(pose_inc[..., 3:6])
        trans_body = (jnp.einsum("...ji,...j->...i", R_s, vel_w) * dt_sec
                      + motion.delta_p_body)
        xi_rel = jnp.concatenate([trans_body, motion.delta_rotvec], axis=-1)
        pose_inc_new = se3.se3_log(
            se3.se3_compose(se3.se3_exp(pose_inc), se3.se3_exp(xi_rel)))
        vel_new = vel_w + jnp.einsum("...ij,...j->...i", R_s,
                                     motion.delta_v_body)
        mean_pred = mean_prev.at[..., IDX_POSE].set(pose_inc_new)
        mean_pred = mean_pred.at[..., IDX_VEL].set(vel_new)

    # ---- covariance: F Sigma F^T, then OU decay + Q ---------------------------
    # F = I with F[trans, vel] = dt R_anchor^T (world velocity -> chart trans).
    F = jnp.eye(D_Z, dtype=dtype)
    F = F.at[IDX_TRANS, IDX_VEL].set(
        dt_sec * jnp.swapaxes(R_anchor, -1, -2))
    cov_prop = F @ cov_prev @ jnp.swapaxes(F, -1, -2)

    exp_factor = jnp.exp(-2.0 * lambda_ou * dt_sec)
    diff_coeff = (1.0 - exp_factor) / (2.0 * lambda_ou + 1e-300)
    cov_pred = exp_factor * cov_prop + diff_coeff * Q

    cov_pred_psd, proj_cov = psd_guard(cov_pred, eps_psd)
    L_pred, lift_inv = spd_inverse_lifted(cov_pred_psd, eps_lift)
    L_pred_psd, proj_L = psd_guard(L_pred, eps_psd)
    h_pred = jnp.einsum("...ij,...j->...i", L_pred_psd, mean_pred)

    certs = {
        "predict.psd_projection": proj_cov + proj_L,
        "predict.lift": lift_prev + lift_inv,
        "predict.cond": cond_proxy(L_pred_psd),
        "predict.cov_trace": jnp.trace(cov_pred_psd, axis1=-2, axis2=-1),
        "predict.dt": dt_sec * jnp.ones(b.h.shape[:-1], b.h.dtype),
        "predict.motion_norm": (jnp.linalg.norm(mean_pred - mean_prev, axis=-1)
                                if motion is not None
                                else jnp.zeros(b.h.shape[:-1], dtype)),
        # ExpectedEffect (parity: certificates.py:348-510): the operator's
        # self-predicted objective delta vs what it realized. Predicted =
        # magnitude of the mechanized body-frame increment it intends to
        # apply; realized = the actual in-chart mean shift. Divergence =
        # chart curvature (the exp/log composition) + clipping.
        "predict.effect_predicted": (
            jnp.linalg.norm(xi_rel, axis=-1)
            + jnp.linalg.norm(motion.delta_v_body, axis=-1)
            if motion is not None else jnp.zeros(b.h.shape[:-1], dtype)),
        "predict.effect_realized": (
            jnp.linalg.norm(mean_pred - mean_prev, axis=-1)
            if motion is not None
            else jnp.zeros(b.h.shape[:-1], dtype)),
    }
    return b._replace(L=L_pred_psd, h=h_pred), mean_pred, certs
