"""Odometry evidence operators (parity: ``operators/odom_evidence.py``,
``operators/odom_twist_evidence.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from fl_slam_tpu.config import D_Z, IDX_POSE, IDX_ROT, IDX_TRANS, IDX_VEL
from fl_slam_tpu.core import se3
from fl_slam_tpu.core.linalg import project_psd3, psd_guard, spd_inverse_lifted
from fl_slam_tpu.ops.embed import evidence_from_block, evidence_from_scalar


def quadratic_pose_evidence(pose_pred, odom_pose, odom_cov, *, eps_psd: float,
                            eps_lift: float, rot_scale: float = 1.0):
    """SE(3) pose factor: xi_err = Log(T_pred^{-1} T_odom) on the pose block.

    ROS covariance order [x,y,z,roll,pitch,yaw] == chart [trans, rot]: no
    permutation (odom_evidence.py:39-155).
    """
    dtype = pose_pred.dtype
    # xi_err = Log(T_pred^{-1} ∘ T_odom): the increment that moves the
    # prediction onto the odom measurement (right chart).
    xi_err = se3.se3_log(se3.se3_relative(pose_pred, odom_pose))
    cov_psd = 0.5 * (odom_cov + odom_cov.T)
    cov_psd, proj = psd_guard(cov_psd, eps_psd)  # external input; diag covs in practice
    L_pose, lift = spd_inverse_lifted(cov_psd, eps_lift)
    if rot_scale != 1.0:
        # L' = S L S, S = diag(1,1,1,sqrt(s)..): scales the rotation
        # information by s, cross terms by sqrt(s), translation untouched
        sr = jnp.sqrt(jnp.asarray(rot_scale, dtype))
        d = jnp.concatenate([jnp.ones((3,), dtype), jnp.full((3,), sr)])
        L_pose = d[:, None] * L_pose * d[None, :]
    L, h = evidence_from_block(IDX_POSE, L_pose, L_pose @ xi_err, dtype)
    certs = {
        "odom_pose.nll_proxy": 0.5 * xi_err @ L_pose @ xi_err,
        "odom_pose.residual_norm": jnp.linalg.norm(xi_err),
        "odom_pose.lift": lift,
        "odom_pose.psd_projection": proj,
    }
    delta_z_star = jnp.zeros((D_Z,), dtype=dtype).at[IDX_POSE].set(xi_err)
    return L, h, delta_z_star, certs


def velocity_evidence(v_pred_world, rotvec_wb, v_odom_body, sigma_v, *,
                      eps_psd: float, eps_lift: float):
    """Body-frame velocity factor: r = v_odom_body - R^T v_pred_world."""
    dtype = v_pred_world.dtype
    R = se3.so3_exp(rotvec_wb)
    r_vel = v_odom_body - R.T @ v_pred_world
    S, proj = psd_guard(sigma_v, eps_psd)
    L3, lift = spd_inverse_lifted(S, eps_lift)
    # The state block is WORLD velocity: residual Jacobian J = -R^T, so
    # L_w = R Sigma^-1 R^T and h_w = L_w (R r) — without the conjugation the
    # correction direction is rotated by the body yaw.
    L_w = R @ L3 @ R.T
    L, h = evidence_from_block(IDX_VEL, L_w, L_w @ (R @ r_vel), dtype)
    certs = {
        "odom_vel.nll_proxy": 0.5 * r_vel @ L3 @ r_vel,
        "odom_vel.lift": lift,
        "odom_vel.psd_projection": proj,
    }
    return L, h, certs


def yawrate_evidence(omega_z_pred, omega_z_odom, sigma_wz, dtype):
    """Scalar yaw-rate factor on rotation z (odom_twist_evidence.py:160-240)."""
    r_wz = omega_z_odom - omega_z_pred
    precision = 1.0 / (sigma_wz * sigma_wz)
    L, h = evidence_from_scalar(IDX_ROT.start + 2, precision, r_wz, dtype)
    certs = {"odom_wz.nll_proxy": 0.5 * r_wz * r_wz * precision,
             "odom_wz.residual": r_wz}
    return L, h, certs


def pose_twist_consistency(pose_prev, pose_curr, v_body, omega_body, dt,
                           sigma_v, sigma_omega, *, eps_psd: float,
                           eps_lift: float):
    """Kinematic factor: pose change must match integrated twist.

    r_trans = R_prev v dt - (t_curr - t_prev); r_rot = omega dt - Log(R_prev^T R_curr);
    Sigma = dt^2 Sigma_twist (odom_twist_evidence.py:260-430).
    """
    dtype = pose_prev.dtype
    R_prev = se3.so3_exp(pose_prev[3:6])
    R_curr = se3.so3_exp(pose_curr[3:6])
    r_trans = R_prev @ v_body * dt - (pose_curr[:3] - pose_prev[:3])
    r_rot = omega_body * dt - se3.so3_log(R_prev.T @ R_curr)

    dt2 = dt * dt + eps_psd
    St, proj_t = psd_guard(dt2 * sigma_v, eps_psd)
    Sr, proj_r = psd_guard(dt2 * sigma_omega, eps_psd)
    Lt, lift_t = spd_inverse_lifted(St, eps_lift)
    Lr, lift_r = spd_inverse_lifted(Sr, eps_lift)

    L = jnp.zeros((D_Z, D_Z), dtype=dtype)
    h = jnp.zeros((D_Z,), dtype=dtype)
    L = L.at[IDX_TRANS, IDX_TRANS].set(Lt)
    h = h.at[IDX_TRANS].set(Lt @ r_trans)
    L = L.at[IDX_ROT, IDX_ROT].set(Lr)
    h = h.at[IDX_ROT].set(Lr @ r_rot)
    certs = {
        "odom_kin.nll_proxy": 0.5 * (r_trans @ Lt @ r_trans + r_rot @ Lr @ r_rot),
        "odom_kin.lift": lift_t + lift_r,
        "odom_kin.psd_projection": proj_t + proj_r,
    }
    return L, h, r_trans, r_rot, certs


def dependence_inflation_scale(r_trans, r_rot, eps_mass: float):
    """Continuous pose<->twist dependence downscale 1/(1 + |r|^2)."""
    mag = jnp.linalg.norm(r_trans) + jnp.linalg.norm(r_rot)
    return 1.0 / (1.0 + mag * mag + eps_mass)
