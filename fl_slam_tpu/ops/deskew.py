"""Constant-twist deskew, fully batched (parity: ``operators/deskew_constant_twist.py``).

The reference vmaps a per-point function building an SE(3) exp per point. The
constant-twist model makes every per-point rotation a scalar multiple of ONE
twist: rotvec_i = alpha_i * omega, i.e. a FIXED axis u with per-point angle
theta_i = alpha_i * |omega|. The whole transform therefore needs no per-point
matrices at all — only per-point sines/cosines combined with three constant
vectors (u x p terms via Rodrigues, u x rho terms for the translation):

  alpha_i = (t_i - t0) / (t1 - t0)
  q_i   = p_i - t_i,        t_i = alpha_i rho + B_i th_i a_r + C_i th_i^2 b_r
  p0_i  = q_i - sin(th_i) (u x q_i) + (1 - cos th_i) (u x (u x q_i))

with a_r = u x rho, b_r = u x (u x rho) constants and B, C the SE(3) V-matrix
sinc coefficients. Everything is elementwise on component planes (3, N) —
the TPU VPU's native shape (a (N, 3)/(N, 3, 3) formulation tiles at ~42x
padded bandwidth; see core/linalg sym6p note).

A soft time-membership kernel reweights points (no hard [t0, t1] cut).
"""

from __future__ import annotations

import jax.numpy as jnp

from fl_slam_tpu.ops.imu import smooth_window_weights


def _cross_planes(u, v):
    """u (3,) constant x v (3, N) planes -> (3, N)."""
    return jnp.stack([
        u[1] * v[2] - u[2] * v[1],
        u[2] * v[0] - u[0] * v[2],
        u[0] * v[1] - u[1] * v[0],
    ], axis=0)


def deskew_constant_twist(points_p, timestamps, weights, t0, t1, xi_body, *,
                          time_warp_sigma_frac: float, eps_mass: float,
                          weight_floor: float = 1e-12):
    """points_p (3, N) planes -> (points_out (3, N), weights_out (N,), certs)."""
    dt = points_p.dtype
    denom = jnp.maximum(t1 - t0, 1e-12)
    # Clamp: real per-point stamps lie in [t0, t1] by construction; PADDING
    # entries carry stamp 0 (a sentinel), giving alpha ~ -t0/(t1-t0) (~-2e3
    # two hundred seconds into a bag) — Exp(alpha xi) then flings the
    # zero-weight pad points hundreds of meters, which is mass-invisible
    # but poisons any weight-blind geometry statistic downstream (the
    # adaptive surfel grid's p95 radius, scene-extent certs). The clamp is
    # value-exact for every real point; the soft membership kernel handles
    # edge points either way.
    alpha = jnp.clip((timestamps - t0) / denom, -0.5, 1.5).astype(dt)  # (N,)

    rho = xi_body[0:3].astype(dt)
    omega = xi_body[3:6].astype(dt)
    th_tot = jnp.linalg.norm(omega)
    safe_th = jnp.maximum(th_tot, 1e-12)
    u = omega / safe_th                                      # unit axis
    th = alpha * th_tot                                      # (N,) angles
    s = jnp.sin(th)
    c1m = 1.0 - jnp.cos(th)

    # Translation of Exp(alpha xi): t = V(alpha omega) (alpha rho)
    #   = alpha rho + B(th) th (u x rho) alpha? -- expand:
    # V(w) rho' = rho' + B hat(w) rho' + C hat(w)^2 rho', hat(w) = th hat(u),
    # rho' = alpha rho  =>  t = alpha rho + B th alpha a_r + C th^2 alpha b_r.
    small = th < 1e-4
    th_safe = jnp.where(small, 1.0, th)
    B = jnp.where(small, 0.5 - th * th / 24.0, c1m / (th_safe * th_safe))
    C = jnp.where(small, 1.0 / 6.0 - th * th / 120.0,
                  (th_safe - s) / (th_safe ** 3))
    uxr = jnp.stack([u[1] * rho[2] - u[2] * rho[1],
                     u[2] * rho[0] - u[0] * rho[2],
                     u[0] * rho[1] - u[1] * rho[0]])          # (3,) u x rho
    uxuxr = jnp.stack([u[1] * uxr[2] - u[2] * uxr[1],
                       u[2] * uxr[0] - u[0] * uxr[2],
                       u[0] * uxr[1] - u[1] * uxr[0]])        # (3,)
    coef0 = alpha                                            # (N,)
    coef1 = B * th * alpha
    coef2 = C * th * th * alpha
    t_p = (rho[:, None] * coef0[None, :]
           + uxr[:, None] * coef1[None, :]
           + uxuxr[:, None] * coef2[None, :])                # (3, N)

    q = points_p.astype(dt) - t_p
    uxq = _cross_planes(u, q)
    uxuxq = _cross_planes(u, uxq)
    # R^T q = rotation by -th about u: q - s (u x q) + (1-c) (u x (u x q)).
    points_out = q - s[None, :] * uxq + c1m[None, :] * uxuxq

    sigma = time_warp_sigma_frac * denom
    w_time = smooth_window_weights(timestamps, t0, t1, sigma, weight_floor)
    weights_out = weights * w_time.astype(weights.dtype)

    # ExpectedEffect (reference contract: every operator returns
    # (result, certs, ExpectedEffect), certificates.py:348-510):
    # predicted = first-order mean point displacement implied by the twist
    # (|rho| + |omega| x lever arm, scaled by the mean sweep fraction);
    # realized = actual weighted mean |p_deskewed - p|. Divergence measures
    # how non-linear / non-constant the true motion was over the sweep.
    w_m = jnp.maximum(weights.astype(dt), 0.0)
    w_sum = jnp.sum(w_m) + eps_mass
    rng = jnp.sqrt(jnp.sum(points_p.astype(dt) ** 2, axis=0))
    alpha_mean = jnp.sum(w_m * jnp.abs(alpha)) / w_sum
    r_mean = jnp.sum(w_m * rng) / w_sum
    disp = jnp.sqrt(jnp.sum((points_out - points_p.astype(dt)) ** 2, axis=0))
    certs = {
        "deskew.mass_retained": jnp.sum(weights_out) / (jnp.sum(weights) + eps_mass),
        "deskew.twist_norm": jnp.linalg.norm(xi_body),
        "deskew.effect_predicted": alpha_mean * (jnp.linalg.norm(rho)
                                                 + th_tot * r_mean),
        "deskew.effect_realized": jnp.sum(w_m * disp) / w_sum,
    }
    return points_out, weights_out, certs
