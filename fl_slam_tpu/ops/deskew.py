"""Constant-twist deskew, fully batched (parity: ``operators/deskew_constant_twist.py``).

The reference vmaps a per-point function; here the SE(3) math is batch-native
(``core/se3.py``), so the whole (N, 3) buffer is one fused elementwise program —
exactly what the TPU VPU wants. Per-point transform:

  alpha_i = (t_i - t0) / (t1 - t0)
  T_i = Exp(alpha_i * xi);  p0_i = R_i^T (p_i - t_i)

with a soft time-membership kernel reweighting (no hard [t0, t1] cut).
"""

from __future__ import annotations

import jax.numpy as jnp

from fl_slam_tpu.core import se3
from fl_slam_tpu.ops.imu import smooth_window_weights


def deskew_constant_twist(points, timestamps, weights, t0, t1, xi_body, *,
                          time_warp_sigma_frac: float, eps_mass: float,
                          weight_floor: float = 1e-12):
    """Returns (points_out, weights_out, certs)."""
    denom = jnp.maximum(t1 - t0, 1e-12)
    alpha = (timestamps - t0) / denom                      # (N,)
    pose_a = se3.se3_exp(alpha[:, None] * xi_body[None, :])  # (N, 6)
    R = se3.so3_exp(pose_a[:, 3:6])                         # (N, 3, 3)
    t = pose_a[:, 0:3]
    points_out = jnp.einsum("nji,nj->ni", R, points - t)    # R^T (p - t)

    sigma = time_warp_sigma_frac * denom
    w_time = smooth_window_weights(timestamps, t0, t1, sigma, weight_floor)
    weights_out = weights * w_time

    certs = {
        "deskew.mass_retained": jnp.sum(weights_out) / (jnp.sum(weights) + eps_mass),
        "deskew.twist_norm": jnp.linalg.norm(xi_body),
    }
    return points_out, weights_out, certs
