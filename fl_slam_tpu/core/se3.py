"""Closed-form SO(3)/SE(3) operations, batch-polymorphic.

Conventions (parity with reference ``common/geometry/se3_jax.py`` and
``docs/FRAME_AND_QUATERNION_CONVENTIONS.md``):
  - pose is a 6-vector ``[t(3), rotvec(3)]`` (trans first — same ordering as the
    22D state's pose block).
  - ``exp([rho, omega]) = (R = exp(hat(omega)), t = V(omega) @ rho)``.
  - composition ``compose(a, b) = a ∘ b`` (apply b, then a).
  - right-chart update: ``X_new = X ∘ Exp(xi)``.

Unlike the reference (scalar functions + vmap at call sites), every function
here accepts arbitrary leading batch dimensions: shapes are ``(..., 3)``,
``(..., 3, 3)``, ``(..., 6)``. That keeps XLA free to fuse the per-point deskew
math over the whole 8192-point buffer without per-element dispatch.

All small-angle branches are smooth Taylor blends selected with ``jnp.where``
over *safe* operands (both branches evaluate finitely everywhere), so the
functions are jit/grad-safe at theta → 0 and theta → π.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8          # small-angle switch point
_PI_EPS = 1e-7       # near-pi guard for log


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """(..., 3, 3) -> (..., 3). Inverse of hat (assumes skew input)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta(w):
    """Rotation angle with a floor that keeps rsqrt finite; returns (theta, theta_sq)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    return theta, theta_sq


def _sinc_coeffs(theta, theta_sq):
    """A = sin(t)/t, B = (1-cos t)/t^2, C = (t - sin t)/t^3, smooth at 0."""
    small = theta < _EPS
    t2 = theta_sq
    safe = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe) / safe)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (safe - jnp.sin(safe)) / (safe ** 3))
    return a, b, c


def _axx(w, a_diag, s, b):
    """Elementwise a_diag*I + s*W + b*w w^T assembly (shared by exp/V/V_inv:
    avoids the tiny batched ``W @ W`` dot_general — see so3_exp note)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    swx, swy, swz = s * wx, s * wy, s * wz
    bwx, bwy, bwz = b * wx, b * wy, b * wz
    return jnp.stack([
        jnp.stack([a_diag + bwx * wx, bwx * wy - swz, bwx * wz + swy],
                  axis=-1),
        jnp.stack([bwy * wx + swz, a_diag + bwy * wy, bwy * wz - swx],
                  axis=-1),
        jnp.stack([bwz * wx - swy, bwz * wy + swx, a_diag + bwz * wz],
                  axis=-1),
    ], axis=-2)


def so3_exp(w):
    """Rodrigues: (..., 3) rotvec -> (..., 3, 3) rotation matrix.

    Fully ELEMENTWISE via W^2 = w w^T - theta^2 I: R = (1 - b theta^2) I
    + a W + b w w^T, assembled with one stack. The naive ``W @ W`` form costs
    a batched 3x3 dot_general per call site — too small for the MXU, XLA
    shreds it into ~30 VPU micro-ops each, and the pipeline's ~40 small-batch
    call sites made that single line a ~330 us/scan serial tail (round-2
    trace, source-attributed)."""
    theta, theta_sq = _theta(w)
    a, b, _ = _sinc_coeffs(theta, theta_sq)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    c = 1.0 - b * theta_sq
    awx, awy, awz = a * wx, a * wy, a * wz
    bwx, bwy, bwz = b * wx, b * wy, b * wz
    return jnp.stack([
        jnp.stack([c + bwx * wx, bwx * wy - awz, bwx * wz + awy], axis=-1),
        jnp.stack([bwy * wx + awz, c + bwy * wy, bwy * wz - awx], axis=-1),
        jnp.stack([bwz * wx - awy, bwz * wy + awx, c + bwz * wz], axis=-1),
    ], axis=-2)


def _promote64(x):
    """f32 -> f64 for the state-compounding compose chain (see se3_compose)."""
    return x.astype(jnp.float64) if x.dtype == jnp.float32 else x


def so3_log(R):
    """(..., 3, 3) rotation -> (..., 3) rotvec, f32-native and stable at ALL
    angles via the quaternion route (branchless Shepperd extraction + atan2).

    The classic trace formula (arccos + 1/sin) loses ~4 f32 digits by theta ~ 3
    rad; an earlier revision fixed that by promoting to f64, but f64 is
    SOFTWARE-EMULATED on TPU — each promoted 3x3 op expanded to dozens of u32
    micro-ops and the per-hypothesis pose algebra became a ~0.5-1 ms/scan
    serial tail of (K,3,3) ops. The quaternion parameterization has no
    cancellation anywhere: Shepperd picks the largest of the four quaternion
    components as pivot (denominator >= 1), and theta = 2 atan2(|q_v|, q_w)
    is well-conditioned at 0 AND pi (unlike arccos near +-1).
    """
    return _so3_log_impl(R)


def _so3_log_impl(R):
    d = R.dtype
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = r00 + r11 + r22

    # Four pivot candidates: 4q_w^2-1, 4q_x^2-1, ... (>= 0 for the largest).
    t0 = 1.0 + tr
    t1 = 1.0 + r00 - r11 - r22
    t2 = 1.0 - r00 + r11 - r22
    t3 = 1.0 - r00 - r11 + r22
    # Unnormalized quaternions [w, x, y, z] per pivot (scale irrelevant: both
    # atan2 args share it and the axis is normalized).
    q0 = jnp.stack([t0, r21 - r12, r02 - r20, r10 - r01], axis=-1)
    q1 = jnp.stack([r21 - r12, t1, r01 + r10, r02 + r20], axis=-1)
    q2 = jnp.stack([r02 - r20, r01 + r10, t2, r12 + r21], axis=-1)
    q3 = jnp.stack([r10 - r01, r02 + r20, r12 + r21, t3], axis=-1)
    ts = jnp.stack([t0, t1, t2, t3], axis=-1)                # (..., 4)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)                # (..., 4, 4)
    sel = (ts == jnp.max(ts, axis=-1, keepdims=True)).astype(d)
    sel = sel * (jnp.cumsum(sel, axis=-1) <= 1.0)            # first max only
    q = jnp.einsum("...p,...pq->...q", sel, qs)              # (..., 4)
    # Half-angle in [0, pi/2]: flip to the w >= 0 representative.
    q = q * jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)

    w = q[..., 0]
    v = q[..., 1:4]
    vn = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vn, w)
    # rotvec = theta * v / vn; as vn -> 0 (theta -> 0), theta/vn -> 2/w.
    small = vn < jnp.asarray(1e-6, d)
    safe_vn = jnp.where(small, 1.0, vn)
    scale = jnp.where(small,
                      2.0 / jnp.maximum(w, jnp.asarray(1e-12, d)),
                      theta / safe_vn)
    return scale[..., None] * v


def so3_V(w):
    """Left Jacobian of SO(3) (a.k.a. V): Exp(w)'s translation mixer."""
    theta, theta_sq = _theta(w)
    _, b, c = _sinc_coeffs(theta, theta_sq)
    return _axx(w, 1.0 - c * theta_sq, b, c)


def so3_V_inv(w):
    """Closed-form inverse of V, stable near 0."""
    theta, theta_sq = _theta(w)
    small = theta < _EPS
    safe = jnp.where(small, 1.0, theta)
    half = safe * 0.5
    cot = half / jnp.tan(half)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - cot) / (safe * safe),
    )
    return _axx(w, 1.0 - coef * theta_sq, -0.5, coef)


def so3_right_jacobian(w):
    """Right Jacobian Jr(w) = V(-w)."""
    return so3_V(-w)


def so3_right_jacobian_inv(w):
    return so3_V_inv(-w)


# ---------------------------------------------------------------------------
# SE(3) as 6-vector pose [t, rotvec] and (R, t) pairs.
# ---------------------------------------------------------------------------

def pose_rt(pose):
    """(..., 6) -> ((..., 3, 3) R, (..., 3) t)."""
    return so3_exp(pose[..., 3:6]), pose[..., 0:3]


def se3_exp(xi):
    """(..., 6) twist [rho, omega] -> (..., 6) pose [t, rotvec]."""
    rho, omega = xi[..., 0:3], xi[..., 3:6]
    t = jnp.einsum("...ij,...j->...i", so3_V(omega), rho)
    return jnp.concatenate([t, omega], axis=-1)


def se3_log(pose):
    """(..., 6) pose -> (..., 6) twist."""
    t, w = pose[..., 0:3], pose[..., 3:6]
    rho = jnp.einsum("...ij,...j->...i", so3_V_inv(w), t)
    return jnp.concatenate([rho, w], axis=-1)


def se3_compose(a, b):
    """a ∘ b for 6-vector poses: R = Ra Rb, t = Ra tb + ta.

    f64-INTERNAL, deliberately: this is the op through which the pose STATE
    compounds scan over scan (anchor composition, world_pose, recompose,
    anchor drift), so its rounding error feeds back into the filter rather
    than averaging out — an all-f32 chain walked the production-scale
    rotation ATE from 1.1 deg to 2.8 deg over 200 scans (bisected, then
    confirmed by promoting exactly this op). It runs on a handful of single
    poses per scan, so the emulated-f64 cost is negligible — unlike the
    vmapped evidence-factor so3_log/so3_exp calls, which stay f32 (the
    quaternion log keeps them well-conditioned; their residual errors enter
    as measurement noise, not state)."""
    # Production-scale bisect result: ONLY the a-side exp — Rodrigues of
    # the accumulated large anchor rotvec — needs f64 (f32 sin/cos of an
    # O(pi) argument loses absolute precision that then compounds through
    # the state every scan). The b-side exp is a near-identity increment
    # whose f32 error acts as ~1e-7 input jitter, and the product + log in
    # f32 measured BEST of all variants (0.165 m / 1.01 deg over 200
    # drifting-odom scans vs 1.13 deg all-f64 and 2.8 deg all-f32).
    Ra = so3_exp(_promote64(a[..., 3:6])).astype(a.dtype)
    ta = a[..., 0:3]
    Rb = so3_exp(b[..., 3:6])
    t = jnp.einsum("...ij,...j->...i", Ra, b[..., 0:3]) + ta
    w = _so3_log_impl(Ra @ Rb)
    return jnp.concatenate([t, w], axis=-1)


def se3_inverse(pose):
    R, t = pose_rt(pose)
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate(
        [-jnp.einsum("...ij,...j->...i", Rt, t), -pose[..., 3:6]], axis=-1
    )


def se3_relative(a, b):
    """a^{-1} ∘ b."""
    return se3_compose(se3_inverse(a), b)


def se3_plus(pose, xi):
    """Right-chart update: pose ∘ Exp(xi)."""
    return se3_compose(pose, se3_exp(xi))


def se3_minus(a, b):
    """Right-chart difference: Log(b^{-1} ∘ a) (so se3_plus(b, out) == a)."""
    return se3_log(se3_relative(b, a))


def se3_apply(pose, p):
    """Apply pose to points: (..., 6) x (..., 3) -> (..., 3)."""
    R, t = pose_rt(pose)
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_adjoint(pose):
    """(..., 6) -> (..., 6, 6) adjoint for [rho, omega] twist ordering."""
    R, t = pose_rt(pose)
    tx = hat(t)
    top = jnp.concatenate([R, tx @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def transport_cov_pose(cov, pose):
    """Transport a 6x6 pose covariance by the adjoint of ``pose``."""
    Ad = se3_adjoint(pose)
    return Ad @ cov @ jnp.swapaxes(Ad, -1, -2)


def rotate_cov(R, cov3):
    """R Σ R^T for (..., 3, 3) covariance blocks."""
    return R @ cov3 @ jnp.swapaxes(R, -1, -2)
