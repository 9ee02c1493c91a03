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


def so3_exp(w):
    """Rodrigues: (..., 3) rotvec -> (..., 3, 3) rotation matrix."""
    theta, theta_sq = _theta(w)
    a, b, _ = _sinc_coeffs(theta, theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def _promote(x):
    """f32 -> f64 for conditioning-critical log-map chains (see so3_log)."""
    return x.astype(jnp.float64) if x.dtype == jnp.float32 else x


def so3_log(R):
    """f32-safe wrapper: the log map's conditioning degrades as |theta| -> pi
    (arccos + 1/sin amplification); at theta ~ 3 rad the f32 chain loses
    ~4 digits, which walked the yaw estimate by degrees over a long arc.
    The matrices are 3x3: computing in (emulated) f64 is free."""
    out = _so3_log_impl(_promote(R))
    return out.astype(R.dtype)


def _so3_log_impl(R):
    """(..., 3, 3) rotation -> (..., 3) rotvec; stable near 0 and pi.

    Near pi the antisymmetric part vanishes; there we recover the axis from
    ``(R + I)/2 ≈ a a^T`` (dominant column, normalized) and orient it with the
    tiny-but-exact antisymmetric part when theta < pi.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)

    # Generic branch: w = theta / (2 sin theta) * vee(R - R^T).
    antisym = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    small = theta < _EPS
    near_pi = theta > (jnp.pi - 1e-4)
    safe_sin = jnp.where(small | near_pi, 1.0, sin_t)
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,  # Taylor of theta/(2 sin theta)
        theta / (2.0 * safe_sin),
    )
    w_generic = factor[..., None] * antisym

    # Near-pi branch: S = (R + I)/2 ≈ a a^T; take its dominant column.
    S = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) * 0.5
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(
        S, k[..., None, None].astype(jnp.int32) * jnp.ones((3, 1), jnp.int32), axis=-1
    )[..., 0]  # (..., 3): column k of S
    norm = jnp.linalg.norm(col, axis=-1, keepdims=True)
    axis_pi = col / jnp.maximum(norm, _PI_EPS)
    # Orient with the antisymmetric part (exact sign for theta < pi; at exactly
    # pi both signs are valid).
    dot = jnp.sum(axis_pi * antisym, axis=-1, keepdims=True)
    axis_pi = axis_pi * jnp.where(dot < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis_pi

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_V(w):
    """Left Jacobian of SO(3) (a.k.a. V): Exp(w)'s translation mixer."""
    theta, theta_sq = _theta(w)
    _, b, c = _sinc_coeffs(theta, theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


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
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + coef[..., None, None] * W2


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
    """(..., 6) pose -> (..., 6) twist (f64-internal; V_inv has the same
    near-pi conditioning cliff as the rotation log)."""
    p = _promote(pose)
    t, w = p[..., 0:3], p[..., 3:6]
    rho = jnp.einsum("...ij,...j->...i", so3_V_inv(w), t)
    return jnp.concatenate([rho, w], axis=-1).astype(pose.dtype)


def se3_compose(a, b):
    """a ∘ b for 6-vector poses: R = Ra Rb, t = Ra tb + ta (f64-internal:
    exp -> matmul -> log round-trips amplify f32 error near |rotvec| ~ pi)."""
    a64, b64 = _promote(a), _promote(b)
    Ra, ta = pose_rt(a64)
    Rb = so3_exp(b64[..., 3:6])
    t = jnp.einsum("...ij,...j->...i", Ra, b64[..., 0:3]) + ta
    w = _so3_log_impl(Ra @ Rb)
    return jnp.concatenate([t, w], axis=-1).astype(a.dtype)


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
