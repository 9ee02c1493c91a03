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
    safe = jnp.where(small, jnp.ones_like(theta), theta)
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
    q = q * jnp.where(q[..., 0:1] < 0.0,
                      jnp.asarray(-1.0, q.dtype), jnp.asarray(1.0, q.dtype))

    w = q[..., 0]
    v = q[..., 1:4]
    vn = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vn, w)
    # rotvec = theta * v / vn; as vn -> 0 (theta -> 0), theta/vn -> 2/w.
    small = vn < jnp.asarray(1e-6, d)
    safe_vn = jnp.where(small, jnp.ones_like(vn), vn)
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
    safe = jnp.where(small, jnp.ones_like(theta), theta)
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
    """a ∘ b for 6-vector poses, f32-native via the quaternion route.

    HISTORY: this op used to run the a-side Rodrigues in software-emulated
    f64 because the pose STATE compounded through it scan over scan (an
    all-f32 rotvec exp/compose/log chain walked production rotation ATE
    1.1 -> 2.8 deg over 200 scans — the rotvec chart is ill-conditioned at
    the accumulated O(pi) rotation). The state now compounds as a
    QUATERNION anchor (``pose7_*``; Belief.anchor), so every remaining
    se3_compose call is evidence-side (residuals at a single linearization
    point) where f32 rounding enters as measurement noise, not state — and
    the quaternion product + atan2 log are well-conditioned at all angles,
    unlike the Rodrigues + trace-log pair this replaces."""
    return pose6_from_pose7(pose7_compose(pose7_from_pose6(a),
                                          pose7_from_pose6(b)))


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


# ---------------------------------------------------------------------------
# SE(3) as 7-vector pose [t, quat wxyz] — the STATE-compounding
# representation. The 6-vector [t, rotvec] chart needs an exp on one side
# and a log after every compose; at the accumulated O(pi) anchor rotation
# the rotvec chart is ill-conditioned (d rotvec / dR blows up near pi), so
# scan-over-scan round trips walk the state unless the anchor-side Rodrigues
# runs in SOFTWARE-EMULATED f64 (see se3_compose — the last ~0.2 ms/scan of
# f64 on the TPU). Quaternions compound with one 16-multiply product + a
# normalize, well-conditioned at every angle, all f32; rotvec/matrix forms
# are derived only where consumers need them (evidence residuals, output
# poses), where rounding enters as measurement noise, not state.
# ---------------------------------------------------------------------------


def quat_from_rotvec(w):
    """(..., 3) rotvec -> (..., 4) unit quaternion [w, x, y, z]."""
    d = w.dtype
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq)
    half = 0.5 * theta
    small = theta < jnp.asarray(_EPS, d)
    # sin(theta/2)/theta, series 1/2 - theta^2/48 below the branch point.
    s = jnp.where(small, 0.5 - theta_sq / 48.0,
                  jnp.sin(half) / jnp.where(small, jnp.ones_like(theta), theta))
    return jnp.concatenate([jnp.cos(half)[..., None], s[..., None] * w],
                           axis=-1)


def quat_to_rotvec(q):
    """(..., 4) quaternion [w, x, y, z] -> (..., 3) rotvec; stable at 0 and
    pi (theta = 2 atan2(|v|, w) on the w >= 0 representative)."""
    d = q.dtype
    q = q * jnp.where(q[..., 0:1] < 0.0,
                      jnp.asarray(-1.0, q.dtype), jnp.asarray(1.0, q.dtype))
    w, v = q[..., 0], q[..., 1:4]
    vn = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < jnp.asarray(1e-6, d)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, jnp.asarray(1e-12, d)),
                      theta / jnp.where(small, jnp.ones_like(vn), vn))
    return scale[..., None] * v


def quat_mul(a, b):
    """Hamilton product, [w, x, y, z] layout."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                           jnp.asarray(1e-12, q.dtype))


def quat_rotate(q, v):
    """Rotate (..., 3) v by (..., 4) q: v + 2 qv x (qv x v + w v)."""
    w, qv = q[..., 0:1], q[..., 1:4]
    t = jnp.cross(qv, jnp.cross(qv, v) + w * v)
    return v + 2.0 * t


def quat_to_R(q):
    """(..., 4) unit quaternion -> (..., 3, 3) rotation (elementwise)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
    ], axis=-2)


def pose7_from_pose6(p6):
    return jnp.concatenate([p6[..., 0:3], quat_from_rotvec(p6[..., 3:6])],
                           axis=-1)


def pose6_from_pose7(p7):
    return jnp.concatenate([p7[..., 0:3], quat_to_rotvec(p7[..., 3:7])],
                           axis=-1)


def pose7_compose(a7, b7):
    q = quat_normalize(quat_mul(a7[..., 3:7], b7[..., 3:7]))
    t = quat_rotate(a7[..., 3:7], b7[..., 0:3]) + a7[..., 0:3]
    return jnp.concatenate([t, q], axis=-1)


def pose7_plus(a7, xi):
    """Right-chart update a ∘ Exp(xi) for a 7-vector pose; the exp runs on
    the SMALL increment only (well-conditioned small-angle transcendentals),
    never on the accumulated state."""
    rho, omega = xi[..., 0:3], xi[..., 3:6]
    tb = jnp.einsum("...ij,...j->...i", so3_V(omega), rho)
    qb = quat_from_rotvec(omega)
    return pose7_compose(a7, jnp.concatenate([tb, qb], axis=-1))


def pose7_relative(a7, b7):
    """a^{-1} ∘ b as a 7-vector pose."""
    qa_inv = quat_conj(a7[..., 3:7])
    t = quat_rotate(qa_inv, b7[..., 0:3] - a7[..., 0:3])
    q = quat_normalize(quat_mul(qa_inv, b7[..., 3:7]))
    return jnp.concatenate([t, q], axis=-1)


def pose7_minus(a7, b7):
    """Log(b^{-1} ∘ a) as a 6-vector twist (so pose7_plus(b, out) == a)."""
    rel = pose7_relative(b7, a7)
    w = quat_to_rotvec(rel[..., 3:7])
    rho = jnp.einsum("...ij,...j->...i", so3_V_inv(w), rel[..., 0:3])
    return jnp.concatenate([rho, w], axis=-1)


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
