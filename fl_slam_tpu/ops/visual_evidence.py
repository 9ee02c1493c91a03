"""Pose evidence from OT correspondences (parity: reference
``operators/visual_pose_evidence.py:74-455``).

Translation: weighted least squares over soft correspondences,
  L_t = sum_{i,k} pi_ik Lambda_i,   h_t = sum_{i,k} pi_ik Lambda_i (m_k - x_i),
with x_i the measurement means ALREADY transformed to world at the
linearization pose z_lin (IMU+odom-informed), Lambda_i the world-frame
precisions. (The reference keeps Lambda in body frame — an approximation; here
the batch is world-transformed first, so the same formulas are exact in one
frame.)

Rotation: vMF scatter S = sum pi sqrt(kappa_i kappa_k) m_dir_k x_dir_i^T over
world-frame directions; SVD-projected to SO(3) gives the residual rotation
R_delta (world tangent), L_rot = diag(singular values), h_rot = L_rot Log(R_delta).

Chart embedding: the pipeline chart GC-RIGHT-01 is right-multiplicative
(X = X_lin exp(dxi)), so world-tangent evidence is conjugated into the right
chart: L_chart = R_lin^T L_world R_lin, h_chart = R_lin^T h_world. (The
reference adds world-tangent terms directly into the right-chart blocks; the
conjugation fixes that small-angle frame mismatch at zero cost.)
"""

from __future__ import annotations

import jax.numpy as jnp

from fl_slam_tpu.config import D_Z, IDX_ROT, IDX_TRANS
from fl_slam_tpu.core import se3
from fl_slam_tpu.core.linalg import sym6_to_mat33
from fl_slam_tpu.ops.association import AssociationResult
from fl_slam_tpu.structures.atlas import MapView


def visual_pose_evidence(meas_pos_w, meas_prec_w, meas_dir_w, meas_kappa,
                         meas_valid, assoc: AssociationResult, view: MapView,
                         z_lin_pose, cfg, scan_seq=None):
    """Returns (L (22,22), h (22,), certs). All inputs world-frame at z_lin.

    ``scan_seq``: current scan index (traced scalar) — needed only by the
    rotation age gate (cfg.visual_rot_age_tau > 0)."""
    dt = meas_pos_w.dtype
    pi = assoc.responsibilities * meas_valid[:, None].astype(dt)
    cp = assoc.cand_packed                                      # (N, K, 17)

    map_pos = cp[..., 0:3]                                      # (N, K, 3)
    map_dir = cp[..., 3:6]
    map_kap = cp[..., 6]

    # ---- translation WLS (soft point-to-plane) -------------------------------
    # Pair residual d = map_center - point. Its in-plane component is NOT pose
    # error — it is which part of the patch the point sampled. Weighting d
    # isotropically (point-to-point) therefore drags the pose toward patch
    # centers along planar surfaces; on a long corridor wall that injects a
    # systematic along-track bias (observed: ~1.2 m x-drift over 200 scans at
    # low turn rate). Weight instead through the surfel's SHAPE precision:
    # Lambda_hat = Lambda / lambda_max(Lambda) has eigenvalues in (0, 1] —
    # ~1 along the patch normal, ~sigma_n^2/extent^2 in-plane — so each match
    # constrains the pose only along directions the patch actually measures.
    # The measurement's scalar precision sets the overall strength.
    # Normalize by the trace, not the exact lambda_max: for the plane-like
    # precisions this weighting exists for, trace ~= lambda_max (the normal
    # eigenvalue dominates), and the trace avoids a V-sized eigen sweep in
    # the hot loop.
    # Normalized+floored shape precision, precomputed into the packed view
    # matrix at extraction time (structures/atlas.py slab_extract_view).
    # All shape algebra stays in PACKED sym6 components on (N, K) planes:
    # materializing (N, K, 3, 3) pads 42x under the (8, 128) tiler (the
    # original einsum form traced ~28 us/scan in pure padding traffic).
    xx, xy, xz, yy, yz, zz = (cp[..., 7 + i] for i in range(6))  # (N, K) each
    s_meas = (jnp.trace(meas_prec_w, axis1=-2, axis2=-1) / 3.0)  # (N,)
    # PAIR precision, not measurement precision: the residual d = map - meas
    # carries BOTH uncertainties, so its scalar information is the harmonic
    # mean s_meas s_map / (s_meas + s_map) <= min(s_meas, s_map). For
    # lidar-vs-map (comparable scales) this is a benign ~0.5x rescale; for
    # CAMERA features (mm-scale backprojection precision, 2-4 orders above
    # the map's) it caps the row at the map's own information — without it
    # 512 camera rows dominate L_t weight-independently (the round-3 open
    # issue: production 200-scan eval degraded 0.12 -> 0.52 m camera-on).
    # Harmonic MEAN (2ab/(a+b)): identity at s_meas == s_map (so lidar
    # behavior — all tuning swept at s_meas — is preserved), cap 2 s_map as
    # s_meas -> inf.
    s_map = cp[..., 17]                                         # (N, K)
    s_pair = (2.0 * s_meas[:, None] * s_map
              / jnp.maximum(s_meas[:, None] + s_map, cfg.eps_lift))
    W = pi * s_pair                                             # (N, K)
    L_t_w = sym6_to_mat33(jnp.einsum("nk,nks->s", W, cp[..., 7:13]))
    target = map_pos - meas_pos_w[:, None, :]                   # (N, K, 3)
    tx, ty, tz = target[..., 0], target[..., 1], target[..., 2]
    ltx = xx * tx + xy * ty + xz * tz                            # (Lambda t)_x
    lty = xy * tx + yy * ty + yz * tz
    ltz = xz * tx + yz * ty + zz * tz
    h_t_w = jnp.stack([jnp.sum(W * ltx), jnp.sum(W * lty),
                       jnp.sum(W * ltz)])
    res_cost = tx * ltx + ty * lty + tz * ltz                    # t^T Lambda t
    trans_cost = jnp.sum(W * res_cost)

    # ---- rotation vMF scatter ----------------------------------------------
    # (A uniform-per-row rescale of pi for the scatter was tried against the
    # weight-proportional marginal's +17% rotation cost and measured WORSE
    # — +60% — so the scatter keeps plain transported-mass weighting.)
    kw = jnp.sqrt(meas_kappa[:, None] * map_kap + 1e-12)
    w_all = pi * kw
    if cfg.visual_rot_age_tau > 0.0 and scan_seq is not None:
        # Age gate (see GCConfig.visual_rot_age_tau): mature primitives
        # anchor yaw; fresh inserts — built at the current drifted pose,
        # the map-drag ratchet's pawls — carry no rotation vote. Smooth in
        # age (no hard gate); invalid/unborn candidates (created_seq <= 0
        # sentinel) keep weight via the max(age, 0) clamp only when valid.
        age = jnp.maximum(
            jnp.asarray(scan_seq, dt) - cp[..., 18], 0.0)       # (N, K)
        w_all = w_all * age / (age + jnp.asarray(
            cfg.visual_rot_age_tau, dt))
    S = jnp.einsum("nk,nki,nj->ij", w_all, map_dir, meas_dir_w)
    dots = jnp.einsum("ni,nki->nk", meas_dir_w, map_dir)
    rot_cost = jnp.sum(w_all * (1.0 - dots))

    # Matrix-Fisher evidence LINEARIZED AT R_lin. J(R) = tr(R^T S); with
    # M = R_lin^T S the right-tangent gradient at R_lin is g = vee(M - M^T)
    # and the (negated) Hessian is H = tr(sym M) I - sym M: info-form h = g,
    # L = PSD(H). The previous mode-based form (Kabsch polar factor R_hat,
    # h = L log(R_lin^T R_hat)) is equal to first order near the mode but
    # catastrophically wrong under a DEGENERATE scatter: the polar factor's
    # weak axes are arbitrary, log(R_lin^T R_hat) is then a LARGE rotation,
    # and Log of (junk о real) mixes the junk angle into the informative
    # components (BCH) — observed as visual.rot_residual_norm ~ 1.5 rad on
    # healthy scans of the floor-dominant Kimera fixture and, under yaw, a
    # heading-dependent tilt torque (the circle-trajectory tilt pump). The
    # gradient form degrades continuously: weak axes contribute zero
    # gradient and zero information, no completion is ever taken. (The
    # reference's diag(s)-in-world-coords form shares the mode-based
    # defect, visual_pose_evidence.py:165-253.)
    # z_lin_pose is the 7-vector [t, quat] anchor-chart pose (6-vector
    # [t, rotvec] accepted for standalone/test callers).
    R_lin = (se3.quat_to_R(z_lin_pose[3:7]) if z_lin_pose.shape[-1] == 7
             else se3.so3_exp(z_lin_pose[3:6]))
    M = R_lin.T @ S
    Msym = 0.5 * (M + M.T)
    from fl_slam_tpu.core.linalg import project_psd3
    H_raw = jnp.trace(Msym) * jnp.eye(3, dtype=dt) - Msym
    H_psd, _rot_proj = project_psd3(H_raw, 0.0)
    L_r = H_psd + cfg.eps_lift * jnp.eye(3, dtype=dt)
    h_r = se3.vee(M - M.T)
    # mode-vs-linearization residual, cert-only (kabsch stays out of the
    # evidence path)
    from fl_slam_tpu.core.linalg import kabsch3x3
    R_hat, A = kabsch3x3(S)
    rotvec_delta = se3.so3_log(R_lin.T @ R_hat)                 # right tangent
    # decoupled rotation gain (see GCConfig.visual_rot_weight): applied here
    # so both the XLA tail and the belief kernel (which receive the embedded
    # L_vis) see the same scaled block
    rg = jnp.asarray(cfg.visual_rot_weight, dt)
    # ExpectedEffect: information mass the matched pairs nominate vs what
    # enters the fusion after the evidence-weight scalings (pipeline applies
    # cfg.visual_evidence_weight to both blocks; rg scales rotation here).
    vw = jnp.asarray(cfg.visual_evidence_weight, dt)
    eff_pred = jnp.trace(L_t_w) + jnp.trace(L_r)
    eff_real = vw * (jnp.trace(L_t_w) + rg * jnp.trace(L_r))
    L_r = rg * L_r
    h_r = rg * h_r

    # ---- conjugate world-tangent translation -> right chart at z_lin --------
    L_t = R_lin.T @ L_t_w @ R_lin
    h_t = R_lin.T @ h_t_w

    L = cfg.eps_lift * jnp.eye(D_Z, dtype=dt)
    h = jnp.zeros((D_Z,), dtype=dt)
    L = L.at[IDX_TRANS, IDX_TRANS].set(L_t)
    h = h.at[IDX_TRANS].set(h_t)
    L = L.at[IDX_ROT, IDX_ROT].set(L_r)
    h = h.at[IDX_ROT].set(h_r)

    certs = {
        "visual.trans_cost": trans_cost,
        "visual.rot_cost": rot_cost,
        "visual.transported_mass": jnp.sum(pi),
        "visual.rot_residual_norm": jnp.linalg.norm(rotvec_delta),
        "visual.scatter_s_min": jnp.min(jnp.diag(A)),
        "visual.effect_predicted": eff_pred,
        "visual.effect_realized": eff_real,
    }
    return L, h, certs
