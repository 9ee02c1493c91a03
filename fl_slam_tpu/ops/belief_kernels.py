"""Pallas TPU kernel for the per-scan scalar belief tail (steps 9-15 + IW).

Why a kernel: after the map/association stages, every scan runs a chain of
~300 TINY ops (22-D fusion/tempering, Frobenius recompose, anchor drift,
barycenter, Inverse-Wishart updates — none larger than (22, 22)) that XLA
executes as individual HLOs at a ~0.4 us/op sequencing floor (xplane trace,
round 3: 1316 leaf ops/scan, 546 us of inter-op idle). One Pallas kernel runs
the whole chain on-chip as a single fused program: the 22x22 solves become
unrolled masked-vector Cholesky sweeps in VMEM, and the per-op dispatch cost
disappears.

Math parity: `_tail_math` mirrors, step for step,
  - ``fl_slam_tpu/ops/fusion.py`` (tempering/excitation/alpha/additive fusion)
  - ``fl_slam_tpu/ops/recompose.py`` (frobenius_recompose, anchor_drift_update)
  - ``fl_slam_tpu/ops/hypothesis.py`` (barycenter at K=1)
  - ``fl_slam_tpu/ops/noise.py`` (process/measurement suffstats + apply)
  - the innovation-feed block in ``pipeline._scan_core``
for the production k_hyp=1 configuration (the K>1 / MHT path stays on the
XLA implementations). Equivalence is gated by
tests/test_tpu_kernels.py::TestScalarTailKernel against the XLA pipeline.

Mosaic lowering rules this kernel had to respect (all found by probing on a
real v5e; each has a helper or an inline comment at the use site):
  - no 2-D slices or row extraction at a NONZERO sublane offset (compiler
    SIGABRT `offsets_[0] < tiling_[0]`) -> _row/_block6 masked reductions;
  - never reduce a SUBLANE-oriented 1-D vector (column extracts, axis=1
    matvec outputs) -> _mv/_diag produce lane-oriented vectors;
  - no `lax.clamp` on small 1-D vectors -> minimum/maximum composition;
  - no captured array constants, no zero-size operands, no `.at[].add`
    (scatter), no (K,)->(K,1,1) broadcasts over 3-D operands, no 3-D masked
    traces -> scalar-literal stacks and per-block 2-D math.

Deliberate (documented) numeric deltas vs the XLA path, all O(eps):
  - the in-kernel Cholesky uses the same lift + symmetrization as
    ``spd_solve_lifted`` but its own unrolled elimination order; f32
    round-off differs in the last ulps.
  - ``anchor.effect_realized`` and the pose6 conversion of the published
    pose run OUTSIDE the kernel (they need ``quat_to_rotvec``/arctan2 —
    ~10 ops/scan, not worth lowering risk).

Parity anchors (reference): ``operators/fusion.py``, ``operators/recompose.py``,
``operators/anchor_drift.py``, ``operators/hypothesis.py``,
``backend/structures/inverse_wishart_jax.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_slam_tpu.config import (D_Z, GCConfig, IDX_DT, IDX_EX, IDX_POSE,
                                IDX_VEL)
from fl_slam_tpu.core import se3

# Test hook: force the kernel path (interpret mode) on CPU so the full
# pipeline can be driven through the kernel without a TPU.
FORCE_INTERPRET = False

# Cert scalars the kernel emits, in vector order (pipeline unpacks by index).
CERT_KEYS = (
    "temper.beta", "temper.dt_asymmetry", "temper.z_to_xy",
    "exc.s_dt", "exc.s_ex",
    "fusion.alpha", "fusion.psd_projection", "fusion.trace_increase",
    "fusion.effect_predicted", "fusion.effect_realized",
    "recompose.frobenius_strength", "recompose.bch_norm",
    "recompose.pose_increment_norm", "recompose.effect_predicted",
    "recompose.effect_realized",
    "anchor.rho", "anchor.drift_m", "anchor.drift_r",
    "anchor.effect_predicted",
    "hyp.floor_adjustment", "hyp.psd_projection", "hyp.spread_proxy",
    "hyp.ess",
    "iw_process.psd_projection", "iw_process.effect_predicted",
    "iw_process.effect_realized", "iw_meas.psd_projection",
)

_IW_DIMS = (3, 3, 3, 3, 3, 1, 6)
_IW_STARTS = (0, 3, 6, 9, 12, 15, 16)


def use_scalar_tail_kernel(cfg: GCConfig) -> bool:
    if not (cfg.belief_kernel and cfg.k_hyp == 1):
        return False
    return FORCE_INTERPRET or jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Mosaic-safe small linear algebra (static shapes, no custom calls, no 1D
# iota). All loops are unrolled over the STATIC dimension.
# ---------------------------------------------------------------------------

def _eye(n, dt):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dt)


def _rowge(n, k, dt):
    """(n,) mask of rows >= k (2D iota, then a static column slice)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    return (r >= k).astype(dt)


def _onehot(n, k, dt):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    return (r == k).astype(dt)


def _tr(A):
    return jnp.sum(A * _eye(A.shape[-1], A.dtype))


def _mv(A, x):
    """(n, n) @ (n,) without dot_general (VPU elementwise + reduce). The
    result is LANE-oriented (keepdims reduce + transpose): Mosaic crashes
    when a sublane-oriented 1-D vector is later reduced (probed)."""
    return jnp.sum(A * x[None, :], axis=1, keepdims=True).T[0, :]


def _outer(a, b):
    return a[:, None] * b[None, :]


def _sym_lift(A, eps):
    n = A.shape[-1]
    return 0.5 * (A + A.T) + jnp.asarray(eps, A.dtype) * _eye(n, A.dtype)


def _chol(A):
    """Lower Cholesky of a symmetric lifted (n, n), unrolled masked-vector
    right-looking elimination (identical algorithm to
    ``core.linalg._chol_unrolled``, vector form)."""
    n = A.shape[0]
    dt = A.dtype
    L = jnp.zeros_like(A)
    W = A
    for k in range(n):
        d = jnp.sqrt(jnp.maximum(W[k, k], jnp.asarray(1e-30, dt)))
        lk = (W[:, k] / d) * _rowge(n, k, dt)
        L = L + _outer(lk, _onehot(n, k, dt))
        W = W - _outer(lk, lk)
    return L


def _chol_solve(L, B):
    """Solve L L^T X = B for (n, m) B; unrolled forward/backward elimination
    vectorized across the RHS columns."""
    n = L.shape[0]
    dt = L.dtype
    Y = jnp.zeros_like(B)
    R = B
    for i in range(n):
        yi = R[i, :] / L[i, i]
        Y = Y + _outer(_onehot(n, i, dt), yi)
        R = R - _outer(L[:, i], yi)
    X = jnp.zeros_like(B)
    R = Y
    for i in reversed(range(n)):
        xi = R[i, :] / L[i, i]
        X = X + _outer(_onehot(n, i, dt), xi)
        R = R - _outer(L[i, :], xi)
    return X


def _diag(A):
    # axis=0: lane-oriented output (safe to slice+reduce; see _mv note)
    return jnp.sum(A * _eye(A.shape[-1], A.dtype), axis=0)


def _row(A, i):
    """Row i of (n, m) A via masked reduction (direct row extraction at a
    nonzero sublane offset crashes the Mosaic layout pass; see _block6)."""
    n = A.shape[0]
    return jnp.sum(A * _onehot(n, i, A.dtype)[:, None], axis=0)


def _block6(S, s0, d, dt):
    """(6, 6) zero-padded copy of S[s0:s0+d, s0:s0+d] via a one-hot selection
    matrix E (6, n): Si = E S E^T as elementwise+reduce. Mosaic crashes on
    2-D sublane-offset slices AND on row extraction at nonzero sublane
    offsets (`Check failed: offsets_[0] < tiling_[0]`); masked reductions
    lower fine (probed)."""
    n = S.shape[0]
    r6 = jax.lax.broadcasted_iota(jnp.int32, (6, n), 0)
    cn = jax.lax.broadcasted_iota(jnp.int32, (6, n), 1)
    E = ((cn == r6 + s0) & (r6 < d)).astype(dt)            # (6, n)
    T1 = jnp.sum(E[:, :, None] * S[None, :, :], axis=1)    # (6, n)
    return jnp.sum(T1[:, None, :] * E[None, :, :], axis=2)


def _cross3(a, b):
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])


def _norm(x):
    return jnp.sqrt(jnp.sum(x * x))


def _softplus(x):
    return jnp.logaddexp(x, jnp.zeros_like(x))


def _softplus_positive(x, eps=1e-12, beta=50.0):
    # parity: ops/noise.py:_softplus_positive
    return _softplus(beta * x) / beta + eps


def _smooth_nu_clip(nu_raw, nu_min, nu_max):
    nu_floor = nu_min + _softplus(nu_raw - nu_min)
    return nu_max - _softplus(nu_max - nu_floor)


def _pose7_plus(a7, xi):
    """se3.pose7_plus for a single (7,) pose (same math, local cross/stack)."""
    rho, omega = xi[0:3], xi[3:6]
    tb = _mv(se3.so3_V(omega), rho)
    qb = se3.quat_from_rotvec(omega)
    qa = a7[3:7]
    q = se3.quat_normalize(se3.quat_mul(qa, qb))
    t = se3.quat_rotate(qa, tb) + a7[0:3]
    return jnp.concatenate([t, q])


# ---------------------------------------------------------------------------
# The tail math (pure jnp; runs inside the kernel AND standalone in tests).
# ---------------------------------------------------------------------------

def _tail_math(cfg: GCConfig, L_pred, h_pred, anchor, mu_pred, L_io, h_io,
               z_lin, L_vis, h_vis_rel, dz_odom, pnu, ppsi, mnu, mpsi,
               dpsi_gyro, dpsi_accel, dpsi_lidar, scal):
    """K=1 scalar tail. ``scal`` = [ess_pre, ot_ess, ot_cost, grav_psd_proj,
    cond_p6]. Returns the full output tuple (see ``scalar_tail``)."""
    dt = L_pred.dtype
    eps_mass = cfg.eps_mass
    ess_pre, ot_ess, ot_cost, grav_proj, cond_p6 = (scal[i] for i in range(5))

    # ---- step 9: evidence assembly + tempering (ops/fusion.py parity) ----
    h_vis = h_vis_rel + _mv(L_vis, z_lin)
    L_ev = L_io + cfg.visual_evidence_weight * L_vis
    h_ev = h_io + cfg.visual_evidence_weight * h_vis
    ess_total = ess_pre + ot_ess

    e_dt = L_ev[IDX_DT.start, IDX_DT.start]
    e_ex = jnp.sum(_diag(L_ev)[IDX_EX])
    pi_dt = L_pred[IDX_DT.start, IDX_DT.start]
    pi_ex = jnp.sum(_diag(L_pred)[IDX_EX])
    s_dt = e_dt / (e_dt + pi_dt + cfg.exc_eps)
    s_ex = e_ex / (e_ex + pi_ex + cfg.exc_eps)
    exc_total = s_dt + s_ex

    row_dt = _row(L_ev, IDX_DT.start)
    col_dt = _row(L_ev.T, IDX_DT.start)      # lane-oriented column
    dt_pose = _norm(row_dt[IDX_POSE]) + _norm(col_dt[IDX_POSE])
    dt_vel = _norm(row_dt[IDX_VEL]) + _norm(col_dt[IDX_VEL])
    dt_asym = jnp.clip(jnp.abs(dt_vel - dt_pose)
                       / (dt_vel + dt_pose + eps_mass), 0.0, 1.0)
    z_to_xy = jnp.abs(L_ev[2, 2]) / (
        0.5 * (jnp.abs(L_ev[0, 0]) + jnp.abs(L_ev[1, 1])) + eps_mass)
    s_z = z_to_xy / (z_to_xy + cfg.power_beta_z_c)
    s_exc = 1.0 / (1.0 + (ess_total / (exc_total + eps_mass))
                   / cfg.power_beta_exc_c)
    s = jnp.clip(dt_asym * s_z * s_exc, 0.0, 1.0)
    beta = jnp.clip(cfg.power_beta_min + (1.0 - cfg.power_beta_min) * s,
                    cfg.power_beta_min, 1.0)
    L_ev, h_ev = beta * L_ev, beta * h_ev

    # excitation prior scaling: the XLA path scales dt ROWS then dt COLS
    # (then ex rows, ex cols) sequentially, so element (i, j) picks up
    # a_dt^([i in dt] + [j in dt]) * a_ex^([i in ex] + [j in ex]) — the
    # (dt, dt) / (ex, ex) diagonals get the SQUARE.
    a_dt, a_ex = 1.0 - s_dt, 1.0 - s_ex
    n = D_Z
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    one = jnp.ones((n, n), dt)
    in_dt_r = (r >= IDX_DT.start) & (r < IDX_DT.stop)
    in_dt_c = (c >= IDX_DT.start) & (c < IDX_DT.stop)
    in_ex_r = r >= IDX_EX.start
    in_ex_c = c >= IDX_EX.start
    sc = (jnp.where(in_dt_r, a_dt * one, one)
          * jnp.where(in_dt_c, a_dt * one, one)
          * jnp.where(in_ex_r, a_ex * one, one)
          * jnp.where(in_ex_c, a_ex * one, one))
    L_prior = L_pred * sc
    rv = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0, :]  # lane iota
    hsc = jnp.ones((n,), dt)
    hsc = jnp.where((rv >= IDX_DT.start) & (rv < IDX_DT.stop), hsc * a_dt, hsc)
    hsc = jnp.where(rv >= IDX_EX.start, hsc * a_ex, hsc)
    h_prior = h_pred * hsc

    # trust alpha (constant 1.0 at the reference's alpha_min=alpha_max=1)
    nll_per_ess = ot_cost / jnp.maximum(ess_total, eps_mass)
    cond_q = cfg.c0_cond / (cond_p6 + cfg.c0_cond)
    support_q = ess_total / (ess_total + 1.0)
    mismatch_q = jnp.exp(-nll_per_ess)
    quality = (jnp.sqrt(cond_q * support_q) * mismatch_q
               * jnp.clip(dt_asym, 0.0, 1.0)
               * jnp.clip(z_to_xy / (z_to_xy + 1.0), 0.0, 1.0)
               * jnp.clip(exc_total / (exc_total + 1.0), 0.0, 1.0)
               * jnp.clip(beta, 0.0, 1.0))
    alpha = jnp.clip(cfg.alpha_min + (cfg.alpha_max - cfg.alpha_min) * quality,
                     cfg.alpha_min, cfg.alpha_max)

    # ---- step 10: additive fusion (psd_guard = sym + eps) ----------------
    L_post = _sym_lift(L_prior + alpha * L_ev, cfg.eps_psd)
    h_post = h_prior + alpha * h_ev
    fusion_proj = jnp.zeros((), dt)
    trace_inc = _tr(L_post) - _tr(L_prior)


    # ---- step 11: Frobenius recompose (ops/recompose.py parity) ----------
    # ONE factorization serves the mean solve and the block-diagonal
    # covariance (23 RHS = [h | I]).
    A = _sym_lift(L_post, cfg.eps_lift)
    Lc = _chol(A)
    sol = _chol_solve(Lc, jnp.concatenate([h_post[:, None], _eye(n, dt)],
                                          axis=1))
    dz = sol.T[0, :]                         # lane-oriented mean
    Sigma_post = 0.5 * (sol[:, 1:] + sol[:, 1:].T)


    delta_pose = dz[IDX_POSE]
    trigger = fusion_proj + grav_proj
    strength = trigger / (trigger + cfg.c_frob)
    zp = z_lin[IDX_POSE]
    w_cross = _cross3(zp[3:6], delta_pose[3:6])
    v_cross = (_cross3(zp[3:6], delta_pose[0:3])
               + _cross3(zp[0:3], delta_pose[3:6]))
    corr = 0.5 * jnp.concatenate([v_cross, w_cross])
    delta_corr = delta_pose + strength * corr

    anchor_rec = _pose7_plus(anchor, delta_corr)
    shift = jnp.concatenate([delta_corr, jnp.zeros((n - 6,), dt)])
    z_lin_new = z_lin - shift
    dz_new = dz - shift
    h_rec = h_post - _mv(L_post, shift)


    # ---- process-noise suffstats (ops/noise.py parity) --------------------
    # mu_post = dz_new + shift == dz (the pre-shift mean).
    rres = dz - mu_pred
    blocks = []
    for d, s0 in zip(_IW_DIMS, _IW_STARTS):
        if d < 6:
            ri = jnp.concatenate([rres[s0:s0 + d], jnp.zeros((6 - d,), dt)])
        else:
            ri = rres[s0:s0 + d]
        blocks.append(_outer(ri, ri) + _block6(Sigma_post, s0, d, dt))
    dnu_q = jnp.ones((7,), dt)
    # odom innovation feed (pipeline._scan_core parity); added to the trans/
    # rot blocks BEFORE stacking (indexed .at[].add lowers to scatter, which
    # Mosaic does not implement).
    xi_err = dz_odom
    # min/max instead of jnp.clip: lax.clamp on a small 1-D vector crashes
    # the Mosaic layout pass (probed; scalar clamps are fine)
    xi_t = jnp.minimum(jnp.maximum(xi_err[0:3], -cfg.innovation_clip_trans),
                       cfg.innovation_clip_trans)
    xi_r = jnp.minimum(jnp.maximum(xi_err[3:6], -cfg.innovation_clip_rot),
                       cfg.innovation_clip_rot)
    pad3 = jnp.zeros((3,), dt)
    xt6 = jnp.concatenate([xi_t, pad3])
    xr6 = jnp.concatenate([xi_r, pad3])
    blocks[0] = blocks[0] + cfg.innovation_q_trans * _outer(xt6, xt6)
    blocks[1] = blocks[1] + cfg.innovation_q_rot * _outer(xr6, xr6)


    # ---- step 13: anchor drift (dz handed over — no second solve) --------
    dpd = dz_new[IDX_POSE]
    drift_m = _norm(dpd[0:3])
    drift_r = _norm(dpd[3:6])
    rho = jnp.clip(jnp.maximum(drift_m / cfg.anchor_drift_m0,
                               drift_r / cfg.anchor_drift_r0), 0.0, 1.0)
    anchor_fin = _pose7_plus(anchor_rec, rho * dpd)
    z_drift = (1.0 - rho) * dz_new
    h_fin = _mv(L_post, z_drift)

    # ---- step 15: barycenter at K=1 (ops/hypothesis.py parity) -----------
    w1 = jnp.maximum(jnp.asarray(1.0, dt), cfg.hyp_weight_floor)
    floor_adjust = jnp.abs(w1 - 1.0)
    # bel_bar's L (second eps_psd lift) feeds ONLY the published-pose solve;
    # the state keeps L_post (one lift), matching the XLA path.
    L_bar = _sym_lift(L_post, cfg.eps_psd)
    h_bar = h_fin
    hyp_proj = jnp.zeros((), dt)
    spread = jnp.zeros((), dt)
    hyp_ess = jnp.asarray(1.0, dt)

    # published pose: world_pose(bel_bar) — second (cheap) factorization
    A2 = _sym_lift(L_bar, cfg.eps_lift)
    Lc2 = _chol(A2)
    mean_bar = _chol_solve(Lc2, h_bar[:, None]).T[0, :]
    pose7_out = _pose7_plus(anchor_fin, mean_bar[IDX_POSE])


    # ---- IW apply (ops/noise.py parity) -----------------------------------

    # ---- IW apply (ops/noise.py parity) -----------------------------------
    # Per-BLOCK 2-D math with static Python rho scalars: Mosaic rejects
    # (7,)->(7,1,1) broadcasts over 3-D operands and 3-D masked traces
    # (probed); per-block 2-D ops + one final stack lower fine.
    rhos_q = (cfg.iw_rho_trans, cfg.iw_rho_rot, cfg.iw_rho_vel, cfg.iw_rho_bg,
              cfg.iw_rho_ba, cfg.iw_rho_dt, cfg.iw_rho_ex)
    eye6 = _eye(6, dt)
    r6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 0)
    c6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 1)
    psi_blocks = []
    iw_pred = jnp.zeros((), dt)
    iw_real = jnp.zeros((), dt)
    for i, (d, rho_i) in enumerate(zip(_IW_DIMS, rhos_q)):
        m = ((r6 < d) & (c6 < d)).astype(dt)
        raw = (rho_i * ppsi[i] + blocks[i]) * m
        psd = 0.5 * (raw + raw.T) + cfg.eps_psd * eye6
        psi_blocks.append(psd)
        iw_pred = iw_pred + jnp.sum(blocks[i] * eye6)
        iw_real = iw_real + jnp.sum((psd - rho_i * ppsi[i]) * eye6)
    psi_psd = jnp.stack(psi_blocks)
    rho_q = jnp.stack([jnp.asarray(x, dt) for x in rhos_q])
    dims_q = jnp.stack([jnp.asarray(float(d), dt) for d in _IW_DIMS])
    nu_min_q = dims_q + 1.0 + cfg.iw_nu_weak_add
    pnu_new = _smooth_nu_clip(rho_q * pnu + dnu_q, nu_min_q, 1000.0)

    rhos_m = (cfg.iw_rho_meas_gyro, cfg.iw_rho_meas_accel,
              cfg.iw_rho_meas_lidar)
    eye3 = _eye(3, dt)
    mpsi_blocks = []
    for i, (dm, rho_i) in enumerate(zip((dpsi_gyro, dpsi_accel, dpsi_lidar),
                                        rhos_m)):
        raw = rho_i * mpsi[i] + dm
        mpsi_blocks.append(0.5 * (raw + raw.T) + cfg.eps_psd * eye3)
    mpsi_psd = jnp.stack(mpsi_blocks)
    rho_m = jnp.stack([jnp.asarray(x, dt) for x in rhos_m])
    nu_min_m = jnp.asarray(3.0 + 1.0 + cfg.iw_nu_weak_add, dt)
    mnu_new = _smooth_nu_clip(rho_m * mnu + 1.0, nu_min_m, 1000.0)

    certs = jnp.stack([
        beta, dt_asym, z_to_xy,
        s_dt, s_ex,
        alpha, fusion_proj, trace_inc,
        alpha * _tr(L_ev), trace_inc,
        strength, _norm(corr), _norm(delta_corr), _norm(delta_pose),
        _norm(delta_corr),
        rho, drift_m, drift_r, rho * _norm(dpd),
        floor_adjust, hyp_proj, spread, hyp_ess,
        jnp.zeros((), dt), iw_pred, iw_real, jnp.zeros((), dt),
    ])
    return (L_post, h_fin, anchor_fin, anchor_rec, z_drift, pose7_out,
            pnu_new, psi_psd, mnu_new, mpsi_psd, certs)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _kernel_body(cfg: GCConfig,
                 L_pred_ref, h_pred_ref, anchor_ref, mu_pred_ref, L_io_ref,
                 h_io_ref, z_lin_ref, L_vis_ref, h_vis_ref, dz_odom_ref,
                 pnu_ref, ppsi_ref, mnu_ref, mpsi_ref, dg_ref, da_ref,
                 dl_ref, scal_ref,
                 L_out_ref, h_out_ref, anchor_fin_ref, anchor_rec_ref,
                 z_drift_ref, pose7_ref, pnu_out_ref, ppsi_out_ref,
                 mnu_out_ref, mpsi_out_ref, certs_ref):
    out = _tail_math(cfg,
                     L_pred_ref[:], h_pred_ref[0, :], anchor_ref[0, :],
                     mu_pred_ref[0, :], L_io_ref[:], h_io_ref[0, :],
                     z_lin_ref[0, :], L_vis_ref[:], h_vis_ref[0, :],
                     dz_odom_ref[0, :], pnu_ref[0, :], ppsi_ref[:],
                     mnu_ref[0, :], mpsi_ref[:], dg_ref[:], da_ref[:],
                     dl_ref[:], scal_ref[0, :])
    (L_fin, h_fin, anchor_fin, anchor_rec, z_drift, pose7_out,
     pnu_new, ppsi_new, mnu_new, mpsi_new, certs) = out
    L_out_ref[:] = L_fin
    h_out_ref[0, :] = h_fin
    anchor_fin_ref[0, :] = anchor_fin
    anchor_rec_ref[0, :] = anchor_rec
    z_drift_ref[0, :] = z_drift
    pose7_ref[0, :] = pose7_out
    pnu_out_ref[0, :] = pnu_new
    ppsi_out_ref[:] = ppsi_new
    mnu_out_ref[0, :] = mnu_new
    mpsi_out_ref[:] = mpsi_new
    certs_ref[0, :] = certs


def scalar_tail(cfg: GCConfig, L_pred, h_pred, anchor, mu_pred, L_io, h_io,
                z_lin, L_vis, h_vis_rel, dz_odom, pnu, ppsi, mnu, mpsi,
                dpsi_gyro, dpsi_accel, dpsi_lidar, ess_pre, ot_ess, ot_cost,
                grav_proj, cond_p6, *, interpret: bool | None = None):
    """Run the scalar tail as ONE kernel. All inputs are the K=1 slices.

    Returns (L_fin, h_fin, anchor_fin, anchor_rec, z_drift, pose7_out,
    pnu', ppsi', mnu', mpsi', certs_vec[len(CERT_KEYS)]) — (L_fin, h_fin,
    anchor_fin) is the post-drift state belief (K axis stripped).
    """
    dt = L_pred.dtype
    n = D_Z
    if interpret is None:
        interpret = FORCE_INTERPRET and jax.default_backend() != "tpu"
    scal = jnp.stack([ess_pre, ot_ess, ot_cost, grav_proj,
                      cond_p6]).astype(dt)[None, :]
    v = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((n, n), dt),       # L_bar
        jax.ShapeDtypeStruct((1, n), dt),       # h_bar
        jax.ShapeDtypeStruct((1, 7), dt),       # anchor_fin
        jax.ShapeDtypeStruct((1, 7), dt),       # anchor_rec
        jax.ShapeDtypeStruct((1, n), dt),       # z_drift
        jax.ShapeDtypeStruct((1, 7), dt),       # pose7_out
        jax.ShapeDtypeStruct((1, 7), dt),       # pnu
        jax.ShapeDtypeStruct((7, 6, 6), dt),    # ppsi
        jax.ShapeDtypeStruct((1, 3), dt),       # mnu
        jax.ShapeDtypeStruct((3, 3, 3), dt),    # mpsi
        jax.ShapeDtypeStruct((1, len(CERT_KEYS)), dt),
    )
    outs = pl.pallas_call(
        functools.partial(_kernel_body, cfg),
        out_shape=out_shapes,
        in_specs=[v] * 18,
        out_specs=tuple([v] * len(out_shapes)),
        interpret=interpret,
    )(L_pred, h_pred[None, :], anchor[None, :], mu_pred[None, :], L_io,
      h_io[None, :], z_lin[None, :], L_vis, h_vis_rel[None, :],
      dz_odom[None, :], pnu[None, :], ppsi, mnu[None, :], mpsi,
      dpsi_gyro, dpsi_accel, dpsi_lidar, scal)
    (L_fin, h_fin, anchor_fin, anchor_rec, z_drift, pose7_out,
     pnu_new, ppsi_new, mnu_new, mpsi_new, certs) = outs
    return (L_fin, h_fin[0], anchor_fin[0], anchor_rec[0], z_drift[0],
            pose7_out[0], pnu_new[0], ppsi_new, mnu_new[0], mpsi_new,
            certs[0])
