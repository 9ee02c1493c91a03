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

from fl_slam_tpu.config import (D_Z, GCConfig, GRAVITY_W, IDX_BA, IDX_DT,
                                IDX_EX, IDX_POSE, IDX_ROT, IDX_TRANS, IDX_VEL)
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
    "anchor.effect_predicted", "anchor.effect_realized",
    "visual.implied_dtrans_norm", "visual.implied_dz",
    "visual.implied_drot_norm",
    "hyp.floor_adjustment", "hyp.psd_projection", "hyp.spread_proxy",
    "hyp.ess",
    "iw_process.psd_projection", "iw_process.effect_predicted",
    "iw_process.effect_realized", "iw_meas.psd_projection",
    "hyp.effect_predicted", "hyp.effect_realized",
    "iw_meas.effect_predicted", "iw_meas.effect_realized",
)

# Packed-cert registry: the kernel cert VECTORS ride the per-scan certs dict
# under these keys (pipeline.replay splices them into the packed (T, C)
# output directly — re-slicing ~70 scalars per scan just for pack() to
# re-stack them cost ~40 us/scan of pure dispatch). replay's unpack expands
# them back to one dict entry per name below.
PACKED_CERT_GROUPS = {}  # filled after PE_CERT_KEYS is defined

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
    # One axis at a time with keepdims: a multi-axis (full) reduce crashes
    # Mosaic under the instance-vmap batch axis, and a bare two-step reduce
    # leaves a 1-D intermediate the UNBATCHED path cannot reduce (probed
    # both ways). keepdims keeps every reduce 2-D in both regimes.
    d = jnp.sum(A * _eye(A.shape[-1], A.dtype), axis=-2, keepdims=True)
    return jnp.sum(d, axis=-1, keepdims=True)[..., 0, 0]


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

    # anchor ExpectedEffect realized = |Log(anchor_rec^{-1} o anchor_fin)|
    # (previously outside the kernel "needs arctan2" — _quat_to_rotvec_s
    # covers it; each outside scalar-op chain costs ~2-10 us of per-op
    # issue overhead on this single-instruction-stream device).
    qb, qa = anchor_rec[3:7], anchor_fin[3:7]
    qb_c = jnp.stack([qb[0], -qb[1], -qb[2], -qb[3]])  # conj (capture-free)
    q_rel = se3.quat_normalize(se3.quat_mul(qb_c, qa))
    t_rel = se3.quat_rotate(qb_c, anchor_fin[0:3] - anchor_rec[0:3])
    w_rel = _quat_to_rotvec_s(q_rel)
    rho_rel = _mv(se3.so3_V_inv(w_rel), t_rel)
    eff_real = jnp.sqrt(jnp.sum(rho_rel * rho_rel) + jnp.sum(w_rel * w_rel))

    # Diagnostics: the pose correction the visual evidence ALONE would
    # apply at z_lin (pipeline parity; 6x6 lifted solve). The lift is
    # SCALE-AWARE: a fixed 1e-9 on a degenerate block underflows the f32
    # Cholesky (d = sqrt(1e-30) -> 1/d overflows -> NaN certs at the one
    # scan of the 5,000-scan fixture where the scatter went rank-0).
    Lp6 = L_vis[0:6, 0:6]
    rhs6 = h_vis_rel[0:6] + _mv(Lp6, z_lin[0:6])
    lift6 = 1e-9 + 1e-6 * _tr(Lp6) / 6.0
    A6 = _sym_lift(Lp6, lift6)
    dz_vis = _chol_solve(_chol(A6), rhs6[:, None]).T[0, :] - z_lin[0:6]
    vis_dt_norm = jnp.sqrt(jnp.sum(dz_vis[0:3] * dz_vis[0:3]))
    vis_dz = dz_vis[2]
    vis_dr_norm = jnp.sqrt(jnp.sum(dz_vis[3:6] * dz_vis[3:6]))

    # ---- mean/covariance threading: NEXT scan's lifted mean + Sigma ------
    # The next scan needs mu = (L_post + eps_lift I)^{-1} h_fin, the dt
    # marginal variance (window softness) and cov_prev for the OU predict —
    # ALL of which are Sigma_post (the 23-RHS solve above; anchor drift
    # leaves L unchanged): mu rides the identity
    # (L+e)^{-1} L z = z - e (L+e)^{-1} z, and threading Sigma through the
    # carry deletes kernel B's leading 22x22 factorization + D_Z-RHS solve
    # as well as the front-of-scan batched Cholesky custom calls.
    mu_next = z_drift - cfg.eps_lift * _mv(Sigma_post, z_drift)
    # Pose plumbing for the NEXT scan's front and this scan's map update:
    # the world pose the threaded mean encodes (+ its rotation matrix) and
    # the recompose anchor's rotation — previously rebuilt outside as scalar
    # quaternion chains (per-op issue stalls).
    pose_prev7_next = _pose7_plus(anchor_fin, mu_next[IDX_POSE])
    R_prev_next = se3.quat_to_R(pose_prev7_next[3:7])
    R_rec = se3.quat_to_R(anchor_rec[3:7])

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
    pose6_out = _pose6_from_pose7_s(pose7_out)


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
        # single-axis reduce chains (full 2-D reduces crash the batched
        # lowering; see _tr)
        iw_pred = iw_pred + _tr(blocks[i])
        iw_real = iw_real + _tr(psd - rho_i * ppsi[i])
    psi_psd = jnp.stack(psi_blocks)
    rho_q = jnp.stack([jnp.asarray(x, dt) for x in rhos_q])
    dims_q = jnp.stack([jnp.asarray(float(d), dt) for d in _IW_DIMS])
    nu_min_q = dims_q + 1.0 + cfg.iw_nu_weak_add
    pnu_new = _smooth_nu_clip(rho_q * pnu + dnu_q, nu_min_q, 1000.0)

    rhos_m = (cfg.iw_rho_meas_gyro, cfg.iw_rho_meas_accel,
              cfg.iw_rho_meas_lidar)
    eye3 = _eye(3, dt)
    mpsi_blocks = []
    iwm_pred = jnp.zeros((), dt)
    iwm_real = jnp.zeros((), dt)
    for i, (dm, rho_i) in enumerate(zip((dpsi_gyro, dpsi_accel, dpsi_lidar),
                                        rhos_m)):
        raw = rho_i * mpsi[i] + dm
        psd_m = 0.5 * (raw + raw.T) + cfg.eps_psd * eye3
        mpsi_blocks.append(psd_m)
        # ExpectedEffect: predicted = the suffstat feed's trace; realized =
        # the trace actually added to Psi after symmetrize + eps floor
        iwm_pred = iwm_pred + _tr(dm)
        iwm_real = iwm_real + _tr(psd_m - rho_i * mpsi[i])
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
        rho, drift_m, drift_r, rho * _norm(dpd), eff_real,
        vis_dt_norm, vis_dz, vis_dr_norm,
        floor_adjust, hyp_proj, spread, hyp_ess,
        jnp.zeros((), dt), iw_pred, iw_real, jnp.zeros((), dt),
        # ExpectedEffect tails: barycenter (K=1: identity information
        # average; realized includes the second eps_psd lift) and iw_meas
        _tr(L_post), _tr(L_bar),
        iwm_pred, iwm_real,
    ])
    return (L_post, h_fin, anchor_fin, anchor_rec, z_drift, pose6_out,
            pnu_new, psi_psd, mnu_new, mpsi_psd, certs, mu_next, Sigma_post,
            pose_prev7_next, R_prev_next, R_rec)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _full_spec(shape):
    """Whole-array VMEM block with an explicit i32 index map (vmap-safe)."""
    return pl.BlockSpec(shape, lambda: (jnp.int32(0),) * len(shape),
                        memory_space=pltpu.VMEM)


def _kernel_body(cfg: GCConfig,
                 L_pred_ref, h_pred_ref, anchor_ref, mu_pred_ref, L_io_ref,
                 h_io_ref, z_lin_ref, L_vis_ref, h_vis_ref, dz_odom_ref,
                 pnu_ref, ppsi_ref, mnu_ref, mpsi_ref, dg_ref, da_ref,
                 dl_ref, scal_ref,
                 L_out_ref, h_out_ref, anchor_fin_ref, anchor_rec_ref,
                 z_drift_ref, pose7_ref, pnu_out_ref, ppsi_out_ref,
                 mnu_out_ref, mpsi_out_ref, certs_ref, mu_out_ref,
                 sigma_out_ref, pprev_out_ref, rprev_out_ref, rrec_out_ref):
    out = _tail_math(cfg,
                     L_pred_ref[:], h_pred_ref[0, :], anchor_ref[0, :],
                     mu_pred_ref[0, :], L_io_ref[:], h_io_ref[0, :],
                     z_lin_ref[0, :], L_vis_ref[:], h_vis_ref[0, :],
                     dz_odom_ref[0, :], pnu_ref[0, :], ppsi_ref[:],
                     mnu_ref[0, :], mpsi_ref[:], dg_ref[:], da_ref[:],
                     dl_ref[:], scal_ref[0, :])
    (L_fin, h_fin, anchor_fin, anchor_rec, z_drift, pose6_out,
     pnu_new, ppsi_new, mnu_new, mpsi_new, certs, mu_next, Sigma_post,
     pose_prev7_next, R_prev_next, R_rec) = out
    L_out_ref[:] = L_fin
    h_out_ref[0, :] = h_fin
    anchor_fin_ref[0, :] = anchor_fin
    anchor_rec_ref[0, :] = anchor_rec
    z_drift_ref[0, :] = z_drift
    pose7_ref[0, :] = pose6_out
    pnu_out_ref[0, :] = pnu_new
    ppsi_out_ref[:] = ppsi_new
    mnu_out_ref[0, :] = mnu_new
    mpsi_out_ref[:] = mpsi_new
    certs_ref[0, :] = certs
    mu_out_ref[0, :] = mu_next
    sigma_out_ref[:] = Sigma_post
    pprev_out_ref[0, :] = pose_prev7_next
    rprev_out_ref[:] = R_prev_next
    rrec_out_ref[:] = R_rec


# ---------------------------------------------------------------------------
# Instance-batched dispatch (round-3 verdict item 1).
#
# jax.vmap's native pallas batching rule prepends a GRID dimension, so B
# instances execute the kernel B times grid-SEQUENTIALLY — measured: the two
# belief kernels cost 8x one instance at B=8 (585 us/step of the 6.4 ms
# batched step). The custom_vmap rules below instead lower ONE kernel whose
# body is jax.vmap(_tail_math / _pe_math): the 22-lane VPU work of all
# instances rides the sublane axis of single batched ops. Probe-verified on
# the v5e: batched (B, 22, 22) elementwise / axis-2 reduces / vmapped
# masked-Cholesky all lower natively (the one SIGABRT trap is captured
# jnp.eye-style array constants — every helper here builds constants from
# broadcasted_iota, which lowers fine).
# ---------------------------------------------------------------------------

def _squeeze_dummy(o):
    """(B, 1, k...) -> (B, k...): drop the Mosaic 2-D dummy row axis that
    single-instance operands carry (batched operands are naturally >=2-D)."""
    if o.ndim >= 3 and o.shape[1] == 1:
        return o.reshape((o.shape[0],) + o.shape[2:])
    return o


def _batched_pallas(cfg, interpret, math_fn, n_in, out_shapes, extra=None):
    """pallas_call whose body vmaps ``math_fn`` over the leading instance
    axis. ``out_shapes``: UNBATCHED output ShapeDtypeStructs; outputs are
    returned batched as (B,) + unbatched shape."""
    def call(*ops):
        B = ops[0].shape[0]
        sq = [_squeeze_dummy(o) for o in ops]

        def body(*refs):
            ins = [r[:] for r in refs[:n_in]]
            outs = jax.vmap(lambda *xs: math_fn(cfg, *xs))(*ins)
            if extra is not None:
                outs = extra(outs)
            for r, o in zip(refs[n_in:], outs):
                r[:] = o

        kernel_outs = tuple(
            jax.ShapeDtypeStruct(
                (B,) + tuple(s.shape[1:] if s.shape[0] == 1 else s.shape),
                s.dtype)
            for s in out_shapes)
        outs = pl.pallas_call(
            body,
            out_shape=kernel_outs,
            in_specs=[_full_spec(o.shape) for o in sq],
            out_specs=tuple(_full_spec(o.shape) for o in kernel_outs),
            interpret=interpret,
        )(*sq)
        # restore the unbatched dummy axes: (B, k...) -> (B, 1, k...)
        return tuple(
            o.reshape((o.shape[0],) + s.shape) for o, s in
            zip(outs, out_shapes))
    return call


_DISPATCH_CACHE: dict = {}


def _make_dispatch(cfg, interpret, out_shapes, math_fn, n_in, extra=None,
                   single=None):
    """custom_vmap wrapper: unbatched calls run ``single`` (the existing
    per-instance kernel); a vmapped (instance-axis) call lowers the ONE
    batched kernel above instead of grid-serializing."""
    @jax.custom_batching.custom_vmap
    def call(*operands):
        return single(*operands)

    @call.def_vmap
    def _rule(axis_size, in_batched, *operands):
        ops = [o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
               for o, b in zip(operands, in_batched)]
        outs = _batched_pallas(cfg, interpret, math_fn, n_in, out_shapes,
                               extra)(*ops)
        return outs, tuple(True for _ in outs)

    return call


def _tail_dispatch(cfg: GCConfig, interpret: bool, out_shapes):
    key = ("tail", cfg, interpret)
    if key not in _DISPATCH_CACHE:
        def single(*operands):
            return pl.pallas_call(
                functools.partial(_kernel_body, cfg),
                out_shape=out_shapes,
                # full-array blocks with explicit i32 index maps (an i64
                # index-map literal under x64 fails Mosaic legalization)
                in_specs=[_full_spec(op.shape) for op in operands],
                out_specs=tuple(_full_spec(o.shape) for o in out_shapes),
                interpret=interpret,
            )(*operands)
        _DISPATCH_CACHE[key] = _make_dispatch(
            cfg, interpret, out_shapes, _tail_math, 18, single=single)
    return _DISPATCH_CACHE[key]


def scalar_tail(cfg: GCConfig, L_pred, h_pred, anchor, mu_pred, L_io, h_io,
                z_lin, L_vis, h_vis_rel, dz_odom, pnu, ppsi, mnu, mpsi,
                dpsi_gyro, dpsi_accel, dpsi_lidar, ess_pre, ot_ess, ot_cost,
                grav_proj, cond_p6, *, interpret: bool | None = None):
    """Run the scalar tail as ONE kernel. All inputs are the K=1 slices.

    Returns (L_fin, h_fin, anchor_fin, anchor_rec, z_drift, pose6_out,
    pnu', ppsi', mnu', mpsi', certs_vec[len(CERT_KEYS)], mu_next,
    Sigma_post) — (L_fin, h_fin, anchor_fin) is the post-drift state belief
    (K axis stripped); mu_next/Sigma_post are the NEXT scan's lifted mean
    and (L + eps_lift I)^{-1} (mean/covariance threading — ride the
    kernel's existing factorization, replacing the front-of-scan batched
    solves AND kernel B's leading inverse).
    """
    dt = L_pred.dtype
    n = D_Z
    if interpret is None:
        interpret = FORCE_INTERPRET and jax.default_backend() != "tpu"
    scal = jnp.stack([ess_pre, ot_ess, ot_cost, grav_proj,
                      cond_p6]).astype(dt)[None, :]
    out_shapes = (
        jax.ShapeDtypeStruct((n, n), dt),       # L_bar
        jax.ShapeDtypeStruct((1, n), dt),       # h_bar
        jax.ShapeDtypeStruct((1, 7), dt),       # anchor_fin
        jax.ShapeDtypeStruct((1, 7), dt),       # anchor_rec
        jax.ShapeDtypeStruct((1, n), dt),       # z_drift
        jax.ShapeDtypeStruct((1, 6), dt),       # pose6_out (published pose)
        jax.ShapeDtypeStruct((1, 7), dt),       # pnu
        jax.ShapeDtypeStruct((7, 6, 6), dt),    # ppsi
        jax.ShapeDtypeStruct((1, 3), dt),       # mnu
        jax.ShapeDtypeStruct((3, 3, 3), dt),    # mpsi
        jax.ShapeDtypeStruct((1, len(CERT_KEYS)), dt),
        jax.ShapeDtypeStruct((1, n), dt),       # mu_next (mean threading)
        jax.ShapeDtypeStruct((n, n), dt),       # Sigma_post (cov threading)
        jax.ShapeDtypeStruct((1, 7), dt),       # pose_prev7 for next scan
        jax.ShapeDtypeStruct((3, 3), dt),       # R(pose_prev7)
        jax.ShapeDtypeStruct((3, 3), dt),       # R(anchor_rec) for map update
    )
    operands = (L_pred, h_pred[None, :], anchor[None, :], mu_pred[None, :],
                L_io, h_io[None, :], z_lin[None, :], L_vis,
                h_vis_rel[None, :], dz_odom[None, :], pnu[None, :], ppsi,
                mnu[None, :], mpsi, dpsi_gyro, dpsi_accel, dpsi_lidar, scal)
    outs = _tail_dispatch(cfg, bool(interpret), out_shapes)(*operands)
    (L_fin, h_fin, anchor_fin, anchor_rec, z_drift, pose6_out,
     pnu_new, ppsi_new, mnu_new, mpsi_new, certs, mu_next, Sigma_post,
     pose_prev7_next, R_prev_next, R_rec) = outs
    return (L_fin, h_fin[0], anchor_fin[0], anchor_rec[0], z_drift[0],
            pose6_out[0], pnu_new[0], ppsi_new, mnu_new[0], mpsi_new,
            certs[0], mu_next[0], Sigma_post, pose_prev7_next[0],
            R_prev_next, R_rec)


# ===========================================================================
# Kernel B: predict + IMU/odom evidence (steps 2+6), K=1.
#
# The remaining tiny-op tail after the scalar-tail kernel lived in
# predict_and_evidence (~500 HLOs/scan of SE(3)/small-block algebra). Same
# treatment: the big-array reductions (preintegration, windows, deskew, the
# gravity resultant and accel moments over the 512-sample IMU window) stay
# OUTSIDE as productive XLA ops; everything per-pose/per-block runs in one
# kernel. Parity mirrors, step for step: ops/predict.py:predict_diffusion,
# ops/odom.py (all four factors), ops/imu.py (gravity Laplace part,
# gyro_rotation_evidence, preintegration_factor, accel_bias_evidence,
# accel_iw_suffstats), ops/priors.py, and the assembly in
# pipeline._scan_core.predict_and_evidence.
#
# Extra Mosaic constraints found for this kernel (probed):
#   - atan/atan2/arccos have NO lowering -> _atanf (cephes single-precision
#     polynomial + range reduction, ~1 ulp), _atan2p, _acos;
#   - so3_log/quat_to_rotvec/pose6_from_pose7 rebuilt on those (_so3_log_s,
#     _quat_to_rotvec_s — same quaternion/Shepperd route as core/se3.py);
#   - the n<=8 unrolled scalar Cholesky of core/linalg crashes the layout
#     pass -> closed-form adjugate 3x3 inverse (_inv3) and the vector _chol
#     for 6x6/22x22;
#   - jnp.median/sort (gravity reliability weights) have no lowering ->
#     that reduction stays outside (imu.gravity_resultant).
# ===========================================================================

PE_CERT_KEYS = (
    "predict.psd_projection", "predict.lift", "predict.cond",
    "predict.cov_trace", "predict.dt", "predict.motion_norm",
    "predict.effect_predicted", "predict.effect_realized",
    "odom_pose.nll_proxy", "odom_pose.residual_norm", "odom_pose.lift",
    "odom_pose.psd_projection",
    "imu_grav.kappa", "imu_grav.psd_projection", "imu_grav.nll_proxy",
    "imu_grav.kappa_clamp", "imu_grav.dependence_scale",
    "imu_gyro.nll_proxy", "imu_gyro.residual_norm",
    "imu_gyro.psd_projection", "imu_gyro.lift", "imu_gyro.mass_scale",
    "imu_preint.nll_proxy", "imu_preint.lift", "imu_preint.psd_projection",
    "imu_preint.r_vel_norm", "imu_preint.r_pos_norm",
    "imu_ba.residual_norm", "imu_ba.nll_proxy",
    "planar_z.nll_proxy", "planar_vz.nll_proxy",
    "odom_vel.nll_proxy", "odom_vel.lift", "odom_vel.psd_projection",
    "odom_wz.nll_proxy", "odom_wz.residual",
    "odom_kin.nll_proxy", "odom_kin.lift", "odom_kin.psd_projection",
    "odom.dependence_scale",
    # ExpectedEffect pairs (appended tail; order must match _pe_math c_eff)
    "odom_pose.effect_predicted", "odom_pose.effect_realized",
    "imu_grav.effect_predicted", "imu_grav.effect_realized",
    "imu_gyro.effect_predicted", "imu_gyro.effect_realized",
    "imu_preint.effect_predicted", "imu_preint.effect_realized",
    "imu_ba.effect_predicted", "imu_ba.effect_realized",
    "planar.effect_predicted", "planar.effect_realized",
    "odom_vel.effect_predicted", "odom_vel.effect_realized",
    "odom_wz.effect_predicted", "odom_wz.effect_realized",
    "odom_kin.effect_predicted", "odom_kin.effect_realized",
)

# packed small-input vector layout (see predict_evidence)
_PK = dict(dt_sec=0, pre_ess=1, dt_int=2, dt_imu=3, grav_rbar=4,
           transport_sigma=5, pose_prev=slice(6, 12),
           motion_rot=slice(12, 15), motion_p=slice(15, 18),
           motion_v=slice(18, 21), omega_avg=slice(21, 24),
           a_body_mean=slice(24, 27), odom_vel=slice(27, 30),
           odom_omega=slice(30, 33), odom_pose=slice(33, 39),
           grav_xbar=slice(39, 42), acc_m1=slice(42, 45), acc_sw=45,
           odom_rel=slice(46, 52), first_scan=52)
_PK_LEN = 52


def _atanf(x):
    """Branchless cephes atanf (range-reduced 4-term odd polynomial,
    ~1 ulp in f32)."""
    dt = x.dtype
    sign = jnp.where(x < 0, jnp.asarray(-1.0, dt), jnp.asarray(1.0, dt))
    x = jnp.abs(x)
    big = x > 2.414213562373095            # tan(3 pi / 8)
    mid = (x > 0.4142135623730950) & (~big)  # tan(pi / 8)
    xb = -1.0 / jnp.maximum(x, jnp.asarray(1e-30, dt))
    xm = (x - 1.0) / (x + 1.0)
    z = jnp.where(big, xb, jnp.where(mid, xm, x))
    zz = z * z
    y = ((((8.05374449538e-2 * zz - 1.38776856032e-1) * zz
           + 1.99777106478e-1) * zz - 3.33329491539e-1) * zz * z + z)
    y = y + jnp.where(big, jnp.asarray(jnp.pi / 2, dt),
                      jnp.where(mid, jnp.asarray(jnp.pi / 4, dt),
                                jnp.asarray(0.0, dt)))
    return sign * y


def _atan2p(y, x):
    """atan2 restricted to the upper half plane (y >= 0) -> [0, pi]."""
    a = _atanf(y / jnp.maximum(jnp.abs(x), jnp.asarray(1e-30, y.dtype)))
    return jnp.where(x >= 0, a, jnp.asarray(jnp.pi, y.dtype) - a)


def _acos(r):
    one = jnp.ones_like(r)
    r = jnp.clip(r, -one, one)
    return _atan2p(jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0)), r)


def _quat_to_rotvec_s(q):
    """(4,) [w,x,y,z] -> (3,) rotvec; parity: se3.quat_to_rotvec with the
    atan2 replaced by _atan2p (w >= 0 after the sign flip)."""
    d = q.dtype
    q = q * jnp.where(q[0] < 0.0, jnp.asarray(-1.0, d), jnp.asarray(1.0, d))
    w, v = q[0], q[1:4]
    vn = jnp.sqrt(jnp.sum(v * v))
    theta = 2.0 * _atan2p(vn, w)
    small = vn < jnp.asarray(1e-6, d)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, jnp.asarray(1e-12, d)),
                      theta / jnp.where(small, jnp.asarray(1.0, d), vn))
    return scale * v


def _quat_from_R_s(R):
    """Branchless Shepperd extraction (largest-pivot candidate selected by
    nested wheres; each candidate is 4 q_pivot [qw qx qy qz] so the final
    normalize recovers the unit quaternion up to sign)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    qw2 = jnp.maximum(1.0 + m00 + m11 + m22, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01])
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20])
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21])
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2])
    pw = (qw2 >= qx2) & (qw2 >= qy2) & (qw2 >= qz2)
    px = (qx2 >= qy2) & (qx2 >= qz2)
    py = qy2 >= qz2
    q = jnp.where(pw, cw, jnp.where(px, cx, jnp.where(py, cy, cz)))
    return q / jnp.sqrt(jnp.maximum(jnp.sum(q * q), 1e-30))


def _so3_log_s(R):
    return _quat_to_rotvec_s(_quat_from_R_s(R))


def _pose6_from_pose7_s(p7):
    return jnp.concatenate([p7[0:3], _quat_to_rotvec_s(p7[3:7])])


def _mm3(A, B):
    """3x3 @ 3x3 via masked reduction (small dot_generals chained with
    reductions crash Mosaic; see _pe_math notes)."""
    return jnp.sum(A[:, :, None] * B[None, :, :], axis=1)


def _se3_exp_s(xi):
    """parity: se3.se3_exp with the V-matvec as _mv."""
    rho, omega = xi[0:3], xi[3:6]
    return jnp.concatenate([_mv(se3.so3_V(omega), rho), omega])


def _se3_log6_s(pose):
    """parity: se3.se3_log with the V_inv-matvec as _mv."""
    t, w = pose[0:3], pose[3:6]
    return jnp.concatenate([_mv(se3.so3_V_inv(w), t), w])


def _se3_inverse_s(pose):
    R = se3.so3_exp(pose[3:6])
    return jnp.concatenate([-_mv(R.T, pose[0:3]), -pose[3:6]])


def _se3_compose_s(a, b):
    return _pose6_from_pose7_s(se3.pose7_compose(se3.pose7_from_pose6(a),
                                                 se3.pose7_from_pose6(b)))


def _se3_rel_log_s(a, b):
    """se3_log(se3_relative(a, b)) — parity: ops/odom.py:24."""
    return _se3_log6_s(_se3_compose_s(_se3_inverse_s(a), b))


def _inv3(S, eps_psd, eps_lift):
    """SPD 3x3 inverse with the psd_guard + lift semantics of the XLA path
    (sym + eps_psd, then +eps_lift), via the closed-form adjugate (the
    unrolled scalar Cholesky crashes the Mosaic layout pass)."""
    dt = S.dtype
    S = 0.5 * (S + S.T) + jnp.asarray(eps_psd + eps_lift, dt) * _eye(3, dt)
    a, b, c = S[0, 0], S[0, 1], S[0, 2]
    d, e, f = S[1, 1], S[1, 2], S[2, 2]
    A00 = d * f - e * e
    A01 = c * e - b * f
    A02 = b * e - c * d
    A11 = a * f - c * c
    A12 = b * c - a * e
    A22 = a * d - b * b
    det = a * A00 + b * A01 + c * A02
    inv = jnp.stack([jnp.stack([A00, A01, A02]),
                     jnp.stack([A01, A11, A12]),
                     jnp.stack([A02, A12, A22])]) / det
    return 0.5 * (inv + inv.T)


def _eigmin3(A):
    """Smallest eigenvalue of symmetric 3x3 (Smith 1961, with _acos);
    parity: core/linalg.eigvalsh3x3 restricted to lambda_min."""
    dt = A.dtype
    s_2d = jnp.max(jnp.abs(A), axis=-2, keepdims=True)        # (..., 1, 3)
    s = jnp.maximum(jnp.max(s_2d, axis=-1, keepdims=True)[..., 0, 0],
                    jnp.asarray(1e-30, dt))
    A = A / s
    a00, a11, a22 = A[0, 0], A[1, 1], A[2, 2]
    a01, a02, a12 = A[0, 1], A[0, 2], A[1, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-38))
    c00 = b11 * b22 - a12 * a12
    c01 = a01 * b22 - a12 * a02
    c02 = a01 * a12 - b11 * a02
    detB = b00 * c00 - a01 * c01 + a02 * c02
    one1 = jnp.ones_like(detB)
    r = jnp.clip(detB / (2.0 * p * p * p), -one1, one1)
    phi = _acos(r) / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam0 = jnp.where(p2 < 1e-30, q, lam0)
    return lam0 * s


def _project_psd3_s(A, eps):
    """parity: core/linalg.project_psd3 (diagonal lift by max(0,-lam_min)+eps)."""
    A = 0.5 * (A + A.T)
    lift = jnp.maximum(0.0, -_eigmin3(A)) + eps
    return A + lift * _eye(3, A.dtype), lift


def _emb_block(s0, d, Lb, hb, dt):
    """(L22, h22) with one diagonal block installed (pad-based; parity:
    ops/embed.evidence_from_block — .at[].set lowers to scatter in Mosaic)."""
    L = jnp.pad(Lb, ((s0, D_Z - s0 - d), (s0, D_Z - s0 - d)))
    h = jnp.pad(hb, (s0, D_Z - s0 - d))
    return L, h


def _emb_scalar(idx, precision, residual, dt):
    e = _onehot(D_Z, idx, dt)
    return precision * _outer(e, e), (precision * residual) * e


def _vdot(a, b):
    return jnp.sum(a * b)


def _pe_math(cfg: GCConfig, L_prev, h_prev, anchor, mu_prev, sigma_prev,
             R_prev_in, Q, sigma_g, sigma_a, odom_cov, acc_M2, pk):
    """K=1 predict + evidence. ``pk`` is the packed small-input vector
    (layout ``_PK``). Returns (L_pred, h_pred, mu_pred, L_io, h_io, z_lin,
    xi_odom, z_lin_pose7, dpsi_accel, certs[len(PE_CERT_KEYS)])."""
    dt = L_prev.dtype
    g = lambda k: pk[_PK[k]]
    dt_sec = g("dt_sec")
    pose_prev = g("pose_prev")
    motion_rot, motion_p, motion_v = g("motion_rot"), g("motion_p"), g("motion_v")
    # scalar-stack (NOT a (3,1)-iota onehot: that yields a SUBLANE-oriented
    # 3-vector whose relayout against lane vectors crashes Mosaic)
    zero = jnp.asarray(0.0, dt)
    gravity_w = jnp.stack([zero, zero, jnp.asarray(
        cfg.imu_gravity_scale * GRAVITY_W[2], dt)])

    # ---- step 2: mechanized OU predict (ops/predict.py parity) -----------
    # cov_prev = (L_prev + eps_lift I)^{-1} is THREADED through the scan
    # carry (the previous tail's Sigma_post; anchor drift leaves L
    # unchanged) — kernel B's leading factorization + D_Z-RHS solve gone.
    cov_prev = 0.5 * (sigma_prev + sigma_prev.T)
    R_anchor = se3.quat_to_R(anchor[3:7])
    pose_inc = mu_prev[IDX_POSE]
    vel_w = mu_prev[IDX_VEL]
    R_s = _mm3(R_anchor, se3.so3_exp(pose_inc[3:6]))
    trans_body = _mv(R_s.T, vel_w) * dt_sec + motion_p
    xi_rel = jnp.concatenate([trans_body, motion_rot])
    pose_inc_new = _se3_log6_s(_se3_compose_s(_se3_exp_s(pose_inc),
                                               _se3_exp_s(xi_rel)))
    vel_new = vel_w + _mv(R_s, motion_v)
    mean_pred = jnp.concatenate([pose_inc_new, vel_new, mu_prev[9:]])

    # F = I with F[trans, vel] = dt R_anchor^T (ops/predict.py:86-88)
    F = (_eye(D_Z, dt)
         + jnp.pad(dt_sec * R_anchor.T,
                   ((IDX_TRANS.start, D_Z - 3), (IDX_VEL.start, D_Z - 9))))
    cov_prop = F @ cov_prev @ F.T
    exp_factor = jnp.exp(-2.0 * cfg.ou_lambda * dt_sec)
    diff_coeff = (1.0 - exp_factor) / (2.0 * cfg.ou_lambda + 1e-300)
    cov_pred = exp_factor * cov_prop + diff_coeff * Q
    cov_pred_psd = _sym_lift(cov_pred, cfg.eps_psd)
    A_cov = _sym_lift(cov_pred_psd, cfg.eps_lift)
    Lc1 = _chol(A_cov)
    L_pred = _chol_solve(Lc1, _eye(D_Z, dt))
    L_pred = _sym_lift(0.5 * (L_pred + L_pred.T), cfg.eps_psd)
    h_pred = _mv(L_pred, mean_pred)

    # parity: core/linalg.cond_proxy. 2-D keepdims reductions: max/min of a
    # 1-D vector crash the Mosaic layout pass the same way 1-D sums do.
    d2 = jnp.sum(L_pred * _eye(D_Z, dt), axis=0, keepdims=True)   # (1, 22)
    dmax = jnp.max(d2, axis=1, keepdims=True)[0, 0]
    dmin = jnp.min(d2, axis=1, keepdims=True)[0, 0]
    cond = (dmax + 1e-12) / (jnp.maximum(dmin, 0.0) + 1e-12)
    eps_l = jnp.asarray(cfg.eps_lift, dt)
    c_predict = (jnp.zeros((), dt), eps_l + eps_l, cond, _tr(cov_pred_psd),
                 dt_sec, _norm(mean_pred - mu_prev),
                 _norm(xi_rel) + _norm(motion_v), _norm(mean_pred - mu_prev))


    pose_pred7 = _pose7_plus(anchor, mean_pred[IDX_POSE])
    pose_pred = _pose6_from_pose7_s(pose_pred7)
    vel_pred = mean_pred[IDX_VEL]

    L_io = jnp.zeros((D_Z, D_Z), dt)
    h_io = jnp.zeros((D_Z,), dt)

    # ---- odom quadratic pose factor (ops/odom.py:14) ---------------------
    if cfg.odom_pose_relative:
        # relative target from the previous ESTIMATE (trans pose_prev[0:3],
        # rotation R_prev_in) composed with the odom increment; first scan
        # falls back to the absolute pose (see GCConfig.odom_pose_relative)
        d_od = g("odom_rel")
        # d_od is an se(3) LOG (se3_minus): its translation part is
        # rho = V(omega)^{-1} t_rel, so composing pose_prev ∘ Exp(d_od)
        # needs V(omega) applied — matching se3_plus on the XLA path.
        # Skipping V was a first-order-in-omega systematic bias (~0.8 mm
        # per scan at 0.04 m / 0.05 rad increments; advisor round-3 #1).
        t_rel = _mv(se3.so3_V(d_od[3:6]), d_od[0:3])
        t_tgt = pose_prev[0:3] + _mv(R_prev_in, t_rel)
        R_tgt = _mm3(R_prev_in, se3.so3_exp(d_od[3:6]))
        tgt6 = jnp.concatenate([t_tgt, _so3_log_s(R_tgt)])
        first = g("first_scan")
        odom_tgt = jnp.where(first > 0.5, g("odom_pose"), tgt6)
    else:
        odom_tgt = g("odom_pose")
    xi_odom = _se3_rel_log_s(pose_pred, odom_tgt)
    cov6 = 0.5 * (odom_cov + odom_cov.T) + cfg.eps_psd * _eye(6, dt)
    Lc6 = _chol(_sym_lift(cov6, cfg.eps_lift))
    L_pose6 = _chol_solve(Lc6, _eye(6, dt))
    L_pose6 = 0.5 * (L_pose6 + L_pose6.T)

    def _rot_scaled(L6):
        # rotation-block information scale (see GCConfig.odom_pose_rot_scale;
        # mirror of ops/odom.quadratic_pose_evidence rot_scale)
        sr = jnp.asarray(float(cfg.odom_pose_rot_scale) ** 0.5, dt)
        one = jnp.asarray(1.0, dt)
        dvec = jnp.concatenate([jnp.stack([one, one, one]),
                                jnp.stack([sr, sr, sr])])
        return dvec[:, None] * L6 * dvec[None, :]

    if cfg.odom_pose_relative:
        # blend: (1-mix) relative (full cov) + mix absolute (rot-scaled) —
        # mirror of the XLA path in pipeline.predict_and_evidence
        mix = jnp.asarray(cfg.odom_pose_mix, dt)
        xi_abs = _se3_rel_log_s(pose_pred, g("odom_pose"))
        L_abs = _rot_scaled(L_pose6)
        Lmix = (1.0 - mix) * L_pose6 + mix * L_abs
        hmix = ((1.0 - mix) * _mv(L_pose6, xi_odom)
                + mix * _mv(L_abs, xi_abs))
        L1, h1 = _emb_block(0, 6, Lmix, hmix, dt)
    else:
        if cfg.odom_pose_rot_scale != 1.0:
            L_pose6 = _rot_scaled(L_pose6)
        L1, h1 = _emb_block(0, 6, L_pose6, _mv(L_pose6, xi_odom), dt)
    L_io = L_io + cfg.odom_pose_weight * L1
    h_io = h_io + cfg.odom_pose_weight * h1
    c_odom_pose = (0.5 * _vdot(xi_odom, _mv(L_pose6, xi_odom)),
                   _norm(xi_odom), eps_l, jnp.zeros((), dt))


    # ---- gravity vMF evidence, Laplace part (ops/imu.py:223) -------------
    R0p = se3.so3_exp(pose_pred[3:6])
    g_hat = gravity_w / (_norm(gravity_w) + cfg.eps_mass)
    mu0 = _mv(R0p.T, -g_hat)
    xbar = g("grav_xbar")
    rbar = g("grav_rbar")
    kappa, kappa_clamp = _kappa_from_resultant_s(
        rbar, cfg.eps_r, cfg.kappa_blend_r0, cfg.kappa_blend_tau, dt)
    x_dot_mu = _vdot(xbar, mu0)
    g_rot = -kappa * _cross3(mu0, xbar)
    H = kappa * (x_dot_mu * _eye(3, dt)
                 - 0.5 * (_outer(xbar, mu0) + _outer(mu0, xbar)))
    H_psd, grav_proj = _project_psd3_s(0.5 * (H + H.T), cfg.eps_psd)
    # h = +g_rot (the log-likelihood gradient; see ops/imu.py — the
    # reference's -g_rot anti-aligns and destabilizes tilt)
    Lg, hg = _emb_block(IDX_ROT.start, 3, H_psd, g_rot, dt)
    ts = g("transport_sigma")
    s_dep = 1.0 / (1.0 + jnp.maximum(ts, 0.0) ** 2 + cfg.eps_mass)
    L_io = L_io + s_dep * Lg
    h_io = h_io + s_dep * hg
    c_grav = (kappa, grav_proj, -kappa * x_dot_mu, kappa_clamp, s_dep)


    # ---- gyro rotation evidence (ops/imu.py:311) --------------------------
    dt_int = g("dt_int")
    dt_pos = jnp.maximum(dt_int, 0.0)
    dt_eff = dt_pos + cfg.eps_mass
    mass_scale = dt_pos / dt_eff
    R_start = R_prev_in   # threaded (tail's quat_to_R)
    R_end_imu = _mm3(R_start, se3.so3_exp(motion_rot))
    R_end_pred = se3.so3_exp(pose_pred[3:6])
    r_rot_g = _so3_log_s(_mm3(R_end_pred.T, R_end_imu))
    L_rot3 = mass_scale * _inv3(sigma_g * dt_eff, cfg.eps_psd, cfg.eps_lift)
    L2, h2 = _emb_block(IDX_ROT.start, 3, L_rot3, _mv(L_rot3, r_rot_g), dt)
    w_imu_f = cfg.imu_factor_weight
    L_io = L_io + w_imu_f * L2
    h_io = h_io + w_imu_f * h2
    c_gyro = (0.5 * _vdot(r_rot_g, _mv(L_rot3, r_rot_g)), _norm(r_rot_g),
              jnp.zeros((), dt), eps_l, mass_scale)


    # ---- preintegration velocity/position factor (ops/imu.py:345) --------
    v_imu = vel_pred + _mv(R_start, motion_v)
    p_imu = pose_prev[0:3] + vel_pred * dt_int + _mv(R_start, motion_p)
    r_vel = v_imu - vel_pred
    r_pos = p_imu - pose_pred[0:3]
    sigma_ba_pre = 0.1  # preintegration_factor default
    Sv = sigma_a * dt_eff + (sigma_ba_pre * dt_eff) ** 2 * _eye(3, dt)
    Sp = (sigma_a * dt_eff ** 3
          + (0.5 * sigma_ba_pre * dt_eff ** 2) ** 2 * _eye(3, dt))
    L_v3 = mass_scale * _inv3(Sv, cfg.eps_psd, cfg.eps_lift)
    L_p3 = mass_scale * _inv3(Sp, cfg.eps_psd, cfg.eps_lift)
    L3a, h3a = _emb_block(IDX_TRANS.start, 3, L_p3, _mv(L_p3, r_pos), dt)
    L3b, h3b = _emb_block(IDX_VEL.start, 3, L_v3, _mv(L_v3, r_vel), dt)
    L_io = L_io + w_imu_f * (L3a + L3b)
    h_io = h_io + w_imu_f * (h3a + h3b)
    c_preint = (0.5 * (_vdot(r_vel, _mv(L_v3, r_vel))
                       + _vdot(r_pos, _mv(L_p3, r_pos))),
                eps_l + eps_l, jnp.zeros((), dt), _norm(r_vel), _norm(r_pos))


    # ---- accel bias evidence (ops/imu.py:276) ------------------------------
    # Anisotropic precision: full along the gravity direction mu0 (the
    # tilt-invariant |a|-g observation), cfg.ba_perp_scale perpendicular
    # (tilt-ambiguous; full precision closes the yaw-spin tilt-precession
    # loop — see ops/imu.accel_bias_evidence).
    a_body_exp = _cross3(g("odom_omega"), g("odom_vel"))
    r_ba = g("a_body_mean") - (-(_mv(R0p.T, gravity_w))) - a_body_exp
    prec_ba = 1.0 / (cfg.accel_bias_sigma * cfg.accel_bias_sigma)
    gnorm_ba = _norm(gravity_w) + 1e-12
    mu0_ba = -(_mv(R0p.T, gravity_w)) / gnorm_ba
    P_par_ba = _outer(mu0_ba, mu0_ba)
    L3_ba = prec_ba * (P_par_ba
                       + cfg.ba_perp_scale * (_eye(3, dt) - P_par_ba))
    L3_ba = 0.5 * (L3_ba + L3_ba.T)
    Lb, hb = _emb_block(IDX_BA.start, 3, L3_ba, _mv(L3_ba, r_ba), dt)
    L_io = L_io + Lb
    h_io = h_io + hb
    c_ba = (_norm(r_ba), 0.5 * _vdot(r_ba, _mv(L3_ba, r_ba)))

    # ---- planar priors (ops/priors.py) -------------------------------------
    prec_z = 1.0 / (cfg.planar_z_sigma * cfg.planar_z_sigma)
    r_z = cfg.planar_z_ref - pose_pred[2]
    L4, h4 = _emb_scalar(IDX_TRANS.start + 2, prec_z, r_z, dt)
    prec_vz = 1.0 / (cfg.planar_vz_sigma * cfg.planar_vz_sigma)
    r_vz = -vel_pred[2]
    L5, h5 = _emb_scalar(IDX_VEL.start + 2, prec_vz, r_vz, dt)
    L_io = L_io + cfg.planar_weight * (L4 + L5)
    h_io = h_io + cfg.planar_weight * (h4 + h5)
    c_planar = (0.5 * r_z * r_z * prec_z, 0.5 * r_vz * r_vz * prec_vz)


    # ---- odom twist factors (ops/odom.py:39-101) ---------------------------
    Rp = R_end_pred
    r_vel_o = g("odom_vel") - _mv(Rp.T, vel_pred)
    sig_v = cfg.odom_twist_vel_sigma ** 2 * _eye(3, dt)
    L3v = _inv3(sig_v, cfg.eps_psd, cfg.eps_lift)
    L_w = _mm3(_mm3(Rp, L3v), Rp.T)
    L6, h6 = _emb_block(IDX_VEL.start, 3, L_w, _mv(L_w, _mv(Rp, r_vel_o)), dt)
    c_vel = (0.5 * _vdot(r_vel_o, _mv(L3v, r_vel_o)), eps_l,
             jnp.zeros((), dt))

    r_wz = g("odom_omega")[2] - g("omega_avg")[2]
    prec_wz = 1.0 / (cfg.odom_twist_wz_sigma * cfg.odom_twist_wz_sigma)
    L7, h7 = _emb_scalar(IDX_ROT.start + 2, prec_wz, r_wz, dt)
    c_wz = (0.5 * r_wz * r_wz * prec_wz, r_wz)

    R_prev_k = R_prev_in
    R_curr_k = se3.so3_exp(pose_pred[3:6])
    r_trans_k = (_mv(R_prev_k, g("odom_vel")) * dt_sec
                 - (pose_pred[0:3] - pose_prev[0:3]))
    r_rot_k = (g("odom_omega") * dt_sec
               - _so3_log_s(_mm3(R_prev_k.T, R_curr_k)))
    dt2 = dt_sec * dt_sec + cfg.eps_psd
    sig_w = cfg.odom_twist_wz_sigma ** 2 * _eye(3, dt)
    Lt3 = _inv3(dt2 * sig_v, cfg.eps_psd, cfg.eps_lift)
    Lr3 = _inv3(dt2 * sig_w, cfg.eps_psd, cfg.eps_lift)
    L8a, h8a = _emb_block(IDX_TRANS.start, 3, Lt3, _mv(Lt3, r_trans_k), dt)
    L8b, h8b = _emb_block(IDX_ROT.start, 3, Lr3, _mv(Lr3, r_rot_k), dt)
    c_kin = (0.5 * (_vdot(r_trans_k, _mv(Lt3, r_trans_k))
                    + _vdot(r_rot_k, _mv(Lr3, r_rot_k))),
             eps_l + eps_l, jnp.zeros((), dt))

    mag = _norm(r_trans_k) + _norm(r_rot_k)
    s_odom = (1.0 / (1.0 + mag * mag + cfg.eps_mass)) * cfg.odom_twist_weight
    w_kin = cfg.odom_kinematic_weight
    L_io = L_io + s_odom * (L6 + L7 + w_kin * (L8a + L8b))
    h_io = h_io + s_odom * (h6 + h7 + w_kin * (h8a + h8b))


    # absolute chart target + linearization point (pipeline parity)
    h_io = h_io + _mv(L_io, mean_pred)
    A_z = _sym_lift(L_pred + L_io, cfg.eps_lift)
    Lcz = _chol(A_z)
    z_lin = _chol_solve(Lcz, (h_pred + h_io)[:, None]).T[0, :]
    z_lin_pose7 = _pose7_plus(anchor, z_lin[IDX_POSE])


    # accel-noise IW suffstats at the predicted rotation (ops/imu.py:418)
    f_pred = -(_mv(R0p.T, gravity_w))
    m1 = g("acc_m1")
    # rrT = sum_m w_m (x_m - f)(x_m - f)^T assembled from the
    # pose-independent moments (M2, m1, sw) computed outside the kernel;
    # algebraically identical to ops/imu.accel_iw_suffstats.
    rrT = (acc_M2 - _outer(f_pred, m1) - _outer(m1, f_pred)
           + g("acc_sw") * _outer(f_pred, f_pred))
    rrT = 0.5 * (rrT + rrT.T) + cfg.eps_psd * _eye(3, dt)
    dpsi_accel = rrT * jnp.maximum(g("dt_imu"), 1e-12)

    # ExpectedEffect pairs per factor (predicted = nominal NLL at unit
    # weight; realized = after the applied continuous scalings) — mirrors
    # the XLA path's _pair() block in pipeline.predict_and_evidence; order
    # must match the PE_CERT_KEYS tail.
    w_odom_p = jnp.asarray(cfg.odom_pose_weight, dt)
    w_planar = jnp.asarray(cfg.planar_weight, dt)
    nll_pose = c_odom_pose[0]
    nll_grav = c_grav[2]
    nll_gyro = c_gyro[0]
    nll_pre = c_preint[0]
    nll_ba = c_ba[1]
    nll_plan = c_planar[0] + c_planar[1]
    nll_vel = c_vel[0]
    nll_wz = c_wz[0]
    nll_kin = c_kin[0]
    c_eff = (nll_pose, w_odom_p * nll_pose,
             nll_grav, s_dep * nll_grav,
             nll_gyro, w_imu_f * nll_gyro,
             nll_pre, w_imu_f * nll_pre,
             nll_ba, nll_ba,
             nll_plan, w_planar * nll_plan,
             nll_vel, s_odom * nll_vel,
             nll_wz, s_odom * nll_wz,
             nll_kin, s_odom * w_kin * nll_kin)

    certs = jnp.stack(list(c_predict) + list(c_odom_pose) + list(c_grav)
                      + list(c_gyro) + list(c_preint) + list(c_ba)
                      + list(c_planar) + list(c_vel) + list(c_wz)
                      + list(c_kin) + [s_odom] + list(c_eff))
    return (L_pred, h_pred, mean_pred, L_io, h_io, z_lin, xi_odom,
            z_lin_pose7, dpsi_accel, certs)


def _kappa_from_resultant_s(R_bar, eps_r, r0, tau, dt):
    """parity: core/vmf.kappa_from_resultant (d=3)."""
    R = jnp.clip(R_bar, jnp.zeros_like(R_bar),
                 jnp.asarray(1.0 - eps_r, dt) * jnp.ones_like(R_bar))
    clamp_delta = jnp.abs(R_bar - R)
    R2 = R * R
    # low-branch pole capped at the blend boundary (core/vmf note)
    R_lo = jnp.minimum(R, jnp.asarray(float(r0) + 5.0 * float(tau), dt))
    R2_lo = R_lo * R_lo
    k_low = (R_lo * (3.0 - R2_lo)) / (1.0 - R2_lo + eps_r)
    k_high = -jnp.log(jnp.maximum(1.0 - R2, eps_r))
    s = jax.nn.sigmoid((R - r0) / max(float(tau), 1e-6))
    return (1.0 - s) * k_low + s * k_high, clamp_delta


def _pe_kernel_body(cfg: GCConfig, L_prev_ref, h_prev_ref, anchor_ref,
                    mu_prev_ref, sigma_prev_ref, rprev_ref, Q_ref, sg_ref,
                    sa_ref, cov_ref, M2_ref,
                    pk_ref, Lp_out, hp_out, mup_out, Lio_out, hio_out,
                    zlin_out, small_out, dpsi_out, certs_out, rzlin_out):
    (L_pred, h_pred, mean_pred, L_io, h_io, z_lin, xi_odom, z_lin_pose7,
     dpsi_accel, certs) = _pe_math(
        cfg, L_prev_ref[:], h_prev_ref[0, :], anchor_ref[0, :],
        mu_prev_ref[0, :], sigma_prev_ref[:], rprev_ref[:], Q_ref[:],
        sg_ref[:], sa_ref[:], cov_ref[:], M2_ref[:], pk_ref[0, :])
    rzlin_out[:] = se3.quat_to_R(z_lin_pose7[3:7])
    Lp_out[:] = L_pred
    hp_out[0, :] = h_pred
    mup_out[0, :] = mean_pred
    Lio_out[:] = L_io
    hio_out[0, :] = h_io
    zlin_out[0, :] = z_lin
    small_out[0, :] = jnp.concatenate([xi_odom, z_lin_pose7])
    dpsi_out[:] = dpsi_accel
    certs_out[0, :] = certs


def _pe_math_out(cfg: GCConfig, *ins):
    """_pe_math + the two derived outputs the kernel writes (small = packed
    [xi_odom, z_lin_pose7]; R(z_lin)) — write-ready tuple in out_shapes
    order, shared by the single-instance body and the batched vmap body."""
    (L_pred, h_pred, mean_pred, L_io, h_io, z_lin, xi_odom, z_lin_pose7,
     dpsi_accel, certs) = _pe_math(cfg, *ins)
    small = jnp.concatenate([xi_odom, z_lin_pose7])
    R_zlin = se3.quat_to_R(z_lin_pose7[3:7])
    return (L_pred, h_pred, mean_pred, L_io, h_io, z_lin, small, dpsi_accel,
            certs, R_zlin)


def _pe_dispatch(cfg: GCConfig, interpret: bool, out_shapes):
    key = ("pe", cfg, interpret)
    if key not in _DISPATCH_CACHE:
        def single(*operands):
            return pl.pallas_call(
                functools.partial(_pe_kernel_body, cfg),
                out_shape=out_shapes,
                in_specs=[_full_spec(op.shape) for op in operands],
                out_specs=tuple(_full_spec(o.shape) for o in out_shapes),
                interpret=interpret,
            )(*operands)
        _DISPATCH_CACHE[key] = _make_dispatch(
            cfg, interpret, out_shapes, _pe_math_out, 12, single=single)
    return _DISPATCH_CACHE[key]


def predict_evidence(cfg: GCConfig, L_prev, h_prev, anchor, mu_prev,
                     sigma_prev, R_prev, Q,
                     sigma_g, sigma_a, odom_cov, acc_M2, *, dt_sec, pre_ess,
                     dt_int, dt_imu, grav_rbar, transport_sigma, pose_prev,
                     motion_rot, motion_p, motion_v, omega_avg, a_body_mean,
                     odom_vel, odom_omega, odom_pose, grav_xbar, acc_m1,
                     acc_sw, odom_rel=None, first_scan=None,
                     interpret: bool | None = None):
    """Run predict + evidence (K=1) as ONE kernel.

    Returns (L_pred, h_pred, mu_pred, L_io, h_io, z_lin, xi_odom,
    z_lin_pose7, dpsi_accel, certs_vec[len(PE_CERT_KEYS)]).
    """
    dt = L_prev.dtype
    if interpret is None:
        interpret = FORCE_INTERPRET and jax.default_backend() != "tpu"
    if odom_rel is None:
        odom_rel = jnp.zeros((6,), dt)
    if first_scan is None:
        first_scan = jnp.ones((), dt)    # no increment info -> absolute
    pk = jnp.concatenate([
        jnp.stack([dt_sec, pre_ess, dt_int, dt_imu, grav_rbar,
                   transport_sigma]).astype(dt),
        pose_prev, motion_rot, motion_p, motion_v, omega_avg, a_body_mean,
        odom_vel, odom_omega, odom_pose, grav_xbar, acc_m1,
        jnp.stack([acc_sw]).astype(dt), odom_rel.astype(dt),
        jnp.stack([jnp.asarray(first_scan, dt)])])[None, :]
    assert pk.shape[1] == _PK_LEN + 1, pk.shape
    n = D_Z
    out_shapes = (
        jax.ShapeDtypeStruct((n, n), dt),      # L_pred
        jax.ShapeDtypeStruct((1, n), dt),      # h_pred
        jax.ShapeDtypeStruct((1, n), dt),      # mu_pred
        jax.ShapeDtypeStruct((n, n), dt),      # L_io
        jax.ShapeDtypeStruct((1, n), dt),      # h_io
        jax.ShapeDtypeStruct((1, n), dt),      # z_lin
        jax.ShapeDtypeStruct((1, 13), dt),     # [xi_odom(6), z_lin_pose7(7)]
        jax.ShapeDtypeStruct((3, 3), dt),      # dpsi_accel
        jax.ShapeDtypeStruct((1, len(PE_CERT_KEYS)), dt),
        jax.ShapeDtypeStruct((3, 3), dt),      # R(z_lin_pose7) for transforms
    )
    operands = (L_prev, h_prev[None, :], anchor[None, :], mu_prev[None, :],
                sigma_prev, R_prev, Q, sigma_g, sigma_a, odom_cov, acc_M2, pk)
    outs = _pe_dispatch(cfg, bool(interpret), out_shapes)(*operands)
    (L_pred, h_pred, mu_pred, L_io, h_io, z_lin, small, dpsi_accel,
     certs, R_zlin) = outs
    return (L_pred, h_pred[0], mu_pred[0], L_io, h_io[0], z_lin[0],
            small[0, 0:6], small[0, 6:13], dpsi_accel, certs[0], R_zlin)


PACKED_CERT_GROUPS["__packed__:tail"] = CERT_KEYS
PACKED_CERT_GROUPS["__packed__:pe"] = PE_CERT_KEYS
