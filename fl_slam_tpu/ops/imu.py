"""IMU operators: soft windows, fixed-length preintegration, gravity-direction
vMF evidence, gyro rotation evidence, velocity/position preintegration factor,
dependence inflation, and measurement-noise IW sufficient statistics.

Parity targets: ``operators/imu_preintegration.py``, ``operators/imu_evidence.py``,
``operators/imu_gyro_evidence.py``, ``operators/imu_preintegration_factor.py``,
``operators/measurement_noise_iw_jax.py``.

TPU-first deltas:
  - dt_int / dt_imu are masked device reductions (the reference computes them
    host-side with numpy + data-dependent sorting, ``pipeline.py:262-313``).
  - everything returns cert dicts of device scalars; nothing syncs.

Input convention: IMU windows arrive as fixed-length (M,) arrays, stamps sorted
ascending with zero padding at the tail (zero stamp == invalid sample).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fl_slam_tpu.config import IDX_ROT, IDX_TRANS, IDX_VEL
from fl_slam_tpu.core import se3
from fl_slam_tpu.core.linalg import (project_psd3, psd_guard,
                                     spd_inverse_lifted)
from fl_slam_tpu.core.vmf import kappa_from_resultant
from fl_slam_tpu.ops.embed import evidence_from_block


def smooth_window_weights(stamps, t_start, t_end, sigma, weight_floor: float = 1e-12):
    """Soft membership w(t) = sigmoid((t-start)/s) * sigmoid((end-t)/s), floored.

    Parity: imu_preintegration.py:19-43 (no hard window boundaries).
    """
    sig = jnp.maximum(sigma, 1e-6)
    w = jax.nn.sigmoid((stamps - t_start) / sig) * jax.nn.sigmoid((t_end - stamps) / sig)
    return w * (1.0 - weight_floor) + weight_floor


def imu_dt_intervals(stamps):
    """dt_i = t_{i+1} - t_i with the last forced to 0, clipped nonnegative."""
    dt = jnp.concatenate([stamps[1:] - stamps[:-1], jnp.zeros_like(stamps[:1])])
    return jnp.maximum(dt, 0.0)


def window_interval_weights(stamps, t_start, t_end, sigma,
                            weight_floor: float = 1e-12,
                            dt_cap: float = 0.1):
    """Soft-window INTEGRATION weights: the membership sigmoids evaluated at
    the MIDPOINT of each forward interval [t_k, t_{k+1}], with the last
    valid sample's interval CLOSED at t_end.

    ``smooth_window_weights`` at the sample stamps is a left-endpoint
    Riemann sum whose last interval is zeroed: each window lost ~half a
    sample period at both boundaries plus the whole tail interval —
    measured dt_int 0.095 s of a 0.1 s scan-to-scan span at 200 Hz. The
    5% under-integrated gyro delta is not benign noise: the gyro RELATIVE
    factor enforces it at full stiffness against the absolute factors,
    locking in a persistent yaw lag of rate x lag-equilibrium (~6.5 deg at
    0.05 rad/s on the Kimera fixture, phase-locked to the trajectory).
    Midpoint weights + the closed tail make sum(w dt) = (t_end - t_start)
    + O(sigma^2). ``dt_cap`` bounds the closed tail against sparse stamps.

    Returns (w_mid (M,), dt (M,)); use for integration measures only —
    per-sample statistics (resultants, IW suffstats) keep the sample-point
    weights.
    """
    valid = stamps > 0.0
    nxt_valid = jnp.concatenate([valid[1:], jnp.zeros_like(valid[:1])])
    fwd = jnp.concatenate([stamps[1:] - stamps[:-1],
                           jnp.zeros_like(stamps[:1])])
    tail = jnp.clip(t_end - stamps, 0.0, dt_cap)
    is_last = valid & ~nxt_valid
    dt = jnp.where(is_last, tail, jnp.maximum(fwd, 0.0)) * valid
    t_mid = stamps + 0.5 * dt
    w = smooth_window_weights(t_mid, t_start, t_end, sigma, weight_floor)
    return w * valid, dt


def integration_time(stamps, t_start, t_end):
    """dt_int = sum of IMU sample intervals within (t_start, t_end), on device.

    Invariants (reference ``pipeline.py:262-313``): 0 <= dt_int <= t_end-t_start.
    Assumes stamps sorted ascending with zero padding (zero == invalid).
    """
    eps = 1e-9
    valid = stamps > 0.0
    inwin = (stamps > t_start - eps) & (stamps <= t_end + eps) & valid
    pair_ok = inwin[:-1] & inwin[1:]
    dts = jnp.maximum(stamps[1:] - stamps[:-1], 0.0)
    dt_int = jnp.sum(jnp.where(pair_ok, dts, 0.0))
    return jnp.clip(dt_int, 0.0, jnp.maximum(t_end - t_start, 0.0))


def mean_sample_period(stamps):
    """(t_last - t_first) / (n_valid - 1) over valid samples, masked; >= 1e-12."""
    valid = stamps > 0.0
    n = jnp.sum(valid)
    big = jnp.asarray(1e30, stamps.dtype)
    t_first = jnp.min(jnp.where(valid, stamps, big))
    t_last = jnp.max(jnp.where(valid, stamps, -big))
    span = jnp.maximum(t_last - t_first, 0.0)
    denom = jnp.maximum(n - 1.0, 1.0)
    return jnp.maximum(jnp.where(n >= 2, span / denom, 0.0), 1e-12)


def _pad_identity_pow2(x, axis_len):
    """Pad leading axis of (N, 3, 3) up to the next power of two with I."""
    n = 1
    while n < axis_len:
        n *= 2
    if n == axis_len:
        return x, axis_len
    pad = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype),
                           x.shape[:-3] + (n - axis_len, 3, 3))
    return jnp.concatenate([x, pad], axis=-3), n


def _sklansky_prefix(x):
    """Inclusive left-to-right prefix products along axis -3 (power-of-2 len).

    Each level splits 2s-blocks into halves and left-multiplies the right
    half by the left half's last entry — pure reshape/slice/einsum (NO
    gathers: non-major-axis gathers lower to serialized while loops on TPU,
    which is exactly what this replaces; see docs/PERF_NOTES.md layout rules).
    """
    C = x.shape[-3]
    lead = x.shape[:-3]
    s = 1
    while s < C:
        y = x.reshape(lead + (C // (2 * s), 2 * s, 3, 3))
        left = y[..., :s, :, :]                       # (..., B, s, 3, 3)
        right = y[..., s:, :, :]
        le = left[..., s - 1, :, :]                   # (..., B, 3, 3)
        right = jnp.einsum("...ij,...njk->...nik", le, right)
        x = jnp.concatenate([left, right], axis=-3).reshape(lead + (C, 3, 3))
        s *= 2
    return x


def prefix_products(dR):
    """Inclusive prefix products P_k = dR_0 @ ... @ dR_k, blocked for TPU.

    Equivalent to ``lax.associative_scan(matmul, dR)`` but with every level a
    large batched einsum: the scan's small tail levels (<= 32 matrices) lower
    to serial ``while`` loops + dynamic-update-slices that cost ~500 us/scan
    in the replay trace (round-2 profile). Here the chain is chunked
    (n_chunks, 32): in-chunk Sklansky prefixes (5 levels, batch >= n_chunks),
    a tiny Sklansky over the chunk totals, and one broadcast combine.
    """
    M = dR.shape[0]
    C = 32                                                # chunk (power of 2)
    while C > M:
        C //= 2
    Mp = ((M + C - 1) // C) * C
    if Mp != M:
        pad = jnp.broadcast_to(jnp.eye(3, dtype=dR.dtype), (Mp - M, 3, 3))
        dR = jnp.concatenate([dR, pad], axis=0)
    nc = Mp // C
    x = _sklansky_prefix(dR.reshape(nc, C, 3, 3))         # (nc, C, 3, 3)
    totals, _ = _pad_identity_pow2(x[:, -1], nc)          # (nc_pow2, 3, 3)
    tp = _sklansky_prefix(totals)[:nc]                    # inclusive totals
    t_excl = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=dR.dtype), (1, 3, 3)), tp[:-1]],
        axis=0)                                           # (nc, 3, 3)
    P = jnp.einsum("cij,cnjk->cnik", t_excl, x).reshape(-1, 3, 3)
    return P[:M]


def preintegrate(stamps, gyro, accel, weights, rotvec_start, gyro_bias,
                 accel_bias, gravity_w, R_start=None, dt_intervals=None):
    """Fixed-length weighted IMU preintegration, parallelized.

    Math identical to the reference's sequential ``lax.scan``
    (imu_preintegration.py): per-sample R_{k} = R_{k-1} Exp(omega_k dt_k),
    v_k = v_{k-1} + a_world_k dt_k, p_k = p_{k-1} + v_{k-1} dt_k + 1/2 a dt^2.
    TPU-first: the rotation chain is a blocked prefix product (batched 3x3
    einsum levels, ``prefix_products``; ~6 ms sequential -> ~50 us at M=512),
    and the v/p integrals become cumulative sums over the resulting rotations.

    Returns a dict with delta quantities in the START BODY frame (the two
    frame-correctness rules of imu_preintegration.py:124-142):
      delta_pose (6,), delta_R (3,3), delta_p (3,), delta_v (3,),
      ess, a_body_mean, a_world_nog_mean, a_world_mean, dt_eff_sum.
    """
    dt = imu_dt_intervals(stamps) if dt_intervals is None else dt_intervals
    if R_start is None:
        R_start = se3.so3_exp(rotvec_start)
    dt_eff = weights * dt                                    # (M,)
    omega = gyro - gyro_bias                                 # (M, 3)
    a_body = accel - accel_bias                              # (M, 3)

    # Prefix rotation products: P_k = dR_1 ... dR_k (inclusive).
    dR = se3.so3_exp(omega * dt_eff[:, None])                # (M, 3, 3)
    P = prefix_products(dR)                                  # left-to-right
    # R before step k (exclusive prefix): R_start @ P_{k-1}.
    eyeM = jnp.broadcast_to(jnp.eye(3, dtype=gyro.dtype), dR.shape)
    P_excl = jnp.concatenate([eyeM[:1], P[:-1]], axis=0)
    R_before = jnp.einsum("ij,mjk->mik", R_start, P_excl)    # (M, 3, 3)

    a_world_nog = jnp.einsum("mij,mj->mi", R_before, a_body)
    a_world = a_world_nog + gravity_w[None, :]

    dv = a_world * dt_eff[:, None]                           # (M, 3)
    v_cum = jnp.cumsum(dv, axis=0)
    v_before = v_cum - dv                                    # exclusive
    dp = v_before * dt_eff[:, None] + 0.5 * a_world * dt_eff[:, None] ** 2
    p_end = jnp.sum(dp, axis=0)
    v_end = v_cum[-1]
    R_end = R_start @ P[-1]

    s_wdt = jnp.sum(dt_eff)
    s_ab = jnp.sum(a_body * dt_eff[:, None], axis=0)
    s_awn = jnp.sum(a_world_nog * dt_eff[:, None], axis=0)
    s_aw = jnp.sum(a_world * dt_eff[:, None], axis=0)

    delta_R = R_start.T @ R_end
    rotvec_delta = se3.so3_log(delta_R)
    delta_p = R_start.T @ p_end
    delta_v = R_start.T @ v_end
    denom = jnp.maximum(s_wdt, 1e-12)
    return {
        "delta_pose": jnp.concatenate([delta_p, rotvec_delta]),
        "delta_R": delta_R,
        "delta_p": delta_p,
        "delta_v": delta_v,
        "ess": jnp.sum(weights),
        "a_body_mean": s_ab / denom,
        "a_world_nog_mean": s_awn / denom,
        "a_world_mean": s_aw / denom,
        "dt_eff_sum": s_wdt,
    }


# ---------------------------------------------------------------------------
# Gravity-direction vMF evidence (time-resolved, transport-consistency weighted)
# ---------------------------------------------------------------------------

def transport_consistency(accel, gyro, dt, eps_mass: float):
    """|df/dt + omega x f| per sample (central differences; fwd/bwd at ends)."""
    df = jnp.zeros_like(accel)
    df = df.at[1:-1].set((accel[2:] - accel[:-2]) / (2.0 * dt + eps_mass))
    df = df.at[0].set((accel[1] - accel[0]) / (dt + eps_mass))
    df = df.at[-1].set((accel[-1] - accel[-2]) / (dt + eps_mass))
    e = df + jnp.cross(gyro, accel)
    return jnp.linalg.norm(e, axis=-1)


def _masked_median(x, mask):
    """Median over entries with mask > 0 (pads ride to +inf and a dynamic
    gather picks the middle of the valid prefix). np.median semantics:
    even counts average the two middle order statistics."""
    s = jnp.sort(jnp.where(mask > 0, x, jnp.inf))
    n = jnp.sum((mask > 0).astype(jnp.int32))
    i_hi = jnp.maximum(n // 2, 0)
    i_lo = jnp.maximum((n - 1) // 2, 0)
    m = 0.5 * (s[i_lo] + s[i_hi])
    return jnp.where(n > 0, m, jnp.zeros_like(m))


def reliability_weights(e_mag, eps_mass: float, valid=None):
    """MAD-self-adaptive Gaussian reliability: exp(-e^2 / 2 sigma^2).

    ``valid``: mask of REAL samples. The window is zero-padded to a fixed
    length; with pads in the majority (production: ~40 real of 512) an
    unmasked median/MAD is exactly 0, sigma collapses to eps and every
    real sample gets reliability 0 — the gravity factor was silently DEAD
    at production budgets until this mask (found on the 5,000-scan Kimera
    fixture replay: rbar = 0 every scan, roll/pitch unanchored, the run
    eventually diverged). sigma is floored at 5% of the median so a
    genuinely clean window (MAD ~ 0) keeps rel ~ 1 instead of 0."""
    if valid is None:
        med = jnp.median(e_mag)
        mad = jnp.median(jnp.abs(e_mag - med))
    else:
        med = _masked_median(e_mag, valid)
        mad = _masked_median(jnp.abs(e_mag - med), valid)
    sigma = mad / 0.6745 + 0.05 * med + eps_mass
    rel = jnp.exp(-0.5 * (e_mag / sigma) ** 2)
    if valid is not None:
        rel = rel * (valid > 0)
    return rel, sigma


def gravity_resultant(accel, gyro, weights, accel_bias, dt_imu,
                      eps_mass: float):
    """Pose-INDEPENDENT half of the gravity vMF evidence: the transport-
    consistency-weighted resultant over the IMU window (the big (M, 3)
    reductions, including the sort-based MAD that has no Mosaic lowering).
    Split out so the TPU predict+evidence kernel can consume the reduced
    quantities (ops/belief_kernels._pe_math) while the XLA path composes
    this with ``gravity_laplace_part`` bit-identically."""
    a_corr = accel - accel_bias
    e_mag = transport_consistency(a_corr, gyro, dt_imu, eps_mass)
    # real-sample mask: pads carry ~zero window weight (see
    # reliability_weights on why the masked median is load-bearing)
    valid = (weights > 1e-9).astype(weights.dtype)
    rel, transport_sigma = reliability_weights(e_mag, eps_mass, valid=valid)

    w = weights * rel
    ess_w = jnp.sum(w)
    ess_raw = jnp.sum(weights)
    n = jnp.linalg.norm(a_corr, axis=-1, keepdims=True)
    x = a_corr / (n + eps_mass)
    S = jnp.sum(w[:, None] * x, axis=0)
    S_norm = jnp.linalg.norm(S)
    xbar = S / (S_norm + eps_mass)
    rbar = S_norm / (ess_w + eps_mass)
    return {"xbar": xbar, "rbar": rbar, "ess_w": ess_w, "ess_raw": ess_raw,
            "transport_sigma": transport_sigma, "rel_mean": jnp.mean(rel)}


def accel_moments(accel, weights, accel_bias, eps_mass: float):
    """Pose-independent moments of the debiased specific force for the
    accel-noise IW suffstats (sum-normalized weights): (M2, m1, sw) with
    rrT = M2 - f m1^T - m1 f^T + sw f f^T == accel_iw_suffstats' weighted
    outer product at any predicted gravity reaction f."""
    w = weights / (jnp.sum(weights) + eps_mass)
    x = accel - accel_bias
    M2 = jnp.einsum("m,mi,mj->ij", w, x, x)
    m1 = jnp.einsum("m,mi->i", w, x)
    return M2, m1, jnp.sum(w)


def gravity_vmf_evidence(rotvec_wb, accel, gyro, weights, accel_bias, gravity_w,
                         dt_imu, *, eps_psd: float, eps_mass: float,
                         eps_r: float, blend_r0: float, blend_tau: float):
    """vMF gravity-direction factor on the rotation block.

    Laplace approximation at mu0 = R^T (-g_hat):
      grad = -kappa (mu0 x xbar)
      Hess ~ kappa [ (xbar . mu0) I - 0.5 (xbar mu0^T + mu0 xbar^T) ]
    (parity: imu_evidence.py:276-559).
    Returns (L22, h22, certs).
    """
    dtype = accel.dtype
    R0 = se3.so3_exp(rotvec_wb)
    g_hat = gravity_w / (jnp.linalg.norm(gravity_w) + eps_mass)
    mu0 = R0.T @ (-g_hat)

    res = gravity_resultant(accel, gyro, weights, accel_bias, dt_imu,
                            eps_mass)
    xbar, rbar = res["xbar"], res["rbar"]
    ess_w, ess_raw = res["ess_w"], res["ess_raw"]
    transport_sigma = res["transport_sigma"]

    kappa, kappa_clamp = kappa_from_resultant(rbar, eps_r, blend_r0, blend_tau)
    x_dot_mu = xbar @ mu0
    g_rot = -kappa * jnp.cross(mu0, xbar)
    eye = jnp.eye(3, dtype=dtype)
    H = kappa * (x_dot_mu * eye - 0.5 * (jnp.outer(xbar, mu0) + jnp.outer(mu0, xbar)))
    H = 0.5 * (H + H.T)
    H_psd, proj = project_psd3(H, eps_psd)

    # h = +g_rot: g_rot IS the right-perturbation gradient of the vMF
    # LOG-LIKELIHOOD l(d) = kappa xbar . Exp(-d^) mu0 (dl/dd = -kappa
    # (mu0 x xbar)), and the info-form contribution is h = H d* = dl/dd.
    # The reference embeds -g_rot (imu_evidence.py:235) — the WRONG sign:
    # its MAP increment d* = H^{-1}(-g) points AWAY from aligning mu with
    # xbar, so the gravity factor destabilizes tilt instead of anchoring
    # it. Verified constructively: with xbar = Exp(-e^) mu0 (true right
    # tilt e), h = +g_rot gives d* ~ +e_perp (aligns), -g_rot gives -e
    # (anti-aligns); observed on the clean-IMU Kimera fixture as
    # exponential roll/pitch runaway (tilt doubling every ~10 scans, rot
    # 2.6 rad by scan 99) that vanished with the factor disabled. On the
    # reference's real noisy rig the factor is weak (low rbar -> low
    # kappa) and other evidence overpowers the wrong sign — latent there,
    # fatal here.
    L, h = evidence_from_block(IDX_ROT, H_psd, g_rot, dtype)
    certs = {
        "imu_grav.kappa": kappa,
        "imu_grav.rbar": rbar,
        "imu_grav.ess": ess_w,
        "imu_grav.reliability_mean": res["rel_mean"],
        "imu_grav.transport_sigma": transport_sigma,
        "imu_grav.psd_projection": proj,
        "imu_grav.nll_proxy": -kappa * x_dot_mu,
        "imu_grav.kappa_clamp": kappa_clamp,
        "imu_grav.ess_ratio": ess_w / (ess_raw + eps_mass),
    }
    return L, h, certs


def accel_bias_evidence(a_body_mean, rotvec_wb, gravity_w, sigma_ba, dtype,
                        a_body_expected=None, perp_scale: float = 0.05):
    """Accel-bias factor from the gravity reaction (NOT in the reference).

    Over a quasi-static window the mean debiased specific force should equal
    the gravity reaction -R^T g; the residual observes the accel bias
    directly: delta_ba = a_body_mean - (-R^T g). Without this factor ba (and
    through mechanization, velocity and z) drifts unboundedly — the
    reference's factor set never observes ba at all. sigma_ba is generous to
    absorb true robot acceleration contaminating the window mean.

    ANISOTROPIC precision (the yaw-spin stability fix): the residual's
    component PERPENDICULAR to the gravity direction mu0 = -R^T g_hat is
    exactly the tilt-ambiguous part — a tilt error d produces r_perp ~
    g x d with NO true bias. Feeding it to ba at full precision closes an
    unstable loop under yaw: ba is a BODY-frame state, so a world-fixed
    tilt error makes its fake-ba explanation ROTATE in body frame; ba
    chases with phase lag and the lag torque PRECESSES tilt instead of
    damping it (observed: spin-in-place fixture diverges 0.1 -> 18.6 deg
    in 1,024 scans while the straight-line variant holds 0.1 deg; the
    gravity factor itself is kappa-capped ~13 and cannot arrest it). The
    gravity-PARALLEL component (|a| - g along mu0) is tilt-invariant and
    keeps full precision; perpendicular precision is scaled by
    ``perp_scale`` so ba_xy stays weakly observable on rigs with real
    pitch/roll excitation without closing the loop.
    """
    from fl_slam_tpu.config import IDX_BA
    R0 = se3.so3_exp(rotvec_wb)
    g_hat = gravity_w / (jnp.linalg.norm(gravity_w) + 1e-12)
    mu0 = -(R0.T @ g_hat)
    r_ba = a_body_mean - (-(R0.T @ gravity_w))
    if a_body_expected is not None:
        # Remove the kinematically expected body acceleration (e.g. the
        # centripetal omega x v from odometry) so turning does not masquerade
        # as accel bias.
        r_ba = r_ba - a_body_expected
    precision = 1.0 / (sigma_ba * sigma_ba)
    P_par = jnp.outer(mu0, mu0)
    eye = jnp.eye(3, dtype=dtype)
    L3 = precision * (P_par + perp_scale * (eye - P_par))
    L3 = 0.5 * (L3 + L3.T)
    L, h = evidence_from_block(IDX_BA, L3, L3 @ r_ba, dtype)
    certs = {"imu_ba.residual_norm": jnp.linalg.norm(r_ba),
             "imu_ba.nll_proxy": 0.5 * (r_ba @ (L3 @ r_ba))}
    return L, h, certs


def dependence_inflation_scale(transport_sigma, eps_mass: float):
    """Continuous gyro<->accel dependence downscale 1/(1 + sigma^2)."""
    s = jnp.maximum(transport_sigma, 0.0)
    return 1.0 / (1.0 + s * s + eps_mass)


# ---------------------------------------------------------------------------
# Gyro rotation evidence and preintegration velocity/position factor
# ---------------------------------------------------------------------------

def gyro_rotation_evidence(rotvec_start, rotvec_end_pred, delta_rotvec_meas,
                           sigma_g, dt_int, *, eps_psd: float, eps_lift: float,
                           eps_mass: float):
    """SO(3) Gaussian factor on the rotation block.

    r = Log(R_end_pred^T R_start Exp(delta_theta)); Sigma = sigma_g * dt_int;
    continuous mass scale dt/(dt+eps) (parity: imu_gyro_evidence.py:38-163).
    """
    dtype = rotvec_start.dtype
    R_start = se3.so3_exp(rotvec_start)
    R_end_imu = R_start @ se3.so3_exp(delta_rotvec_meas)
    R_end_pred = se3.so3_exp(rotvec_end_pred)
    r_rot = se3.so3_log(R_end_pred.T @ R_end_imu)

    dt_pos = jnp.maximum(dt_int, 0.0)
    dt_eff = dt_pos + eps_mass
    mass_scale = dt_pos / dt_eff

    Sigma_rot, proj = psd_guard(sigma_g * dt_eff, eps_psd)
    L_rot, lift = spd_inverse_lifted(Sigma_rot, eps_lift)
    L_rot = mass_scale * L_rot

    L, h = evidence_from_block(IDX_ROT, L_rot, L_rot @ r_rot, dtype)
    certs = {
        "imu_gyro.nll_proxy": 0.5 * r_rot @ L_rot @ r_rot,
        "imu_gyro.residual_norm": jnp.linalg.norm(r_rot),
        "imu_gyro.psd_projection": proj,
        "imu_gyro.lift": lift,
        "imu_gyro.mass_scale": mass_scale,
    }
    return L, h, certs


def preintegration_factor(p_start, rotvec_start, v_start, p_end_pred, v_end_pred,
                          delta_v_body, delta_p_body, sigma_a, dt_int, *,
                          eps_psd: float, eps_lift: float, eps_mass: float,
                          sigma_ba: float = 0.1):
    """Velocity + position factors from preintegrated IMU.

    v_imu = v_i + R_i dv;  p_imu = p_i + v_i dt + R_i dp;
    Sigma_v = Sigma_a dt + (sigma_ba dt)^2;
    Sigma_p = Sigma_a dt^3 + (sigma_ba dt^2 / 2)^2
    (parity: imu_preintegration_factor.py:46-180, plus bias-uncertainty terms
    the reference omits — its Sigma_a dt^3 alone claims ~mm position knowledge
    from 0.1 s of IMU, which lets any residual accel bias steamroll every
    other translation factor).
    """
    dtype = p_start.dtype
    R_start = se3.so3_exp(rotvec_start)
    v_imu = v_start + R_start @ delta_v_body
    p_imu = p_start + v_start * dt_int + R_start @ delta_p_body
    r_vel = v_imu - v_end_pred
    r_pos = p_imu - p_end_pred

    dt_pos = jnp.maximum(dt_int, 0.0)
    dt_eff = dt_pos + eps_mass
    mass_scale = dt_pos / dt_eff

    eye3 = jnp.eye(3, dtype=dtype)
    Sv, proj_v = psd_guard(sigma_a * dt_eff
                           + (sigma_ba * dt_eff) ** 2 * eye3, eps_psd)
    Sp, proj_p = psd_guard(sigma_a * dt_eff ** 3
                           + (0.5 * sigma_ba * dt_eff ** 2) ** 2 * eye3,
                           eps_psd)
    L_v, lift_v = spd_inverse_lifted(Sv, eps_lift)
    L_p, lift_p = spd_inverse_lifted(Sp, eps_lift)
    L_v = mass_scale * L_v
    L_p = mass_scale * L_p

    from fl_slam_tpu.config import D_Z
    L = jnp.zeros((D_Z, D_Z), dtype=dtype)
    h = jnp.zeros((D_Z,), dtype=dtype)
    L = L.at[IDX_TRANS, IDX_TRANS].set(L_p)
    h = h.at[IDX_TRANS].set(L_p @ r_pos)
    L = L.at[IDX_VEL, IDX_VEL].set(L_v)
    h = h.at[IDX_VEL].set(L_v @ r_vel)
    certs = {
        "imu_preint.nll_proxy": 0.5 * (r_vel @ L_v @ r_vel + r_pos @ L_p @ r_pos),
        "imu_preint.lift": lift_v + lift_p,
        "imu_preint.psd_projection": proj_v + proj_p,
        "imu_preint.r_vel_norm": jnp.linalg.norm(r_vel),
        "imu_preint.r_pos_norm": jnp.linalg.norm(r_pos),
    }
    return L, h, certs


# ---------------------------------------------------------------------------
# Measurement-noise IW sufficient statistics (gyro, accel)
# ---------------------------------------------------------------------------

def gyro_iw_suffstats(gyro, weights, gyro_bias, omega_avg, dt_imu, *,
                      eps_mass: float, eps_psd: float):
    """Gyro noise suffstats from debiased-rate residuals around omega_avg;
    discrete variance mapped to PSD by * dt (measurement_noise_iw_jax.py:134).
    Returns (3,3) dPsi for the gyro block."""
    w = weights / (jnp.sum(weights) + eps_mass)
    r = (gyro - gyro_bias) - omega_avg
    rrT = jnp.einsum("m,mi,mj->ij", w, r, r)
    rrT, _ = psd_guard(rrT, eps_psd)
    return rrT * jnp.maximum(dt_imu, 1e-12)


def accel_iw_suffstats(rotvec_wb, accel, weights, accel_bias, gravity_w, dt_imu,
                       *, eps_mass: float, eps_psd: float):
    """Accel noise suffstats from specific-force residuals vs predicted gravity
    reaction f_pred = -R^T g (measurement_noise_iw_jax.py:170-218)."""
    R0 = se3.so3_exp(rotvec_wb)
    f_pred = -(R0.T @ gravity_w)
    w = weights / (jnp.sum(weights) + eps_mass)
    r = (accel - accel_bias) - f_pred
    rrT = jnp.einsum("m,mi,mj->ij", w, r, r)
    rrT, _ = psd_guard(rrT, eps_psd)
    return rrT * jnp.maximum(dt_imu, 1e-12)


def weighted_mean_rate(gyro, weights, gyro_bias, eps_mass: float):
    """omega_avg: weighted mean of debiased gyro rates (angular-rate proxy)."""
    w = weights / (jnp.sum(weights) + eps_mass)
    return jnp.einsum("m,mi->i", w, gyro - gyro_bias)
