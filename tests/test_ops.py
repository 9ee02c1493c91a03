"""Operator invariants (parity with reference test_audit_invariants.py:
order-invariance of fusion, smoothness at extremes, units consistency,
IW suffstat commutativity, evidence correctness on synthetic cases)."""

import jax
import numpy as np
import jax.numpy as jnp

from fl_slam_tpu.config import GCConfig, D_Z, IDX_POSE, IDX_VEL
from fl_slam_tpu.core import se3
from fl_slam_tpu.core.belief import Belief, identity_belief, mean_increment, world_pose
from fl_slam_tpu.ops import deskew, fusion, hypothesis, imu, noise, odom
from fl_slam_tpu.ops import point_budget as pb
from fl_slam_tpu.ops import predict as predict_op
from fl_slam_tpu.ops import priors, recompose

CFG = GCConfig.small()
F64 = jnp.float64


def _strong_belief(info=1e4):
    b = identity_belief(dtype=F64, prior_info=info)
    return b


# ---------------------------------------------------------------------------
# predict
# ---------------------------------------------------------------------------

def test_predict_cov_grows_and_saturates():
    b = _strong_belief(1e4)  # cov = 1e-4 I
    Q = jnp.eye(D_Z, dtype=F64) * 0.01
    pred_small, _, _ = predict_op.predict_diffusion(
        b, Q, jnp.asarray(0.1), lambda_ou=0.1, eps_psd=1e-12, eps_lift=1e-9)
    pred_large, _, _ = predict_op.predict_diffusion(
        b, Q, jnp.asarray(1000.0), lambda_ou=0.1, eps_psd=1e-12, eps_lift=1e-9)
    cov_small = np.linalg.inv(np.asarray(pred_small.L))
    cov_large = np.linalg.inv(np.asarray(pred_large.L))
    assert cov_small[0, 0] > 1e-4  # grew
    # saturation: Sigma(inf) = Q / (2 lambda) = 0.01/0.2 = 0.05
    np.testing.assert_allclose(cov_large[0, 0], 0.05, rtol=1e-3)


def test_predict_preserves_mean():
    b = _strong_belief(1e4)
    h = jnp.zeros((D_Z,), F64).at[0].set(1e4 * 0.3)  # mean x = 0.3
    b = b._replace(h=h)
    Q = jnp.eye(D_Z, dtype=F64) * 1e-6
    pred, mean_pred, _ = predict_op.predict_diffusion(
        b, Q, jnp.asarray(0.1), lambda_ou=0.1, eps_psd=1e-12, eps_lift=1e-9)
    np.testing.assert_allclose(float(mean_increment(pred)[0]), 0.3, rtol=1e-6)
    np.testing.assert_allclose(float(mean_pred[0]), 0.3, rtol=1e-6)


# ---------------------------------------------------------------------------
# IMU preintegration
# ---------------------------------------------------------------------------

def _imu_window(n=64, rate=200.0, omega=(0.0, 0.0, 0.5), accel=None,
                noise=0.0, seed=7):
    stamps = jnp.asarray(np.arange(1, n + 1) / rate, F64)
    gyro = jnp.broadcast_to(jnp.asarray(omega, F64), (n, 3))
    if accel is None:
        accel = (0.0, 0.0, 9.81)  # stationary reaction, z-up
    acc = np.broadcast_to(np.asarray(accel, np.float64), (n, 3)).copy()
    if noise > 0.0:
        r = np.random.default_rng(seed)
        acc += r.normal(size=(n, 3)) * noise
        gyro = gyro + jnp.asarray(r.normal(size=(n, 3)) * noise * 0.1)
    w = jnp.ones((n,), F64)
    return stamps, gyro, jnp.asarray(acc), w


def test_preintegration_constant_yaw():
    n, rate, wz = 64, 200.0, 0.5
    stamps, gyro, acc, w = _imu_window(n, rate, (0.0, 0.0, wz))
    out = imu.preintegrate(stamps, gyro, acc, w,
                           rotvec_start=jnp.zeros(3, F64),
                           gyro_bias=jnp.zeros(3, F64),
                           accel_bias=jnp.zeros(3, F64),
                           gravity_w=jnp.asarray([0.0, 0.0, -9.81], F64))
    # last dt forced 0 -> integrates (n-1)/rate seconds
    expected_yaw = wz * (n - 1) / rate
    np.testing.assert_allclose(float(out["delta_pose"][5]), expected_yaw,
                               rtol=1e-9)
    # stationary: a_world = R(a_body) + g ~ 0 -> no velocity change
    np.testing.assert_allclose(np.asarray(out["delta_v"]), 0.0, atol=1e-6)


def test_prefix_products_matches_associative_scan():
    """The blocked Sklansky prefix product is a reordering of the same matrix
    chain; it must match lax.associative_scan to fp tolerance at every length
    (incl. non-multiples of the 32-chunk and tiny M)."""
    r = np.random.default_rng(3)
    for m in (1, 2, 5, 31, 32, 33, 64, 100, 512):
        rv = jnp.asarray(r.normal(size=(m, 3)) * 0.2, F64)
        dR = se3.so3_exp(rv)
        P = imu.prefix_products(dR)
        P_ref = jax.lax.associative_scan(lambda a, b: a @ b, dR)
        np.testing.assert_allclose(np.asarray(P), np.asarray(P_ref),
                                   atol=1e-12, err_msg=f"M={m}")


def test_integration_time_device():
    stamps = jnp.asarray([0.1, 0.2, 0.3, 0.4, 0.0, 0.0], F64)  # padded
    dt_int = imu.integration_time(stamps, 0.05, 0.45)
    np.testing.assert_allclose(float(dt_int), 0.3, atol=1e-9)
    # clipped by window length
    dt_int2 = imu.integration_time(stamps, 0.15, 0.35)
    assert float(dt_int2) <= 0.2 + 1e-9


def test_mean_sample_period():
    stamps = jnp.asarray([0.1, 0.2, 0.3, 0.0], F64)
    np.testing.assert_allclose(float(imu.mean_sample_period(stamps)), 0.1,
                               atol=1e-9)


def test_gravity_evidence_zero_gradient_when_aligned():
    stamps, gyro, acc, w = _imu_window()
    L, h, certs = imu.gravity_vmf_evidence(
        jnp.zeros(3, F64), acc, gyro, w, jnp.zeros(3, F64),
        jnp.asarray([0.0, 0.0, -9.81], F64), jnp.asarray(0.005, F64),
        eps_psd=1e-12, eps_mass=1e-12, eps_r=1e-6, blend_r0=0.8, blend_tau=0.03)
    # aligned -> h (gradient) ~ 0, but L (Hessian) has rotation information
    np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-9)
    assert float(jnp.trace(L)) > 0.1
    # rotation-z is unobservable from gravity: L[5,5] ~ 0 relative to L[3,3]
    assert float(L[5, 5]) < float(L[3, 3]) * 1e-6 + 1e-9


def test_gravity_evidence_pulls_toward_gravity():
    # body tilted: accel reaction measured along x+z
    a = np.array([np.sin(0.2), 0.0, np.cos(0.2)]) * 9.81
    stamps, gyro, acc, w = _imu_window(accel=tuple(a), noise=0.02)
    L, h, _ = imu.gravity_vmf_evidence(
        jnp.zeros(3, F64), acc, gyro, w, jnp.zeros(3, F64),
        jnp.asarray([0.0, 0.0, -9.81], F64), jnp.asarray(0.005, F64),
        eps_psd=1e-12, eps_mass=1e-12, eps_r=1e-6, blend_r0=0.8, blend_tau=0.03)
    assert float(jnp.linalg.norm(h)) > 1e-3  # nonzero pull


def test_gyro_rotation_evidence_zero_residual():
    rot_start = jnp.asarray([0.0, 0.0, 0.1], F64)
    delta = jnp.asarray([0.0, 0.0, 0.2], F64)
    rot_end = se3.so3_log(se3.so3_exp(rot_start) @ se3.so3_exp(delta))
    L, h, certs = imu.gyro_rotation_evidence(
        rot_start, rot_end, delta, jnp.eye(3, dtype=F64) * 1e-6,
        jnp.asarray(0.1, F64), eps_psd=1e-12, eps_lift=1e-9, eps_mass=1e-12)
    np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-6)
    assert float(certs["imu_gyro.residual_norm"]) < 1e-9


def test_gyro_evidence_vanishes_without_samples():
    L, h, _ = imu.gyro_rotation_evidence(
        jnp.zeros(3, F64), jnp.zeros(3, F64), jnp.zeros(3, F64),
        jnp.eye(3, dtype=F64) * 1e-6, jnp.asarray(0.0, F64),
        eps_psd=1e-12, eps_lift=1e-9, eps_mass=1e-12)
    np.testing.assert_allclose(np.asarray(L), 0.0, atol=1e-20)


# ---------------------------------------------------------------------------
# odom evidence
# ---------------------------------------------------------------------------

def test_odom_quadratic_moves_mean_toward_odom():
    b = _strong_belief(1.0)
    pose_pred = jnp.zeros(6, F64)
    odom_pose = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.0], F64)
    cov = jnp.eye(6, dtype=F64) * 0.01
    L, h, dz, _ = odom.quadratic_pose_evidence(pose_pred, odom_pose, cov,
                                               eps_psd=1e-12, eps_lift=1e-9)
    fused, _ = fusion.info_fusion_additive(b, L, h, 1.0, eps_psd=1e-12)
    mu = mean_increment(fused)
    assert 0.9 < float(mu[0]) <= 1.0  # pulled toward odom x = 1


def test_velocity_evidence_body_frame():
    rot = jnp.asarray([0.0, 0.0, np.pi / 2], F64)  # yaw 90 deg
    v_world = jnp.asarray([1.0, 0.0, 0.0], F64)
    # body-frame velocity should be R^T v_world = [0, -1, 0]
    v_body_meas = jnp.asarray([0.0, -1.0, 0.0], F64)
    L, h, _ = odom.velocity_evidence(v_world, rot, v_body_meas,
                                     jnp.eye(3, dtype=F64) * 0.01,
                                     eps_psd=1e-12, eps_lift=1e-9)
    np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-9)


def test_pose_twist_consistency_zero_residual():
    dt = 0.1
    v = jnp.asarray([1.0, 0.0, 0.0], F64)
    w = jnp.asarray([0.0, 0.0, 0.3], F64)
    pose_prev = jnp.zeros(6, F64)
    t_curr = v * dt  # R_prev = I
    pose_curr = jnp.concatenate([t_curr, w * dt])
    L, h, r_t, r_r, _ = odom.pose_twist_consistency(
        pose_prev, pose_curr, v, w, jnp.asarray(dt, F64),
        jnp.eye(3, dtype=F64) * 0.01, jnp.eye(3, dtype=F64) * 1e-4,
        eps_psd=1e-12, eps_lift=1e-9)
    np.testing.assert_allclose(np.asarray(r_t), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_r), 0.0, atol=1e-12)


# ---------------------------------------------------------------------------
# fusion / tempering / recompose
# ---------------------------------------------------------------------------

def test_fusion_order_invariance():
    b = _strong_belief(1.0)
    rng = np.random.default_rng(0)
    A1 = rng.normal(size=(D_Z, D_Z))
    A2 = rng.normal(size=(D_Z, D_Z))
    L1 = jnp.asarray(A1 @ A1.T)
    L2 = jnp.asarray(A2 @ A2.T)
    h1 = jnp.asarray(rng.normal(size=D_Z))
    h2 = jnp.asarray(rng.normal(size=D_Z))
    f12, _ = fusion.info_fusion_additive(
        *fusion.info_fusion_additive(b, L1, h1, 1.0, eps_psd=1e-12)[:1],
        L2, h2, 1.0, eps_psd=1e-12)
    f21, _ = fusion.info_fusion_additive(
        *fusion.info_fusion_additive(b, L2, h2, 1.0, eps_psd=1e-12)[:1],
        L1, h1, 1.0, eps_psd=1e-12)
    np.testing.assert_allclose(np.asarray(f12.L), np.asarray(f21.L), atol=1e-9)
    np.testing.assert_allclose(np.asarray(f12.h), np.asarray(f21.h), atol=1e-9)


def test_tempering_beta_bounds():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(D_Z, D_Z))
    L = jnp.asarray(A @ A.T)
    beta, _ = fusion.power_tempering_beta(
        L, jnp.asarray(100.0), jnp.asarray(0.0),
        power_beta_min=0.25, power_beta_z_c=1.0, power_beta_exc_c=50.0,
        eps_mass=1e-12)
    assert 0.25 <= float(beta) <= 1.0


def test_excitation_scaling_shrinks_prior():
    L_prior = jnp.eye(D_Z, dtype=F64)
    h_prior = jnp.ones(D_Z, F64)
    L_ev = jnp.eye(D_Z, dtype=F64) * 100.0
    s_dt, s_ex = fusion.excitation_scales(L_ev, L_prior, 1e-12)
    assert 0.9 < float(s_dt) < 1.0
    Lp, hp = fusion.apply_excitation_prior_scaling(L_prior, h_prior, s_dt, s_ex)
    assert float(Lp[15, 15]) < 0.1  # dt prior strongly relaxed
    assert float(Lp[0, 0]) == 1.0   # pose untouched


def test_recompose_updates_anchor_and_zeroes_pose():
    b = _strong_belief(1e2)
    h = jnp.zeros(D_Z, F64).at[0].set(1e2 * 0.4)  # mean x increment 0.4
    b = b._replace(h=h)
    z_lin = jnp.zeros(D_Z, F64)
    b_new, z_lin_new, dpose, dz_new, certs = recompose.frobenius_recompose(
        b, z_lin, jnp.asarray(0.0, F64), c_frob=1.0, eps_lift=1e-9)
    # anchor moved by the pose increment
    np.testing.assert_allclose(float(b_new.anchor[0]), 0.4, rtol=1e-6)
    # posterior pose increment now ~ 0
    np.testing.assert_allclose(float(mean_increment(b_new)[0]), 0.0, atol=1e-9)
    # zero triggers -> zero Frobenius strength
    assert float(certs["recompose.frobenius_strength"]) == 0.0


def test_anchor_drift_small_and_large():
    b = _strong_belief(1e2)
    h_small = jnp.zeros(D_Z, F64).at[0].set(1e2 * 0.01)
    b_small = b._replace(h=h_small)
    _, _, c_small = recompose.anchor_drift_update(
        b_small, jnp.zeros(D_Z, F64), m0=0.5, r0=0.2, eps_lift=1e-9)
    assert float(c_small["anchor.rho"]) < 0.05

    h_big = jnp.zeros(D_Z, F64).at[0].set(1e2 * 2.0)
    b_big = b._replace(h=h_big)
    b_new, z_new, c_big = recompose.anchor_drift_update(
        b_big, jnp.zeros(D_Z, F64), m0=0.5, r0=0.2, eps_lift=1e-9)
    assert float(c_big["anchor.rho"]) == 1.0
    np.testing.assert_allclose(float(b_new.anchor[0]), 2.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# IW noise
# ---------------------------------------------------------------------------

def test_iw_q_matches_priors():
    st = noise.init_process_noise(CFG)
    Q = noise.process_noise_to_Q(st, CFG.eps_psd)
    # atol absorbs the eps_psd diagonal guard lift (1e-12).
    np.testing.assert_allclose(float(Q[0, 0]), CFG.q_trans, rtol=1e-6, atol=2e-12)
    np.testing.assert_allclose(float(Q[3, 3]), CFG.q_rot, rtol=1e-6, atol=2e-12)
    np.testing.assert_allclose(float(Q[15, 15]), CFG.q_dt, rtol=1e-6, atol=2e-12)
    np.testing.assert_allclose(float(Q[16, 16]), CFG.q_ex, rtol=1e-6, atol=2e-12)
    # off-block couplings are zero
    assert float(Q[0, 3]) == 0.0


def test_iw_suffstats_commutative():
    st = noise.init_process_noise(CFG)
    rng = np.random.default_rng(3)
    d1 = jnp.asarray(np.abs(rng.normal(size=(7, 6, 6))))
    d1 = 0.5 * (d1 + jnp.swapaxes(d1, -1, -2))
    d2 = jnp.asarray(np.abs(rng.normal(size=(7, 6, 6))))
    d2 = 0.5 * (d2 + jnp.swapaxes(d2, -1, -2))
    dnu = jnp.ones((7,), F64)
    s12, _ = noise.process_apply_suffstats(st, d1 + d2, 2 * dnu, CFG)
    s21, _ = noise.process_apply_suffstats(st, d2 + d1, 2 * dnu, CFG)
    np.testing.assert_allclose(np.asarray(s12.psi), np.asarray(s21.psi),
                               atol=1e-12)


def test_iw_adapts_toward_residuals():
    st = noise.init_measurement_noise(CFG)
    # feed large lidar residuals repeatedly; Sigma_lidar should grow
    sigma0 = float(noise.measurement_noise_mean(st, 2, CFG.eps_psd)[0, 0])
    dpsi_l = noise.lidar_iw_suffstats(
        jnp.ones((8, 3), F64) * 0.5, jnp.ones((8,), F64), 1e-12, 1e-12)
    dpsi = jnp.zeros((3, 3, 3), F64).at[2].set(dpsi_l)
    dnu = jnp.asarray([0.0, 0.0, 1.0], F64)
    for _ in range(20):
        st, _ = noise.measurement_apply_suffstats(st, dpsi, dnu, CFG)
    sigma1 = float(noise.measurement_noise_mean(st, 2, CFG.eps_psd)[0, 0])
    assert sigma1 > sigma0 * 2


# ---------------------------------------------------------------------------
# hypothesis barycenter, point budget, deskew, priors
# ---------------------------------------------------------------------------

def test_barycenter_identical_inputs():
    b = _strong_belief(5.0)
    K = 4
    L_stack = jnp.broadcast_to(b.L, (K, D_Z, D_Z))
    h_stack = jnp.broadcast_to(b.h, (K, D_Z))
    z_stack = jnp.zeros((K, D_Z), F64)
    w = jnp.ones((K,), F64) / K
    L_out, h_out, z_out, w_out, _ = hypothesis.barycenter_projection(
        L_stack, h_stack, z_stack, w, weight_floor=0.0025, eps_psd=1e-12,
        eps_lift=1e-9)
    np.testing.assert_allclose(np.asarray(L_out), np.asarray(b.L), atol=1e-9)
    np.testing.assert_allclose(np.asarray(w_out), 0.25, atol=1e-12)


def test_point_budget_mass_preserved(rng):
    pts = jnp.asarray(rng.normal(size=(1000, 3)))
    ts = jnp.asarray(rng.uniform(0, 0.1, size=1000))
    w = jnp.asarray(rng.uniform(0.5, 1.5, size=1000))
    p, t, w_out, certs = pb.point_budget_resample(pts, ts, w, n_cap=256)
    assert p.shape == (256, 3)
    np.testing.assert_allclose(float(jnp.sum(w_out)), float(jnp.sum(w)),
                               rtol=1e-9)


def test_deskew_identity_twist():
    pts = jnp.asarray(np.random.default_rng(5).normal(size=(64, 3)))
    ts = jnp.linspace(0.0, 0.1, 64)
    w = jnp.ones((64,), F64)
    out, w_out, _ = deskew.deskew_constant_twist(
        pts.T, ts, w, 0.0, 0.1, jnp.zeros(6, F64),
        time_warp_sigma_frac=0.1, eps_mass=1e-12)
    np.testing.assert_allclose(np.asarray(out.T), np.asarray(pts), atol=1e-12)


def test_deskew_pure_rotation():
    # point at end of scan with known yaw twist: p0 = R(-yaw) p approximately
    pts = jnp.asarray([[1.0, 0.0, 0.0]], F64)
    ts = jnp.asarray([0.1], F64)
    w = jnp.ones((1,), F64)
    yaw = 0.2
    xi = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, yaw], F64)
    out, _, _ = deskew.deskew_constant_twist(
        pts.T, ts, w, 0.0, 0.1, xi, time_warp_sigma_frac=0.1, eps_mass=1e-12)
    expected = se3.so3_exp(jnp.asarray([0.0, 0.0, -yaw], F64)) @ pts[0]
    np.testing.assert_allclose(np.asarray(out.T[0]), np.asarray(expected),
                               atol=1e-12)


def test_planar_priors():
    L, h, _ = priors.planar_z_prior(jnp.asarray(0.5, F64), 0.0, 0.1, F64)
    np.testing.assert_allclose(float(L[2, 2]), 100.0, rtol=1e-12)
    np.testing.assert_allclose(float(h[2]), -50.0, rtol=1e-12)
    Lv, hv, _ = priors.velocity_z_prior(jnp.asarray(0.2, F64), 0.01, F64)
    np.testing.assert_allclose(float(Lv[8, 8]), 10000.0, rtol=1e-12)
    np.testing.assert_allclose(float(hv[8]), -2000.0, rtol=1e-12)


def test_select_kernel_interpret_matches_exact_topk():
    """The fused Pallas candidate-selection kernel (interpret mode) must
    recover the exact proxy top-k (recall >= the two-stage selection it
    replaces) and return exact -cost values at the returned indices.
    Production shapes: V/128 = 56 chunks, top-2 each -> misses need >= 3 of
    the true top-8 in one chunk (~0.5% of rows on random data)."""
    from fl_slam_tpu.ops import assoc_kernels

    N, V, k = 128, 1536, 8
    beta, rec_s, seq = 4.0, 0.002, 60
    rng = np.random.default_rng(0)
    mp = rng.normal(size=(N, 3)).astype(np.float32) * 5
    md = rng.normal(size=(N, 3)).astype(np.float32)
    md /= np.linalg.norm(md, axis=1, keepdims=True)
    mk = np.abs(rng.normal(size=N)).astype(np.float32)
    mk[::7] = 0.0
    packed = np.zeros((V, 17), np.float32)
    packed[:, 0:3] = rng.normal(size=(V, 3)) * 5
    d = rng.normal(size=(V, 3))
    packed[:, 3:6] = d / np.linalg.norm(d, axis=1, keepdims=True)
    packed[:, 6] = np.abs(rng.normal(size=V))
    packed[::5, 6] = 0.0
    packed[:, 14] = (rng.random(V) > 0.1).astype(np.float32)
    packed[:, 15] = rng.integers(0, 50, V)

    vals, idx = assoc_kernels.select_candidates(
        jnp.asarray(mp), jnp.asarray(md), jnp.asarray(mk),
        jnp.asarray(packed), jnp.asarray(seq, jnp.int32),
        k=k, cost_beta=beta, recency_scale=rec_s, interpret=True)

    x2 = (mp ** 2).sum(1)[:, None]
    m2 = (packed[:, 0:3] ** 2).sum(1)[None, :]
    d_pos = x2 + m2 - 2.0 * mp @ packed[:, 0:3].T
    ok = (mk[:, None] > 0) & (packed[None, :, 6] > 0)
    d_dir = np.where(ok, 0.5 * (1.0 - md @ packed[:, 3:6].T), 0.0)
    rec = rec_s * np.maximum(seq - packed[:, 15], 0.0)[None, :]
    C = (d_pos + beta * d_dir + rec
         + np.where(packed[:, 14] > 0.5, 0.0, 1e6)[None, :])
    order = np.argsort(C, axis=1, kind="stable")[:, :k]

    iv, vv = np.asarray(idx), np.asarray(vals)
    recall = np.mean([len(set(iv[i]) & set(order[i])) / k for i in range(N)])
    # V=1536 -> 12 chunks here (test-size density); production V=7168 -> 56
    # chunks measures 0.995. Bound at the two-stage selection's ~0.95.
    assert recall >= 0.95, recall
    # scores descending, exact at the returned indices
    assert (np.diff(vv, axis=1) <= 1e-6).all()
    err = np.abs(vv + np.take_along_axis(C, iv, axis=1)).max()
    assert err < 2e-3, err
