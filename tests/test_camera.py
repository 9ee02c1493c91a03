"""Camera path tests: ORB feature extraction on a synthetic RGBD render,
lidar-depth fusion, camera-slice fields, and the e2e camera-enabled replay."""

import jax.numpy as jnp
import numpy as np
import pytest

from fl_slam_tpu.camera.depth_fusion import (camera_slice_fields,
                                             lidar_depth_evidence,
                                             splat_prep_fused)
from fl_slam_tpu.camera.features import (PinholeIntrinsics,
                                         backprojection_cov,
                                         extract_features)
from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io.synthetic import (T_BASE_CAM, _R_to_rotvec, _rotvec_R,
                                      render_rgbd, simulate)

CFG = GCConfig.small()
INTR = PinholeIntrinsics(fx=192.0, fy=192.0, cx=160.0, cy=120.0,
                         width=320, height=240)


@pytest.fixture(scope="module")
def rgbd():
    ds = simulate(CFG, n_scans=2, seed=0)
    pose_b = ds.gt_poses[0]
    Tb = np.eye(4)
    Tb[:3, :3] = _rotvec_R(pose_b[3:6])
    Tb[:3, 3] = pose_b[:3]
    Tc = Tb @ T_BASE_CAM
    pose_c = np.concatenate([Tc[:3, 3], _R_to_rotvec(Tc[:3, :3])])
    rgb, depth = render_rgbd(pose_c, INTR, ds.planes)
    return rgb, depth, pose_c, ds


class TestFeatures:
    def test_extract_features_consistent_backprojection(self, rgbd):
        rgb, depth, _, _ = rgbd
        feats = extract_features(rgb, depth, INTR, CFG.n_feat)
        assert feats.valid.sum() >= 5
        v = feats.valid
        # depth naturals consistent: theta = lambda * z
        np.testing.assert_allclose(feats.depth_theta[v],
                                   feats.depth_lambda[v] * feats.z[v],
                                   rtol=1e-9)
        # backprojection matches the measured depth image within the local fit
        for i in np.flatnonzero(v)[:10]:
            u, vv_ = feats.uv[i]
            z_img = depth[int(round(vv_)), int(round(u))]
            assert abs(feats.z[i] - z_img) < 0.3
        # covariance grows with depth^2 in x/y
        cov_xy = feats.cov_cam[v][:, 0, 0]
        assert np.all(cov_xy > 0)

    def test_backprojection_cov_formula(self):
        cov = backprojection_cov(200.0, 140.0, 2.0, INTR, 1.0, 0.01)
        # dz variance passes through
        assert cov[2, 2] == pytest.approx(1e-4)
        # x variance: (z/fx)^2 sigma_px^2 + ((u-cx)/fx)^2 sigma_z^2
        exp = (2.0 / 192.0) ** 2 + ((200 - 160) / 192.0) ** 2 * 1e-4
        assert cov[0, 0] == pytest.approx(exp, rel=1e-9)


class TestDepthFusion:
    def test_lidar_route_recovers_depth(self, rgbd):
        rgb, depth, pose_c, ds = rgbd
        feats = extract_features(rgb, depth, INTR, CFG.n_feat)
        v = np.flatnonzero(feats.valid)
        # synthesize lidar points exactly on the observed surfaces
        iu = feats.uv[v].round().astype(int)
        z_true = depth[iu[:, 1], iu[:, 0]]
        rays = np.stack([(feats.uv[v, 0] - INTR.cx) / INTR.fx,
                         (feats.uv[v, 1] - INTR.cy) / INTR.fy,
                         np.ones(len(v))], axis=1)
        pts_cam = rays * z_true[:, None]
        # jitter into a neighborhood cloud
        rng = np.random.default_rng(0)
        cloud = np.concatenate([
            pts_cam + rng.normal(0, 0.01, pts_cam.shape) for _ in range(5)])
        lam, the, sup = lidar_depth_evidence(feats.uv, feats.valid, cloud,
                                             INTR)
        got = lam[v] > 0
        assert got.mean() > 0.5
        z_est = the[v][got] / lam[v][got]
        assert np.median(np.abs(z_est - z_true[got])) < 0.1

    def test_fused_slice_fields_shapes(self, rgbd):
        rgb, depth, _, _ = rgbd
        feats = extract_features(rgb, depth, INTR, CFG.n_feat)
        fused = splat_prep_fused(feats, INTR, None)
        fields = camera_slice_fields(fused, T_BASE_CAM, CFG.vmf_n_lobes)
        N = CFG.n_feat
        assert fields["Lambdas"].shape == (N, 3, 3)
        assert fields["etas"].shape == (N, CFG.vmf_n_lobes, 3)
        ok = fields["valid"]
        assert ok.sum() >= 5
        # info form consistent: mu = Lambda^-1 theta finite and in front of
        # the robot (camera looks along +x body)
        mu = np.linalg.solve(fields["Lambdas"][ok] + 1e-12 * np.eye(3),
                             fields["thetas"][ok][..., None])[..., 0]
        assert np.isfinite(mu).all()
        assert (mu[:, 0] > 0).mean() > 0.9


@pytest.mark.slow
class TestCameraE2E:
    def test_camera_slice_enters_pipeline(self):
        from fl_slam_tpu.io.synthetic import to_scan_inputs
        from fl_slam_tpu.pipeline import init_state, process_scan
        ds = simulate(CFG, n_scans=2, seed=1, with_camera=True)
        assert ds.scans["cam_valid"].sum() > 0
        scans = to_scan_inputs(ds, CFG)
        anchor0 = jnp.asarray(ds.gt_poses[0], dtype=CFG.jdtype)
        state = init_state(CFG, anchor0=anchor0,
                           t0=float(ds.gt_stamps[0]) - 0.1)
        import jax
        state, out = process_scan(state, jax.tree.map(lambda a: a[0], scans),
                                  CFG)
        state, out = process_scan(state, jax.tree.map(lambda a: a[1], scans),
                                  CFG)
        assert np.isfinite(np.asarray(out.pose)).all()
        # camera mass reached the map (color provenance); the resident slabs
        # must be flushed before reading the pool mid-stream.
        from fl_slam_tpu.pipeline import flush_slabs
        state = flush_slabs(state)
        assert float(jnp.sum(state.atlas.cam_mass)) > 0.0


@pytest.mark.slow
class TestCameraWinsCorridor:
    """The camera-advantaged scenario (round-3 verdict item 5): a
    degenerate-geometry corridor (io/synthetic world='corridor') where
    lidar surfels only see two smooth parallel walls + ground — along-track
    translation is unobservable from geometry and lidar-only SLAM inherits
    the odometry's along-track drift. The camera's texture landmarks on
    those walls DO constrain along-track; camera-on must beat camera-off
    by >20% translation ATE."""

    def test_camera_beats_lidar_only(self):
        import jax

        from fl_slam_tpu.eval.metrics import ate
        from fl_slam_tpu.io.synthetic import to_scan_inputs
        from fl_slam_tpu.pipeline import init_state, replay
        res = {}
        for cam in (False, True):
            ds = simulate(CFG, n_scans=50, seed=3, world="corridor",
                          odom_drift_vel_scale=1.06, with_camera=cam)
            scans = to_scan_inputs(ds, CFG)
            st = init_state(CFG,
                            anchor0=jnp.asarray(ds.gt_poses[0], CFG.jdtype),
                            t0=float(ds.gt_stamps[0]) - 0.1)
            _, outs = replay(st, scans, CFG)
            m = ate(np.asarray(outs.pose), ds.gt_poses, align="initial")
            res[cam] = m
        off = res[False]["trans"]["rmse"]
        on = res[True]["trans"]["rmse"]
        # lidar-only must actually be along-track-blind here (x dominates)
        ax = res[False]["trans_axis_rmse"]
        assert ax["x"] > 5.0 * max(ax["y"], 1e-6), ax
        assert on < 0.8 * off, (on, off)


class TestNativeExtractor:
    def test_native_matches_orb_contract(self, rgbd):
        """The C++ FAST-9 path fills the same contract as the ORB path:
        valid features with finite consistent backprojections and positive
        depth precision."""
        from fl_slam_tpu.camera.features import extract_features
        rgb, depth, _, _ = rgbd
        for backend in ("native", "orb"):
            feats = extract_features(rgb, depth, INTR, CFG.n_feat,
                                     backend=backend)
            v = np.flatnonzero(feats.valid)
            assert len(v) >= 2, backend
            uv = feats.uv[v]
            z = feats.z[v]
            assert np.all(z > 0), backend
            assert np.all(feats.depth_lambda[v] > 0), backend
            x_expect = (uv[:, 0] - INTR.cx) * z / INTR.fx
            np.testing.assert_allclose(feats.xyz_cam[v, 0], x_expect,
                                       atol=1e-9, err_msg=backend)
            # covariances PSD
            eig = np.linalg.eigvalsh(feats.cov_cam[v])
            assert np.all(eig > -1e-12), backend

    def test_native_depth_agrees_with_image(self, rgbd):
        from fl_slam_tpu.camera.features import extract_features
        rgb, depth, _, _ = rgbd
        feats = extract_features(rgb, depth, INTR, CFG.n_feat,
                                 backend="native")
        v = np.flatnonzero(feats.valid)
        for j in v[:8]:
            u, vv = feats.uv[j].astype(int)
            patch = depth[max(vv - 1, 0):vv + 2, max(u - 1, 0):u + 2]
            good = patch[np.isfinite(patch) & (patch > 1e-3)]
            assert abs(feats.z[j] - np.median(good)) < 0.6



class TestNativeDepthEvidence:
    """Native (C++) lidar_depth_evidence vs the authoritative Python loop
    (camera/depth_fusion.py): identical candidate sets (the grid bins are a
    superset filter over the exact du^2+dv^2 < r^2 predicate), tolerance-
    level agreement on the continuous Route A/B outputs (the closed-form
    3x3 eigensolve differs from LAPACK in the last digits)."""

    def test_parity_production_budgets(self):
        from fl_slam_tpu.camera.features import _gcvision
        if _gcvision() is None or not hasattr(_gcvision(),
                                              "gcv_lidar_depth_evidence"):
            pytest.skip("native library not built")
        rng = np.random.default_rng(1)
        w, h = 640, 480
        intr = PinholeIntrinsics(fx=300., fy=300., cx=w / 2, cy=h / 2,
                                 width=w, height=h)
        N, M = 512, 8192
        uv = np.column_stack([rng.uniform(0, w, N), rng.uniform(0, h, N)])
        valid = rng.random(N) > 0.1
        z = rng.uniform(0.5, 6.0, M)
        u = rng.uniform(-20, w + 20, M)
        v = rng.uniform(-20, h + 20, M)
        pts = np.column_stack([(u - intr.cx) * z / intr.fx,
                               (v - intr.cy) * z / intr.fy, z])
        pts[rng.random(M) < 0.05, 2] = -1.0     # behind-camera points
        lam_n, the_n, sup_n = lidar_depth_evidence(uv, valid, pts, intr,
                                                   native=True)
        lam_p, the_p, sup_p = lidar_depth_evidence(uv, valid, pts, intr,
                                                   native=False)
        np.testing.assert_array_equal(sup_n, sup_p)
        np.testing.assert_allclose(lam_n, lam_p, rtol=1e-4, atol=1e-9)
        np.testing.assert_allclose(the_n, the_p, rtol=1e-4, atol=1e-9)

    def test_empty_and_no_support(self):
        intr = PinholeIntrinsics(fx=300., fy=300., cx=320., cy=240.,
                                 width=640, height=480)
        uv = np.array([[320.0, 240.0]])
        valid = np.array([True])
        lam, the, sup = lidar_depth_evidence(uv, valid, np.zeros((0, 3)),
                                             intr, native=True)
        assert lam[0] == 0.0 and sup[0] == 0
        # all points behind the camera
        pts = np.array([[0.0, 0.0, -2.0]] * 10)
        lam, the, sup = lidar_depth_evidence(uv, valid, pts, intr,
                                             native=True)
        assert lam[0] == 0.0 and sup[0] == 0


class TestFeatureSidecar:
    """Per-bag feature cache (camera/feature_cache.py): one-time host pass,
    then staged camera fields match the live path (within the sidecar's f32
    storage of the appearance fields); stale stamps are rejected."""

    def test_roundtrip_and_staleness(self, tmp_path):
        import sys
        sys.path.insert(0, str(
            __import__("pathlib").Path(__file__).resolve().parents[1]))
        from tools.bench_staging import make_bag
        from fl_slam_tpu.camera.feature_cache import (build_sidecar,
                                                      load_sidecar,
                                                      sidecar_path)
        from fl_slam_tpu.io.rosbag import (BagTopics, CameraTopics,
                                           load_scan_records)
        cfg = GCConfig.small()
        rng = np.random.default_rng(0)
        td = str(tmp_path)
        w, h = 160, 120
        make_bag(td, 8, w, h, rng, 2048)
        topics = BagTopics("/lidar", "/imu", "/odom")
        cam = CameraTopics("/cam/rgb", "/cam/depth")
        intr = PinholeIntrinsics(fx=120., fy=120., cx=w / 2, cy=h / 2,
                                 width=w, height=h)
        live = load_scan_records(td, topics, cfg, cam_topics=cam,
                                 intrinsics=intr)
        assert "camera_feature_cache" not in live["__audit__"]
        p = build_sidecar(td, cam, intr, cfg.n_feat)
        cached = load_scan_records(td, topics, cfg, cam_topics=cam,
                                   intrinsics=intr)
        assert cached["__audit__"]["camera_feature_cache"] == p
        for k in ("cam_Lambdas", "cam_thetas", "cam_etas", "cam_weights",
                  "cam_valid"):
            a, b = live[k], cached[k]
            scale = max(np.abs(a).max(), 1e-9)
            assert np.abs(a - b).max() / scale < 2e-4, k
        # stale sidecar (wrong stamps) must be ignored
        import numpy as _np
        db = sorted(__import__("glob").glob(td + "/*.db3"))[0]
        sp = sidecar_path(db, cam.rgb)
        with _np.load(sp) as z:
            data = {k: z[k] for k in z.files}
        data["rgb_stamps"] = data["rgb_stamps"] + 1.0
        _np.savez_compressed(sp, **data)
        stale = load_scan_records(td, topics, cfg, cam_topics=cam,
                                  intrinsics=intr)
        assert "camera_feature_cache" not in stale["__audit__"]


@pytest.mark.slow
class TestCameraProductionClaim:
    """THE camera truth table's enforcement (round-4 verdict item 4): one
    production camera-on claim, gated. Camera-on must stay within 1.5x of
    camera-off translation on the lidar-rich drifting benchmark (its win
    case — lidar-degenerate geometry — is gated by TestCameraWinsCorridor).
    TPU-gated: production budgets (GC_TESTS_TPU=1 to run)."""

    @pytest.mark.skipif(
        __import__("jax").default_backend() != "tpu",
        reason="production-budget accuracy gate needs the TPU")
    def test_camera_on_in_band(self):
        import jax.numpy as jnp

        from fl_slam_tpu.eval.metrics import ate
        from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
        from fl_slam_tpu.pipeline import init_state, replay_jit

        cfg = GCConfig.tpu()
        res = {}
        for cam in (False, True):
            ds = simulate(cfg, n_scans=200, seed=0, with_camera=cam,
                          odom_drift_vel_scale=1.03, odom_drift_yaw_rate=0.01)
            scans = to_scan_inputs(ds, cfg)
            state = init_state(
                cfg, anchor0=jnp.asarray(ds.gt_poses[0], cfg.jdtype),
                t0=float(ds.gt_stamps[0]) - 0.1)
            run = replay_jit(cfg)
            state, outs = run(state, scans)
            m = ate(np.asarray(outs.pose), ds.gt_poses, align="initial")
            res[cam] = m
        on, off = res[True], res[False]
        assert on["trans"]["rmse"] < 0.30, on["trans"]
        assert on["rot_deg"]["rmse"] < 3.0, on["rot_deg"]
        assert on["trans"]["rmse"] < 1.5 * off["trans"]["rmse"] + 0.02, (
            on["trans"]["rmse"], off["trans"]["rmse"])
