"""Bag io tests: CDR encode/decode roundtrips, native-vs-Python decoder
equivalence, and a synthetic ROS 2 .db3 bag read end-to-end into ScanInput."""

import os
import sqlite3

import numpy as np
import pytest

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io import cdr, native
from fl_slam_tpu.io.rosbag import (BagTopics, RosbagReader, load_scan_records,
                                   quat_xyzw_to_rotvec)

CFG = GCConfig.small()


class TestCDR:
    def test_imu_roundtrip(self, rng):
        gyro = rng.normal(0, 1, 3)
        accel = rng.normal(0, 1, 3)
        buf = cdr.encode_imu(12.345678, gyro, accel)
        m = cdr.decode_imu(buf)
        assert m.stamp == pytest.approx(12.345678, abs=1e-8)
        np.testing.assert_allclose(m.gyro, gyro)
        np.testing.assert_allclose(m.accel, accel)

    def test_odom_roundtrip(self, rng):
        pos = rng.normal(0, 1, 3)
        quat = rng.normal(0, 1, 4)
        quat /= np.linalg.norm(quat)
        pcov = rng.normal(0, 1, (6, 6))
        vel = rng.normal(0, 1, 3)
        omg = rng.normal(0, 1, 3)
        tcov = rng.normal(0, 1, (6, 6))
        buf = cdr.encode_odometry(99.5, pos, quat, pcov, vel, omg, tcov)
        m = cdr.decode_odometry(buf)
        assert m.stamp == pytest.approx(99.5, abs=1e-8)
        np.testing.assert_allclose(m.position, pos)
        np.testing.assert_allclose(m.quat_xyzw, quat)
        np.testing.assert_allclose(m.pose_cov, pcov)
        np.testing.assert_allclose(m.vel_body, vel)
        np.testing.assert_allclose(m.omega_body, omg)
        np.testing.assert_allclose(m.twist_cov, tcov)

    def test_pointcloud_roundtrip(self, rng):
        xyz = rng.normal(0, 5, (100, 3)).astype(np.float32)
        ring = (np.arange(100) % 16).astype(np.uint16)
        t = np.linspace(0, 0.1, 100).astype(np.float32)
        buf = cdr.encode_pointcloud2(7.25, xyz, ring=ring, point_time=t)
        msg = cdr.decode_pointcloud2(buf)
        assert msg.width == 100 and msg.point_step == 20
        f = cdr.pointcloud2_fields(msg, ["x", "y", "z", "ring", "time"])
        np.testing.assert_allclose(f["x"], xyz[:, 0])
        np.testing.assert_allclose(f["z"], xyz[:, 2])
        np.testing.assert_array_equal(f["ring"], ring)
        np.testing.assert_allclose(f["time"], t)


class TestNative:
    def test_native_built(self):
        assert native.have_native(), "run ./build_native.sh"

    def test_imu_batch_matches_python(self, rng):
        blobs = [cdr.encode_imu(float(i) + 0.5, rng.normal(0, 1, 3),
                                rng.normal(0, 1, 3)) for i in range(50)]
        out = native.decode_imu_batch(blobs)
        for i, b in enumerate(blobs):
            m = cdr.decode_imu(b)
            np.testing.assert_allclose(out[i, 0], m.stamp, atol=1e-8)
            np.testing.assert_allclose(out[i, 1:4], m.gyro)
            np.testing.assert_allclose(out[i, 4:7], m.accel)

    def test_odom_batch_matches_python(self, rng):
        blobs = []
        for i in range(20):
            q = rng.normal(0, 1, 4)
            q /= np.linalg.norm(q)
            blobs.append(cdr.encode_odometry(
                float(i), rng.normal(0, 1, 3), q, rng.normal(0, 1, (6, 6)),
                rng.normal(0, 1, 3), rng.normal(0, 1, 3),
                rng.normal(0, 1, (6, 6))))
        out = native.decode_odom_batch(blobs)
        for i, b in enumerate(blobs):
            m = cdr.decode_odometry(b)
            np.testing.assert_allclose(out[i, 1:4], m.position)
            np.testing.assert_allclose(out[i, 8:44], m.pose_cov.reshape(-1))
            np.testing.assert_allclose(out[i, 50:86], m.twist_cov.reshape(-1))

    def test_pointcloud_matches_python(self, rng):
        xyz = rng.normal(0, 5, (333, 3)).astype(np.float32)
        ring = (np.arange(333) % 16).astype(np.uint16)
        t = np.linspace(0, 0.1, 333).astype(np.float32)
        buf = cdr.encode_pointcloud2(3.5, xyz, ring=ring, point_time=t)
        stamp, nxyz, nt, nring = native.decode_pointcloud2(buf, 1000)
        assert stamp == pytest.approx(3.5, abs=1e-8)
        np.testing.assert_allclose(nxyz, xyz)
        np.testing.assert_allclose(nt, t)
        np.testing.assert_array_equal(nring, ring.astype(np.int32))

    def test_pointcloud_cap(self, rng):
        xyz = rng.normal(0, 5, (100, 3)).astype(np.float32)
        buf = cdr.encode_pointcloud2(1.0, xyz)
        _, nxyz, _, _ = native.decode_pointcloud2(buf, 40)
        assert nxyz.shape == (40, 3)

    def test_malformed_rejected(self):
        with pytest.raises(ValueError):
            native.decode_pointcloud2(b"\x00\x01\x00\x00\x01\x02", 10)


def _make_bag(tmp_path, rng, n_scans=4):
    """Write a minimal ROS 2 sqlite3 bag with lidar+imu+odom."""
    db = os.path.join(tmp_path, "synth_0.db3")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
                "type TEXT, serialization_format TEXT, "
                "offered_qos_profiles TEXT)")
    con.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, "
                "topic_id INTEGER, timestamp INTEGER, data BLOB)")
    topics = [(1, "/lidar", "sensor_msgs/msg/PointCloud2", "cdr", ""),
              (2, "/imu", "sensor_msgs/msg/Imu", "cdr", ""),
              (3, "/odom", "nav_msgs/msg/Odometry", "cdr", "")]
    con.executemany("INSERT INTO topics VALUES (?,?,?,?,?)", topics)
    mid = 0
    for i in range(n_scans):
        t0 = 100.0 + 0.1 * i
        xyz = rng.normal(0, 3, (500, 3)).astype(np.float32)
        tq = np.linspace(0, 0.09, 500).astype(np.float32)
        blob = cdr.encode_pointcloud2(t0, xyz, point_time=tq)
        mid += 1
        con.execute("INSERT INTO messages VALUES (?,?,?,?)",
                    (mid, 1, int(t0 * 1e9), blob))
        for j in range(20):
            ts = t0 + j * 0.005
            blob = cdr.encode_imu(ts, rng.normal(0, 0.01, 3),
                                  np.array([0, 0, 9.81]) + rng.normal(0, 0.01, 3))
            mid += 1
            con.execute("INSERT INTO messages VALUES (?,?,?,?)",
                        (mid, 2, int(ts * 1e9), blob))
        blob = cdr.encode_odometry(t0, np.array([0.1 * i, 0, 0]),
                                   np.array([0, 0, 0, 1.0]),
                                   np.eye(6) * 1e-4, np.array([1.0, 0, 0]),
                                   np.zeros(3), np.eye(6) * 1e-4)
        mid += 1
        con.execute("INSERT INTO messages VALUES (?,?,?,?)",
                    (mid, 3, int(t0 * 1e9), blob))
    con.commit()
    con.close()
    return tmp_path


class TestBagReader:
    def test_end_to_end_scan_records(self, tmp_path, rng):
        bag = _make_bag(str(tmp_path), rng)
        reader = RosbagReader(bag)
        assert "/lidar" in reader.topics()
        recs = load_scan_records(bag, BagTopics("/lidar", "/imu", "/odom"),
                                 CFG)
        T = recs["scan_start"].shape[0]
        assert T == 4
        assert recs["points"].shape == (T, CFG.n_points, 3)
        assert recs["imu_gyro"].shape == (T, CFG.imu_len, 3)
        # odom pose x advances 0.1/scan
        np.testing.assert_allclose(recs["odom_pose"][:, 0],
                                   0.1 * np.arange(T), atol=1e-9)
        # point weights positive for real points, imu stamps windowed
        # 500 raw points stride-resampled into the n_points budget
        expect = len(range(0, 500, max(1, -(-500 // CFG.n_points))))
        assert (recs["point_weights"][0] > 0).sum() == min(expect, CFG.n_points)
        st = recs["imu_stamps"][1]
        assert st[st > 0].min() >= recs["scan_start"][0] - 0.05 - 1e-6
        # scan records feed the device pipeline
        from fl_slam_tpu.io.rosbag import to_scan_inputs
        scans = to_scan_inputs(recs, CFG)
        assert scans.points.shape == (T, CFG.n_points, 3)
        # staging audit (wiring-auditor parity): consumed topics counted,
        # nothing dead-ended in this bag, staged bytes recorded
        audit = recs["__audit__"]
        assert audit["n_scans"] == T
        assert audit["consumed"]["/lidar"] == T
        assert audit["consumed"]["/imu"] > 0
        assert audit["missing_odom_scans"] == 0
        assert audit["dead_end_topics"] == []
        assert audit["staged_bytes"] > 0

    def test_native_staging_matches_python(self, tmp_path, rng):
        """The C++ single-pass staging kernel (gcio_stage_lidar_batch) must
        reproduce the Python staging loop exactly — including nonfinite
        sentinel handling, range-weight sigmoids, budget resample, IMU
        windows, closest-odom selection and the audit counters."""
        if not native.have_native_staging():
            pytest.skip("native staging not built")
        bag = _make_bag(str(tmp_path), rng, n_scans=5)
        topics = BagTopics("/lidar", "/imu", "/odom")
        rn = load_scan_records(bag, topics, CFG, native_staging=True)
        rp = load_scan_records(bag, topics, CFG, native_staging=False)
        an, ap = rn.pop("__audit__"), rp.pop("__audit__")
        assert an["staging_backend"] == "native"
        assert ap["staging_backend"] == "python"
        for k in ("nonfinite_points_total", "imu_windows_saturated",
                  "missing_odom_scans", "n_scans"):
            assert an[k] == ap[k], (k, an[k], ap[k])
        for k in sorted(rp):
            a, b = np.asarray(rn[k]), np.asarray(rp[k])
            assert a.shape == b.shape, (k, a.shape, b.shape)
            # identical math; the only fp divergence is the staging kernel's
            # range-reduced exp (|rel| < 1e-14) and summation order
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12,
                                       err_msg=k)

    def test_native_staging_nonfinite_and_chunks(self, tmp_path, rng):
        """Sentinel semantics and cross-chunk prev_t threading: a bag with
        NaN/inf points staged in 2-scan native chunks equals the python
        loop."""
        if not native.have_native_staging():
            pytest.skip("native staging not built")
        import sqlite3 as _sq
        db = os.path.join(str(tmp_path), "synth_0.db3")
        con = _sq.connect(db)
        con.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
                    "type TEXT, serialization_format TEXT, "
                    "offered_qos_profiles TEXT)")
        con.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, "
                    "topic_id INTEGER, timestamp INTEGER, data BLOB)")
        con.execute("INSERT INTO topics VALUES (1, '/lidar', "
                    "'sensor_msgs/msg/PointCloud2', 'cdr', '')")
        mid = 0
        for i in range(5):
            t0 = 50.0 + 0.1 * i
            xyz = rng.normal(0, 3, (200, 3)).astype(np.float32)
            xyz[3, 0] = np.nan
            xyz[7, 1] = np.inf
            xyz[9, 2] = -np.inf
            xyz[9, 0] = 0.0
            blob = cdr.encode_pointcloud2(t0, xyz)
            mid += 1
            con.execute("INSERT INTO messages VALUES (?,?,?,?)",
                        (mid, 1, int(t0 * 1e9), blob))
        con.commit()
        con.close()
        topics = BagTopics("/lidar", "/imu_none", "/odom_none")
        bag = str(tmp_path)
        rn = load_scan_records(bag, topics, CFG, native_staging=True)
        rp = load_scan_records(bag, topics, CFG, native_staging=False)
        an, ap = rn.pop("__audit__"), rp.pop("__audit__")
        assert an["nonfinite_points_total"] == ap["nonfinite_points_total"] \
            == 15
        assert an["missing_odom_scans"] == ap["missing_odom_scans"] == 5
        for k in sorted(rp):
            np.testing.assert_allclose(np.asarray(rn[k]), np.asarray(rp[k]),
                                       rtol=1e-12, atol=1e-12, err_msg=k)

        # prev_t threads across chunk boundaries: chunk=2 == one-shot
        # (_native_stage_loop output is pre-rebase; apply the same origin)
        from fl_slam_tpu.io.rosbag import (RosbagReader, _native_stage_loop,
                                           _rebase_times)
        reader = RosbagReader(bag)
        audit = {"nonfinite_points_total": 0, "imu_windows_saturated": 0,
                 "missing_odom_scans": 0}
        r2 = _native_stage_loop(reader, topics, CFG, np.eye(3), np.zeros(3),
                                np.zeros((0, 7)), np.zeros((0, 86)), None,
                                60000, dict(audit), chunk=2)
        _rebase_times(r2, an["time_origin"])
        for k in sorted(r2):
            np.testing.assert_allclose(r2[k], np.asarray(rn[k]),
                                       rtol=0, atol=0, err_msg=k)

    def test_quat_to_rotvec(self):
        np.testing.assert_allclose(
            quat_xyzw_to_rotvec(np.array([0, 0, np.sin(0.2), np.cos(0.2)])),
            [0, 0, 0.4], atol=1e-12)
        np.testing.assert_allclose(
            quat_xyzw_to_rotvec(np.array([0.0, 0, 0, 1.0])), np.zeros(3))


def _checker_rgb(w, h, seed=0):
    """Random-dot RGB uint8 — dense FAST-9 corners for the extractor
    (checkerboard X-corners lack the contiguous bright/dark arc FAST needs)."""
    r = np.random.default_rng(seed)
    img = ((r.random((h, w)) > 0.7) * 255).astype(np.uint8)
    return np.stack([img, img, img], axis=-1)


def _make_camera_bag(tmp_path, rng, n_scans=3, w=160, h=120):
    """Bag with lidar+imu+odom AND compressed RGB + 16UC1 depth topics."""
    import io as _io

    from PIL import Image
    bag = _make_bag(tmp_path, rng, n_scans=n_scans)
    db = os.path.join(bag, "synth_0.db3")
    con = sqlite3.connect(db)
    con.executemany("INSERT INTO topics VALUES (?,?,?,?,?)", [
        (4, "/cam/rgb", "sensor_msgs/msg/CompressedImage", "cdr", ""),
        (5, "/cam/depth", "sensor_msgs/msg/Image", "cdr", "")])
    mid = 100000
    rgb = _checker_rgb(w, h)
    buf = _io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=92)
    jpeg = buf.getvalue()
    depth_mm = np.full((h, w), 2500, dtype=np.uint16)   # 2.5 m everywhere
    for i in range(n_scans):
        # rgb 12 ms after the scan clock, depth 8 ms after rgb (pair <=50 ms)
        t_rgb = 100.0 + 0.1 * i + 0.012
        t_dep = t_rgb + 0.008
        mid += 1
        con.execute("INSERT INTO messages VALUES (?,?,?,?)",
                    (mid, 4, int(t_rgb * 1e9),
                     cdr.encode_compressed_image(t_rgb, jpeg)))
        mid += 1
        con.execute("INSERT INTO messages VALUES (?,?,?,?)",
                    (mid, 5, int(t_dep * 1e9),
                     cdr.encode_image(t_dep, depth_mm, "16UC1")))
    con.commit()
    con.close()
    return bag


class TestCameraBag:
    """The real-bag camera path (parity: camera_rgbd_node.cpp:49-90 decode +
    stamp pairing -> visual features -> camera slice)."""

    def test_camera_cdr_roundtrip(self):
        d = (np.arange(12, dtype=np.uint16) * 100).reshape(3, 4)
        m = cdr.decode_image(cdr.encode_image(3.25, d, "16UC1"))
        assert m.encoding == "16UC1" and m.stamp == pytest.approx(3.25)
        np.testing.assert_allclose(cdr.depth_image_to_m(m),
                                   d.astype(np.float32) * 1e-3)
        c = cdr.decode_compressed_image(
            cdr.encode_compressed_image(9.125, b"PAYLOAD"))
        assert c.data == b"PAYLOAD" and c.stamp == pytest.approx(9.125)

    def test_camera_slice_from_bag(self, tmp_path, rng):
        from fl_slam_tpu.camera.features import PinholeIntrinsics
        from fl_slam_tpu.io.rosbag import CameraTopics
        w, h = 160, 120
        bag = _make_camera_bag(str(tmp_path), rng)
        intr = PinholeIntrinsics(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                 width=w, height=h)
        recs = load_scan_records(
            bag, BagTopics("/lidar", "/imu", "/odom"), CFG,
            cam_topics=CameraTopics("/cam/rgb", "/cam/depth"),
            intrinsics=intr, T_base_cam=np.eye(4))
        audit = recs["__audit__"]
        assert audit["camera_pairs"] == 3
        assert audit["camera_scans"] == 3
        nv = recs["cam_valid"].sum(axis=1)
        assert (nv > 0).all(), nv          # every scan got features
        # valid features carry positive-definite position info at ~2.5 m
        i, j = 0, int(np.argmax(recs["cam_valid"][0]))
        Lam = recs["cam_Lambdas"][i, j]
        assert np.linalg.eigvalsh(Lam).min() > 0
        mu = np.linalg.solve(Lam, recs["cam_thetas"][i, j])
        assert 1.5 < mu[2] < 3.5           # depth recovered (camera z fwd)
        # weights only on valid rows
        assert (recs["cam_weights"][recs["cam_valid"] < 0.5] == 0).all()

    def test_no_camera_frames_within_window(self, tmp_path, rng):
        """Scans far from any camera frame stage a zero camera slice."""
        from fl_slam_tpu.camera.features import PinholeIntrinsics
        from fl_slam_tpu.io.rosbag import CameraTopics
        bag = _make_bag(str(tmp_path), rng, n_scans=2)
        intr = PinholeIntrinsics(fx=100.0, fy=100.0, cx=80, cy=60,
                                 width=160, height=120)
        recs = load_scan_records(
            bag, BagTopics("/lidar", "/imu", "/odom"), CFG,
            cam_topics=CameraTopics("/cam/rgb", "/cam/depth"),
            intrinsics=intr, T_base_cam=np.eye(4))
        assert recs["__audit__"]["camera_scans"] == 0
        assert recs["cam_valid"].sum() == 0

    def test_load_calibration(self, tmp_path):
        import json
        from fl_slam_tpu.io.rosbag import load_calibration
        T = np.eye(4)
        T[:3, 3] = [0.1, 0.0, 0.2]
        path = os.path.join(str(tmp_path), "calib.json")
        with open(path, "w") as fh:
            json.dump({"T_base_lidar": T.tolist(),
                       "intrinsics": {"fx": 380.0, "fy": 380.0, "cx": 320.0,
                                      "cy": 240.0, "width": 640,
                                      "height": 480}}, fh)
        c = load_calibration(path)
        np.testing.assert_allclose(c["T_base_lidar"], T)
        assert c["intrinsics"].fx == 380.0
        bad = os.path.join(str(tmp_path), "bad.json")
        with open(bad, "w") as fh:
            json.dump({"T_base_cam": (2 * np.eye(4)).tolist()}, fh)
        with pytest.raises(ValueError):
            load_calibration(bad)


def test_scan_input_segments_pad_and_cover(tmp_path):
    """Segment generator: fixed shapes, tail padded by repeating the last
    scan, concatenated prefix equals the monolithic staging."""
    import jax
    import jax.numpy as jnp
    from fl_slam_tpu.io.rosbag import (BagTopics, load_scan_records,
                                       scan_input_segments, to_scan_inputs)
    rng = np.random.default_rng(5)
    d = str(tmp_path / "bag")
    os.makedirs(d)
    _make_bag(d, rng, n_scans=7)
    cfg = CFG
    recs = load_scan_records(d, BagTopics("/lidar", "/imu", "/odom"), cfg)
    T = recs["scan_start"].shape[0]
    segs = list(scan_input_segments(recs, cfg, seg_len=3))
    assert len(segs) == -(-T // 3)
    for s in segs:
        assert s.scan_start.shape[0] == 3
    whole = to_scan_inputs(recs, cfg)
    cat = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *segs)
    np.testing.assert_allclose(
        np.asarray(cat.points[:T]), np.asarray(whole.points), atol=0)
    # tail padding repeats the final scan
    tail = np.asarray(cat.points[T:])
    np.testing.assert_allclose(
        tail, np.broadcast_to(np.asarray(whole.points[-1]), tail.shape),
        atol=0)


def test_smoothed_initial_anchor_debiases_first_odom():
    """Smoothed anchor (backend_node.py:1467-1513 parity): weighted first-K
    odom mean beats the raw (noisy) first sample, IMU stability weights
    downweight ringing scans, z pins to the planar reference."""
    from fl_slam_tpu.io.rosbag import smoothed_initial_anchor

    rng = np.random.default_rng(0)
    K, L = 10, 16
    true_pose = np.array([1.0, 2.0, 0.0, 0.0, 0.0, 0.3])
    poses = np.tile(true_pose, (K, 1)) + rng.normal(0, 0.01, (K, 6))
    poses[0] += np.array([0.5, -0.4, 0.2, 0.0, 0.0, 0.2])  # noisy first msg
    stamps = np.arange(K) * 0.1
    imu_t = stamps[:, None] + np.linspace(0.001, 0.099, L)[None, :]
    gyro = rng.normal(0, 0.005, (K, L, 3))
    accel = np.zeros((K, L, 3))
    accel[..., 2] = 9.81
    # scan 0 is also ringing: big gyro + off-gravity accel at every sample
    gyro[0] += 3.0
    accel[0, :, 2] += 4.0
    recs = {"odom_pose": poses, "scan_start": stamps, "imu_stamps": imu_t,
            "imu_gyro": gyro, "imu_accel": accel}
    anchor = smoothed_initial_anchor(recs, CFG)
    err_smooth = np.linalg.norm(anchor[:2] - true_pose[:2])
    err_first = np.linalg.norm(poses[0, :2] - true_pose[:2])
    assert err_smooth < 0.2 * err_first
    assert abs(anchor[5] - true_pose[5]) < 0.05
    assert anchor[2] == CFG.planar_z_ref
    # all-invalid IMU -> uniform weights, still finite and sane
    recs["imu_stamps"] = np.zeros_like(imu_t)
    anchor_u = smoothed_initial_anchor(recs, CFG)
    assert np.isfinite(anchor_u).all()


class TestF32StagingParity:
    """The f32-output staging kernel (inline time rebase, the streaming
    upload fast path) must equal the f64 path + host rebase + f32 convert
    EXACTLY: staging math stays f64 in both, rounding to f32 happens once
    either way."""

    def test_f32_equals_f64_then_convert(self, tmp_path, rng):
        if not native.have_native_staging_f32():
            pytest.skip("native f32 staging not built")
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from tools.bench_staging import make_bag
        from fl_slam_tpu.io.rosbag import (TIME_REBASE_MARGIN_S,
                                           StreamingStager)
        import dataclasses
        td = str(tmp_path)
        make_bag(td, 12, 64, 48, rng, 4096)
        topics = BagTopics("/lidar", "/imu", "/odom")
        cfg32 = dataclasses.replace(CFG, dtype="float32")
        st32 = StreamingStager(td, topics, cfg32, seg_len=5,
                               upload_quant=False)
        segs32 = list(st32)
        st64 = StreamingStager(td, topics, CFG, seg_len=5,
                               native_staging=False)
        segs64 = list(st64)
        assert st32.time_origin == pytest.approx(st64.time_origin, abs=1e-9)
        assert len(segs32) == len(segs64)
        for a, b in zip(segs32, segs64):
            for f in a._fields:
                va = np.asarray(getattr(a, f))
                vb = np.asarray(getattr(b, f)).astype(np.float32)
                np.testing.assert_array_equal(
                    va, vb, err_msg=f"field {f} differs (f32 path must be "
                    "a single final rounding of the f64 path)")


    def test_quantized_upload_within_bounds(self, tmp_path, rng):
        """The u16-quantized segment upload must agree with the exact f32
        path within the documented quantization steps (points 1.95 mm,
        weights 6.1e-5, gyro 4.9e-4, accel 2e-3, stamps 1.8e-6 s)."""
        if not native.have_native_staging_f32():
            pytest.skip("native f32 staging not built")
        import dataclasses
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from tools.bench_staging import make_bag
        from fl_slam_tpu.io.rosbag import StreamingStager
        td = str(tmp_path)
        make_bag(td, 10, 64, 48, rng, 4096)
        topics = BagTopics("/lidar", "/imu", "/odom")
        cfg32 = dataclasses.replace(CFG, dtype="float32")
        exact = list(StreamingStager(td, topics, cfg32, seg_len=5,
                                     upload_quant=False))
        quant = list(StreamingStager(td, topics, cfg32, seg_len=5,
                                     upload_quant=True))
        base = {"points": (-64.0, 64.0), "point_weights": (0.0, 4.0),
                "imu_gyro": (-16.0, 16.0), "imu_accel": (-64.0, 64.0),
                "point_stamps": (0.0, 0.12)}
        def step_for(f, va, rel=None):
            lo0, hi0 = base[f]
            v = va if rel is None else va - rel
            lo = min(lo0, float(v.min())); hi = max(hi0, float(v.max()))
            return (hi - lo) / 65535.0
        steps = base  # keys only; tolerance computed per segment below
        for a, b in zip(exact, quant):
            for f in a._fields:
                va = np.asarray(getattr(a, f))
                vb = np.asarray(getattr(b, f))
                if f in steps:
                    # pads may be clipped to the range floor; compare only
                    # weight-carrying entries for per-point fields
                    rel = (np.asarray(a.scan_start)[:, None]
                           if f == "point_stamps" else None)
                    tol = step_for(f, va, rel) * 0.75 + 1e-5
                    if f.startswith("point"):
                        m = np.asarray(a.point_weights) > 1e-9
                        if va.ndim == 3:
                            m = m[..., None]
                        assert np.abs(np.where(m, va - vb, 0.0)).max() \
                            <= tol, f
                    else:
                        assert np.abs(va - vb).max() <= tol, f
                else:
                    np.testing.assert_array_equal(va, vb, err_msg=f)
