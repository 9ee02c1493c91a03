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

    def test_quat_to_rotvec(self):
        np.testing.assert_allclose(
            quat_xyzw_to_rotvec(np.array([0, 0, np.sin(0.2), np.cos(0.2)])),
            [0, 0, 0.4], atol=1e-12)
        np.testing.assert_allclose(
            quat_xyzw_to_rotvec(np.array([0.0, 0, 0, 1.0])), np.zeros(3))
