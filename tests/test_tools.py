"""Tool-level tests (parity: reference ``tools/tests/``): the rig-prep
converters and the dead-reckon forensic, driven end-to-end through their
CLIs on synthetic fixtures."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **kw):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, cwd=REPO, env=env, timeout=300, **kw)


class TestConvertCalibration:
    def test_kimera_yaml_roundtrip(self, tmp_path):
        import yaml
        th = 0.3
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1.0]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = [0.1, -0.2, 0.5]
        doc = {"transforms": [
            {"name": "T_baselink_lidar", "T": T.tolist()},
            {"name": "T_cameralink_cam", "T": np.eye(4).tolist()},
        ]}
        yp = tmp_path / "extrinsics.yaml"
        yaml.safe_dump(doc, open(yp, "w"))
        out = tmp_path / "rig.json"
        r = _run(["tools/convert_calibration.py", str(yp), "-o", str(out),
                  "--fx", "380", "--fy", "380", "--cx", "320", "--cy", "240",
                  "--wh", "640", "480"])
        assert r.returncode == 0, r.stderr
        rig = json.load(open(out))
        np.testing.assert_allclose(np.asarray(rig["T_base_lidar"]), T,
                                   atol=1e-12)
        assert rig["intrinsics"]["fx"] == 380.0

        # the output must load through the real ingestion path
        from fl_slam_tpu.io.rosbag import load_calibration
        cal = load_calibration(str(out))
        np.testing.assert_allclose(cal["T_base_lidar"], T, atol=1e-12)
        assert cal["intrinsics"].width == 640

    def test_rejects_non_rigid_transform(self, tmp_path):
        import yaml
        T = np.eye(4)
        T[0, 0] = 2.0  # scaled: not a rotation
        yp = tmp_path / "bad.yaml"
        yaml.safe_dump({"transforms": [
            {"name": "T_baselink_lidar", "T": T.tolist()}]}, open(yp, "w"))
        out = tmp_path / "rig.json"
        r = _run(["tools/convert_calibration.py", str(yp), "-o", str(out)])
        assert r.returncode == 0  # converter writes; the LOADER gates
        from fl_slam_tpu.io.rosbag import load_calibration
        with pytest.raises(ValueError):
            load_calibration(str(out))


class TestConvertGT:
    def test_kimera_ns_csv(self, tmp_path):
        src = tmp_path / "gt.csv"
        with open(src, "w") as fh:
            fh.write("#timestamp_kf,x,y,z,qw,qx,qy,qz\n")
            for i in range(30):
                fh.write(f"{10**18 + i * 10**8},{0.1*i},{0.05*i},0,"
                         f"1,0,0,0\n")
        dst = tmp_path / "gt.tum"
        r = _run(["tools/convert_gt.py", str(src), str(dst)])
        assert r.returncode == 0, r.stderr
        rows = np.loadtxt(dst)
        assert rows.shape == (30, 8)
        assert abs(rows[0, 0] - 1e9) < 1.0          # ns -> s
        np.testing.assert_allclose(rows[:, 7], 1.0)  # qw last (TUM order)

    def test_tum_passthrough_sorts_and_normalizes(self, tmp_path):
        src = tmp_path / "gt_unsorted.tum"
        with open(src, "w") as fh:
            fh.write("# timestamp x y z qx qy qz qw\n")
            fh.write("2.0 1 0 0 0 0 0 1.2\n")  # mildly unnormalized quat
            fh.write("1.0 0 0 0 0 0 0 1\n")
        dst = tmp_path / "out.tum"
        r = _run(["tools/convert_gt.py", str(src), str(dst)])
        assert r.returncode == 0, r.stderr
        rows = np.loadtxt(dst)
        assert rows[0, 0] == 1.0 and rows[1, 0] == 2.0
        np.testing.assert_allclose(np.linalg.norm(rows[:, 4:8], axis=1), 1.0,
                                   atol=1e-9)


class TestOdomDeadreckon:
    def _bag(self, tmp_path):
        sys.path.insert(0, os.path.join(REPO, "tests"))
        import test_rosbag_io as T
        rng = np.random.default_rng(3)
        d = str(tmp_path / "bag")
        os.makedirs(d)
        T._make_bag(d, rng, n_scans=40)
        return d

    def test_consistent_bag_reports_small_errors(self, tmp_path):
        d = self._bag(tmp_path)
        r = _run(["tools/odom_deadreckon.py", "--bag", d])
        assert r.returncode == 0, r.stderr
        # all integration variants within a few % of path length
        checked = 0
        for line in r.stdout.splitlines():
            if "endpoint err" in line:
                pct = float(line.split("(")[-1].split("%")[0])
                assert pct < 5.0, line
                checked += 1
        assert checked >= 2  # twist + quat variants at minimum


class TestCompareTrajectories:
    def _write(self, path, t, P):
        with open(path, "w") as fh:
            fh.write("# timestamp x y z qx qy qz qw\n")
            for ti, p in zip(t, P):
                fh.write(f"{ti:.3f} {p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                         "0 0 0 1\n")

    def test_detects_axis_swap(self, tmp_path):
        t = np.arange(0, 30, 0.1)
        gt = np.stack([np.cos(t * 0.2) * 10, np.sin(t * 0.2) * 10,
                       0.1 * t], axis=1)
        est = gt[:, [1, 0, 2]]  # x/y swapped
        self._write(tmp_path / "gt.tum", t, gt)
        self._write(tmp_path / "est.tum", t, est)
        r = _run(["tools/compare_trajectories.py",
                  str(tmp_path / "est.tum"), str(tmp_path / "gt.tum")])
        assert r.returncode == 0, r.stderr
        assert "axis convention mismatch likely" in r.stdout

    def test_consistent_axes_pass(self, tmp_path):
        t = np.arange(0, 30, 0.1)
        gt = np.stack([np.cos(t * 0.2) * 10, np.sin(t * 0.2) * 10,
                       0.1 * t], axis=1)
        est = gt + np.random.default_rng(1).normal(scale=0.01,
                                                   size=gt.shape)
        self._write(tmp_path / "gt.tum", t, gt)
        self._write(tmp_path / "est.tum", t, est)
        r = _run(["tools/compare_trajectories.py",
                  str(tmp_path / "est.tum"), str(tmp_path / "gt.tum")])
        assert r.returncode == 0, r.stderr
        assert "identity mapping is already best" in r.stdout


class TestCheckLidarMount:
    def _ground_bag(self, tmp_path, pitch_deg=2.0, height=0.7):
        """Bag whose clouds see a floor plane, sensor pitched about y."""
        import sqlite3
        from fl_slam_tpu.io import cdr
        rng = np.random.default_rng(5)
        d = str(tmp_path / "gbag")
        os.makedirs(d)
        con = sqlite3.connect(os.path.join(d, "synth_0.db3"))
        con.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
                    "type TEXT, serialization_format TEXT, "
                    "offered_qos_profiles TEXT)")
        con.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, "
                    "topic_id INTEGER, timestamp INTEGER, data BLOB)")
        con.execute("INSERT INTO topics VALUES "
                    "(1, '/points', 'sensor_msgs/msg/PointCloud2', 'cdr', '')")
        th = np.radians(pitch_deg)
        R = np.array([[np.cos(th), 0, np.sin(th)],
                      [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        for i in range(6):
            t0 = 10.0 + 0.1 * i
            r = rng.uniform(1.5, 7.0, 3000)
            ang = rng.uniform(0, 2 * np.pi, 3000)
            floor = np.stack([r * np.cos(ang), r * np.sin(ang),
                              np.full(3000, -height)
                              + rng.normal(0, 0.01, 3000)], 1)
            wall = np.stack([np.full(1000, 8.0), rng.uniform(-8, 8, 1000),
                             rng.uniform(-height, 2.0, 1000)], 1)
            pts = np.ascontiguousarray(
                (R.T @ np.vstack([floor, wall]).T).T.astype(np.float32))
            blob = cdr.encode_pointcloud2(t0, pts)
            con.execute("INSERT INTO messages VALUES (?,?,?,?)",
                        (i + 1, 1, int(t0 * 1e9), blob))
        con.commit()
        con.close()
        return d, R

    def test_recovers_pitch_and_height(self, tmp_path):
        d, _ = self._ground_bag(tmp_path)
        r = _run(["tools/check_lidar_mount.py", "--bag", d,
                  "--lidar", "/points", "--scans", "6"])
        assert r.returncode == 0, r.stderr
        pitch = float([ln for ln in r.stdout.splitlines()
                       if "implied mount" in ln][0]
                      .rsplit("pitch", 1)[1].split("deg")[0])
        h = float([ln for ln in r.stdout.splitlines()
                   if "height" in ln][0].split(":")[1].split("m")[0])
        assert abs(pitch - 2.0) < 0.2, r.stdout
        assert abs(h - 0.7) < 0.03, r.stdout

    def test_calibration_check_passes_with_true_rotation(self, tmp_path):
        d, R = self._ground_bag(tmp_path)
        rig = {"T_base_lidar":
               np.block([[R, np.zeros((3, 1))],
                         [np.zeros((1, 3)), np.ones((1, 1))]]).tolist()}
        p = tmp_path / "rig.json"
        p.write_text(json.dumps(rig))
        r = _run(["tools/check_lidar_mount.py", "--bag", d,
                  "--lidar", "/points", "--scans", "6",
                  "--calib", str(p)])
        assert r.returncode == 0, r.stderr
        tilt_line = [ln for ln in r.stdout.splitlines()
                     if "residual tilt" in ln][0]
        assert "OK" in tilt_line, r.stdout


class TestInspectCovariances:
    def test_reports_static_covs_and_noise_floor(self, tmp_path):
        sys.path.insert(0, os.path.join(REPO, "tests"))
        import test_rosbag_io as T
        rng = np.random.default_rng(3)
        d = str(tmp_path / "bag")
        os.makedirs(d)
        T._make_bag(d, rng, n_scans=8)
        r = _run(["tools/inspect_covariances.py", "--bag", d])
        assert r.returncode == 0, r.stderr
        assert "STATIC covariances" in r.stdout
        assert "gyro" in r.stdout and "datasheet prior" in r.stdout
        # the synthetic gyro noise (0.01 std) vs prior 8.7e-7/0.005: ~0.6
        g_line = [ln for ln in r.stdout.splitlines()
                  if ln.strip().startswith("gyro: empirical")][0]
        assert "consistent" in g_line, r.stdout


class TestBagForensics:
    def _bag(self, tmp_path):
        sys.path.insert(0, os.path.join(REPO, "tests"))
        import test_rosbag_io as T
        rng = np.random.default_rng(7)
        d = str(tmp_path / "bag")
        os.makedirs(d)
        T._make_bag(d, rng, n_scans=10)
        return d

    def test_first_messages_summary_runs(self, tmp_path):
        d = self._bag(tmp_path)
        r = _run(["tools/first_messages_summary.py", d, "--lidar", "/lidar",
                  "--imu", "/imu", "--odom", "/odom", "-n", "3"])
        assert r.returncode == 0, r.stderr
        assert "topics in bag" in r.stdout
        assert "gravity check" in r.stdout
        assert "pose cov diag" in r.stdout

    def test_estimate_imu_extrinsic_recovers_tilt(self, tmp_path):
        # Synthetic bag's IMU is upright (accel ~ +Z g): the estimator must
        # report near-zero tilt and a near-identity R_base_imu.
        d = self._bag(tmp_path)
        r = _run(["tools/estimate_imu_extrinsic.py", d, "--imu", "/imu"])
        assert r.returncode == 0, r.stderr
        tilt = [ln for ln in r.stdout.splitlines() if "tilt from +Z" in ln]
        assert tilt and float(tilt[0].split(":")[1].split("deg")[0]) < 5.0

    def test_rotvec_between_antipodal_and_aligned(self):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from estimate_imu_extrinsic import rotvec_between
        z = np.array([0.0, 0.0, 1.0])
        assert np.linalg.norm(rotvec_between(z, z)) < 1e-12
        rv = rotvec_between(z, -z)
        assert abs(np.linalg.norm(rv) - np.pi) < 1e-9
        v = np.array([1.0, 2.0, -0.5])
        v = v / np.linalg.norm(v)
        rv = rotvec_between(v, z)
        from fl_slam_tpu.io.rosbag import rotvec_to_matrix
        np.testing.assert_allclose(rotvec_to_matrix(rv) @ v, z, atol=1e-9)
