"""Dead-reckon the odometry TWISTS and compare against the odometry POSES.

Three integrations of the same bag slice, overlaid:
  1. twist: forward speed ``v_body`` + yaw rate ``wz`` (planar unicycle)
  2. quat:  forward speed + yaw taken from the pose quaternion
  3. imu:   forward speed + yaw from integrated (bias-corrected) gyro z
against the reported odom positions. Divergence between (1)/(2)/(3)
localizes which signal (twist yaw rate, quaternion, gyro mount) disagrees
before any SLAM run; all four agreeing to ~1 % of path length is the healthy
case.

Parity: reference ``tools/dead_reckon_odom_dump.py`` + ``plot_wz_odom.py``
(merged; reads the bag directly instead of CSV dumps).

Usage:
  python tools/odom_deadreckon.py --bag DIR [--odom /odom] [--imu /imu]
      [--max-msgs 5000] [--out dead_reckon.png] [--imu-rotvec RX RY RZ]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fl_slam_tpu.io.rosbag import (RosbagReader, quat_xyzw_to_rotvec,
                                   rotvec_to_matrix)
from fl_slam_tpu.io.cdr import decode_imu, decode_odometry


def _integrate(stamps, v_fwd, yaw):
    xy = np.zeros((len(stamps), 2))
    for i in range(1, len(stamps)):
        dt = stamps[i] - stamps[i - 1]
        xy[i] = xy[i - 1] + dt * v_fwd[i - 1] * np.array(
            [np.cos(yaw[i - 1]), np.sin(yaw[i - 1])])
    return xy


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--bag", required=True)
    ap.add_argument("--odom", default="/odom")
    ap.add_argument("--imu", default="/imu")
    ap.add_argument("--max-msgs", type=int, default=5000)
    ap.add_argument("--out", default=None, help="PNG path (optional)")
    ap.add_argument("--imu-rotvec", type=float, nargs=3, default=None,
                    help="R_base_imu rotvec to map gyro into base frame")
    args = ap.parse_args()

    reader = RosbagReader(args.bag)
    odo = []
    for _, blob in reader.read_topic(args.odom):
        odo.append(decode_odometry(blob))
        if len(odo) >= args.max_msgs:
            break
    if len(odo) < 10:
        print(f"only {len(odo)} odom msgs on {args.odom}; nothing to do")
        return 1

    t = np.array([m.stamp for m in odo])
    pos = np.stack([m.position for m in odo])
    vx = np.array([m.vel_body[0] for m in odo])
    wz = np.array([m.omega_body[2] for m in odo])
    yaw_q = np.array([_yaw(quat_xyzw_to_rotvec(m.quat_xyzw)) for m in odo])

    yaw_tw = np.concatenate([[yaw_q[0]], yaw_q[0] + np.cumsum(
        wz[:-1] * np.diff(t))])
    path_tw = _integrate(t, vx, yaw_tw) + pos[0, :2]
    path_q = _integrate(t, vx, yaw_q) + pos[0, :2]

    paths = {"twist (vx+wz)": path_tw, "quat yaw": path_q}

    # IMU-yaw variant when the topic exists.
    try:
        imu = []
        for _, blob in reader.read_topic(args.imu):
            imu.append(decode_imu(blob))
            if len(imu) >= args.max_msgs * 4:
                break
    except Exception:
        imu = []
    if len(imu) > 50:
        ti = np.array([m.stamp for m in imu])
        gz = np.stack([m.gyro for m in imu])
        if args.imu_rotvec is not None:
            gz = gz @ rotvec_to_matrix(np.asarray(args.imu_rotvec)).T
        gz = gz[:, 2]
        still = np.abs(gz) < np.percentile(np.abs(gz), 10)
        bias = gz[still].mean() if still.any() else 0.0
        yaw_i = np.concatenate([[0.0], np.cumsum(
            (gz[:-1] - bias) * np.diff(ti))]) + yaw_q[0]
        yaw_imu = np.interp(t, ti, yaw_i)
        paths["imu gyro yaw"] = _integrate(t, vx, yaw_imu) + pos[0, :2]

    L = float(np.sum(np.linalg.norm(np.diff(pos[:, :2], axis=0), axis=1)))
    print(f"{len(odo)} odom msgs, {t[-1]-t[0]:.1f} s, path {L:.1f} m")
    for name, p in paths.items():
        end_err = np.linalg.norm(p[-1] - pos[-1, :2])
        rms = np.sqrt(np.mean(np.sum((p - pos[:, :2]) ** 2, axis=1)))
        print(f"  {name:16s}: endpoint err {end_err:7.2f} m "
              f"({100*end_err/max(L,1e-9):5.1f}% of path) | RMS {rms:.2f} m")
    print("healthy rig: all variants within a few % of path length; a large"
          " quat-vs-twist gap = yaw-rate sign/frame bug; a large imu gap ="
          " gyro mount rotation or bias.")

    if args.out:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 7))
        ax.plot(pos[:, 0], pos[:, 1], "k-", lw=2, label="odom poses")
        for name, p in paths.items():
            ax.plot(p[:, 0], p[:, 1], lw=1.2, label=name)
        ax.set_aspect("equal")
        ax.legend()
        ax.set_title(os.path.basename(os.path.normpath(args.bag)))
        fig.savefig(args.out, dpi=120, bbox_inches="tight")
        print(f"wrote {args.out}")
    return 0


def _yaw(rotvec):
    R = rotvec_to_matrix(rotvec)
    return float(np.arctan2(R[1, 0], R[0, 0]))


if __name__ == "__main__":
    sys.exit(main())
