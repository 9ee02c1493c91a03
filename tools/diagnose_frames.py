"""Coordinate-frame + extrinsic-rotation forensics for a ROS 2 bag.

Answers the "which way is up / is the extrinsic rotation right" questions
that burn hours on a new rig, before any SLAM run:

  - IMU gravity direction in the sensor frame (resting-window accel mean),
    the implied roll/pitch of R_base_imu if base is Z-up, and whether the
    accelerometer reports specific force (+g when level) or acceleration.
  - IMU gyro bias estimate from the stillest window.
  - Odometry twist convention check: compares the body-frame velocity
    against the pose derivative rotated into the body frame (they must
    match if twist is truly body-frame and the quaternion is world<-body).
  - LiDAR cloud axis statistics (per-axis extent/centroid) and ring/time
    field presence, to catch axis swaps and missing per-point stamps.

Parity: reference ``tools/diagnose_coordinate_frames.py`` and
``tools/estimate_imu_base_extrinsic_rotation.py`` (merged: both answer the
same pre-run question from the same three topics).

Usage:
  python tools/diagnose_frames.py --bag DIR [--imu /imu] [--odom /odom]
      [--lidar /points] [--max-msgs 2000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fl_slam_tpu.io.cdr import (decode_imu, decode_odometry,
                                decode_pointcloud2, pointcloud2_fields)
from fl_slam_tpu.io.rosbag import (RosbagReader, quat_xyzw_to_rotvec,
                                   rotvec_to_matrix)

G = 9.80665


def analyze_imu(msgs):
    stamps = np.array([m.stamp for m in msgs])
    gyro = np.stack([m.gyro for m in msgs])
    accel = np.stack([m.accel for m in msgs])
    print(f"\n== IMU ({len(msgs)} msgs, {stamps[-1] - stamps[0]:.1f} s, "
          f"rate ~{(len(msgs) - 1) / max(stamps[-1] - stamps[0], 1e-9):.1f} Hz)")

    # Stillest 2 s window by gyro RMS: the gravity estimate and gyro bias
    # both want a resting rig.
    dt = np.median(np.diff(stamps))
    win = min(max(int(2.0 / max(dt, 1e-4)), 10), len(msgs))
    gy2 = np.convolve(np.sum(gyro**2, axis=1), np.ones(win) / win, "valid")
    i0 = int(np.argmin(gy2))
    a_rest = accel[i0:i0 + win].mean(axis=0)
    g_bias = gyro[i0:i0 + win].mean(axis=0)
    a_norm = np.linalg.norm(a_rest)
    print(f"stillest window: t=[{stamps[i0]:.2f}, {stamps[i0 + win - 1]:.2f}]"
          f"  gyro RMS {np.sqrt(gy2[i0]):.4f} rad/s")
    print(f"gyro bias estimate: {g_bias} rad/s")
    print(f"resting accel mean: {a_rest}  |a| = {a_norm:.3f} m/s^2")
    if a_norm < 0.5 * G:
        print("!! |accel| << g: accelerometer may be gravity-compensated "
              "(reporting acceleration, not specific force)")
    else:
        up = a_rest / a_norm
        axis = int(np.argmax(np.abs(up)))
        sign = "+" if up[axis] > 0 else "-"
        print(f"specific-force UP direction in IMU frame: {sign}"
              f"{'XYZ'[axis]} (convention: +Z when level and Z-up)")
        # Roll/pitch of R_base_imu assuming base Z-up: rotate measured up
        # onto +Z. (Yaw is unobservable from gravity.)
        z = np.array([0.0, 0.0, 1.0])
        v = np.cross(up, z)
        s, c = np.linalg.norm(v), float(up @ z)
        if s < 1e-9:
            rv = np.zeros(3)
        else:
            rv = v / s * np.arctan2(s, c)
        print(f"implied R_base_imu rotvec (gravity-aligned, yaw-free): {rv}"
              f"  ({np.degrees(np.linalg.norm(rv)):.2f} deg)")
    mono = np.all(np.diff(stamps) > 0)
    print(f"stamps monotonic: {mono}")
    return stamps


def analyze_odom(msgs):
    stamps = np.array([m.stamp for m in msgs])
    pos = np.stack([m.position for m in msgs])
    print(f"\n== ODOM ({len(msgs)} msgs, {stamps[-1] - stamps[0]:.1f} s)")
    print(f"path length {np.sum(np.linalg.norm(np.diff(pos, axis=0), axis=1)):.2f} m, "
          f"z range [{pos[:, 2].min():.3f}, {pos[:, 2].max():.3f}] m")

    # Twist convention: v_body reported vs R^T dp/dt measured.
    errs, mags = [], []
    for a, b in zip(msgs[:-1], msgs[1:]):
        dts = b.stamp - a.stamp
        if dts <= 1e-6:
            continue
        v_world = (b.position - a.position) / dts
        R = rotvec_to_matrix(quat_xyzw_to_rotvec(a.quat_xyzw))
        v_body_meas = R.T @ v_world
        errs.append(np.linalg.norm(v_body_meas - a.vel_body))
        mags.append(np.linalg.norm(a.vel_body))
    errs, mags = np.array(errs), np.array(mags)
    moving = mags > 0.05
    if moving.any():
        rel = np.median(errs[moving] / np.maximum(mags[moving], 1e-6))
        print(f"twist check (moving frames): median |R^T dp/dt - v_body| / |v| "
              f"= {rel:.3f}")
        if rel > 0.5:
            print("!! twist does NOT match body-frame pose derivative — "
                  "velocity may be world-frame or the quaternion convention "
                  "differs")
        else:
            print("twist is consistent with body-frame velocity")
    else:
        print("rig never moves in this bag slice — twist check skipped")
    cov = msgs[len(msgs) // 2].pose_cov
    print(f"pose cov diag (mid-bag): {np.diag(cov)}")
    return stamps


def analyze_lidar(reader, topic, n=5):
    print(f"\n== LIDAR ({topic})")
    count = 0
    for _, blob in reader.read_topic(topic):
        msg = decode_pointcloud2(blob)
        names = [f.name for f in msg.fields]
        flds = pointcloud2_fields(msg, ["x", "y", "z"])
        xyz = np.stack([np.asarray(flds[k], np.float64)
                        for k in ("x", "y", "z")], axis=-1)
        fin = np.isfinite(xyz).all(axis=-1)
        p = xyz[fin]
        if count == 0:
            print(f"fields: {names}")
            print(f"has ring: {'ring' in names}; has per-point time: "
                  f"{any(f in names for f in ('t', 'time', 'timestamp', 'time_offset'))}")
        if p.shape[0] == 0:
            print(f"scan {count}: 0/{len(fin)} finite — all points "
                  "NaN/inf in this message")
        else:
            print(f"scan {count}: {fin.sum()}/{len(fin)} finite | "
                  f"extent x[{p[:, 0].min():.1f},{p[:, 0].max():.1f}] "
                  f"y[{p[:, 1].min():.1f},{p[:, 1].max():.1f}] "
                  f"z[{p[:, 2].min():.1f},{p[:, 2].max():.1f}] | "
                  f"median range {np.median(np.linalg.norm(p, axis=1)):.2f} m")
        count += 1
        if count >= n:
            break
    if count == 0:
        print("no messages")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bag", required=True)
    ap.add_argument("--imu", default="/imu")
    ap.add_argument("--odom", default="/odom")
    ap.add_argument("--lidar", default=None)
    ap.add_argument("--max-msgs", type=int, default=4000)
    args = ap.parse_args()

    reader = RosbagReader(args.bag)
    topics = reader.topics()
    print("topics in bag:")
    for name, typ in sorted(topics.items()):
        print(f"  {name}  [{typ}]")

    if args.imu in topics:
        msgs = []
        for _, blob in reader.read_topic(args.imu):
            msgs.append(decode_imu(blob))
            if len(msgs) >= args.max_msgs:
                break
        analyze_imu(msgs)
    else:
        print(f"\n(imu topic {args.imu} not in bag)")

    if args.odom in topics:
        msgs = []
        for _, blob in reader.read_topic(args.odom):
            msgs.append(decode_odometry(blob))
            if len(msgs) >= args.max_msgs:
                break
        analyze_odom(msgs)
    else:
        print(f"\n(odom topic {args.odom} not in bag)")

    lidar = args.lidar
    if lidar is None:
        cands = [t for t, ty in topics.items() if "PointCloud2" in ty]
        lidar = cands[0] if cands else None
    if lidar:
        analyze_lidar(reader, lidar)


if __name__ == "__main__":
    main()
