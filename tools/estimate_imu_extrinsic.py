"""Estimate the static IMU->base ROTATION (roll/pitch) from gravity.

For bags without TF: at rest (or quasi-static moments) the accelerometer's
specific force points opposite gravity, so in a Z-up convention the mean
unit accel direction should be +Z in the base frame. The rotation that maps
the measured mean direction onto +Z is the roll/pitch part of R_base_imu
(yaw about gravity is unobservable from gravity alone — stated, not hidden).

Quasi-static selection is continuous, not gated: samples are weighted by
``exp(-c_g |w|^2) * exp(-c_a (|a| - g)^2)`` (the same stability weighting
the smoothed initial anchor uses, io/rosbag.smoothed_initial_anchor).

Parity role: reference ``tools/estimate_imu_base_extrinsic_rotation.py``
(gravity-direction alignment, +/-Z ambiguity surfaced).

Usage:
  python tools/estimate_imu_extrinsic.py <bag_dir> --imu /imu/topic
      [--max-msgs 20000] [--c-gyro 0.5] [--c-accel 2.0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rotvec_between(v_from: np.ndarray, v_to: np.ndarray) -> np.ndarray:
    """Minimal rotation (rotvec) taking unit v_from onto unit v_to."""
    c = float(np.clip(np.dot(v_from, v_to), -1.0, 1.0))
    axis = np.cross(v_from, v_to)
    s = np.linalg.norm(axis)
    if s < 1e-12:
        if c > 0:
            return np.zeros(3)
        # antiparallel: rotate pi about any axis orthogonal to v_from
        o = np.array([1.0, 0.0, 0.0])
        if abs(v_from[0]) > 0.9:
            o = np.array([0.0, 1.0, 0.0])
        axis = np.cross(v_from, o)
        return np.pi * axis / np.linalg.norm(axis)
    return axis / s * np.arctan2(s, c)


def estimate(imu: np.ndarray, c_gyro: float, c_accel: float,
             gravity: float = 9.81) -> dict:
    """imu rows = [stamp, gyro(3), accel(3)] (io/native.decode_imu_batch
    layout). Returns the weighted mean accel direction + both-hypothesis
    rotvecs and diagnostics."""
    gyro, accel = imu[:, 1:4], imu[:, 4:7]
    a_norm = np.linalg.norm(accel, axis=1)
    w = (np.exp(-c_gyro * np.sum(gyro * gyro, axis=1))
         * np.exp(-c_accel * (a_norm - gravity) ** 2))
    w_sum = float(w.sum())
    if w_sum <= 1e-9:
        raise SystemExit(
            "no quasi-static samples (|a| never near g) — wrong accel units "
            f"or topic? mean |a| = {a_norm.mean():.3f}")
    mean_dir = (w[:, None] * accel).sum(axis=0) / w_sum
    mean_dir = mean_dir / max(np.linalg.norm(mean_dir), 1e-12)
    z_up = np.array([0.0, 0.0, 1.0])
    return {
        "mean_accel_dir": mean_dir,
        "tilt_deg": float(np.degrees(np.arccos(
            np.clip(mean_dir @ z_up, -1.0, 1.0)))),
        "rotvec_base_imu": rotvec_between(mean_dir, z_up),
        "rotvec_base_imu_flipped": rotvec_between(mean_dir, -z_up),
        "ess": float(w_sum ** 2 / max(float((w * w).sum()), 1e-12)),
        "n": int(len(imu)),
        "mean_accel_norm": float((w * a_norm).sum() / w_sum),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag_dir")
    ap.add_argument("--imu", required=True, help="IMU topic")
    ap.add_argument("--max-msgs", type=int, default=20000)
    ap.add_argument("--c-gyro", type=float, default=0.5)
    ap.add_argument("--c-accel", type=float, default=2.0)
    args = ap.parse_args()

    from fl_slam_tpu.io import native
    from fl_slam_tpu.io.rosbag import RosbagReader, rotvec_to_matrix

    reader = RosbagReader(args.bag_dir)
    blobs = []
    for _, b in reader.read_topic(args.imu):
        blobs.append(b)
        if len(blobs) >= args.max_msgs:
            break
    if not blobs:
        raise SystemExit(f"no messages on {args.imu}")
    imu = native.decode_imu_batch(blobs)
    r = estimate(imu, args.c_gyro, args.c_accel)

    print("=== IMU->base rotation from gravity (roll/pitch only) ===")
    print(f"messages: {r['n']}   quasi-static ESS: {r['ess']:.1f}")
    print(f"weighted mean |a|: {r['mean_accel_norm']:.3f} m/s^2")
    print(f"mean accel direction (imu frame): {r['mean_accel_dir']}")
    print(f"tilt from +Z: {r['tilt_deg']:.2f} deg")
    rv = r["rotvec_base_imu"]
    print(f"\nR_base_imu rotvec (maps mean dir -> +Z): {rv}")
    print("as matrix:")
    print(np.array_str(rotvec_to_matrix(rv), precision=6))
    print("\nyaw about gravity is UNOBSERVABLE from gravity alone; if the "
          "accel sign convention is flipped (-Z), use instead:")
    print(f"rotvec: {r['rotvec_base_imu_flipped']}")


if __name__ == "__main__":
    main()
