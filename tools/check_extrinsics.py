"""Calibration forensics: validate a rig calibration JSON, optionally
against a bag's IMU data (parity: reference ``tools/check_extrinsics.py`` +
``estimate_imu_base_extrinsic_rotation.py`` + ``diagnose_coordinate_frames.py``
— the frame-convention tools the eval script leans on).

Checks:
  - each transform is rigid (R orthonormal, det +1) and its translation is
    physically plausible for a ground robot (< 3 m);
  - with --bag/--imu: the gravity direction implied by the stationary
    accelerometer mean agrees with Z-up in base frame (the GC convention,
    gravity (0,0,-9.81)); reports the residual tilt angle and, when it is
    large, the rotation that would fix it (axis-angle, as an inline
    T_base_imu suggestion).

Usage:
  python tools/check_extrinsics.py rig.json [--bag DIR --imu /topic]
      [--stationary-secs 2.0]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check_rigid(name: str, T: np.ndarray) -> list:
    issues = []
    R = T[:3, :3]
    err_orth = np.abs(R @ R.T - np.eye(3)).max()
    if err_orth > 1e-6:
        issues.append(f"{name}: R not orthonormal (max |RR^T - I| = "
                      f"{err_orth:.2e})")
    det = np.linalg.det(R)
    if abs(det - 1.0) > 1e-6:
        issues.append(f"{name}: det(R) = {det:.6f} (reflection?)")
    t = T[:3, 3]
    if np.linalg.norm(t) > 3.0:
        issues.append(f"{name}: translation {np.linalg.norm(t):.2f} m "
                      "implausible for a ground-robot rig")
    if T.shape != (4, 4) or not np.allclose(T[3], [0, 0, 0, 1]):
        issues.append(f"{name}: bottom row is not [0,0,0,1]")
    return issues


def gravity_check(bag: str, imu_topic: str, stationary_secs: float,
                  T_base_imu: np.ndarray | None) -> dict:
    from fl_slam_tpu.io import native
    from fl_slam_tpu.io.rosbag import RosbagReader
    reader = RosbagReader(bag)
    blobs = [b for _, b in reader.read_topic(imu_topic)]
    if not blobs:
        return {"error": f"no messages on {imu_topic}"}
    imu = native.decode_imu_batch(blobs)
    t = imu[:, 0]
    sel = t <= t[0] + stationary_secs          # assume start is stationary
    acc = imu[sel, 4:7]
    gyro_rms = float(np.sqrt((imu[sel, 1:4] ** 2).mean()))
    a_mean = acc.mean(axis=0)
    if T_base_imu is not None:
        a_mean = T_base_imu[:3, :3] @ a_mean
    norm = float(np.linalg.norm(a_mean))
    up = a_mean / max(norm, 1e-9)              # reaction points UP (base +z)
    tilt_deg = float(np.degrees(np.arccos(np.clip(up[2], -1.0, 1.0))))
    out = {
        "n_stationary_samples": int(sel.sum()),
        "gyro_rms_rad_s": gyro_rms,
        "accel_mean_base": [round(float(x), 4) for x in a_mean],
        "accel_norm": round(norm, 4),
        "tilt_from_z_up_deg": round(tilt_deg, 3),
        "flags": [],
    }
    if gyro_rms > 0.05:
        out["flags"].append("start window not stationary (gyro RMS "
                            f"{gyro_rms:.3f} rad/s) — tilt estimate unreliable")
    if abs(norm - 9.81) > 0.5:
        out["flags"].append(f"|accel mean| = {norm:.2f} != 9.81: wrong "
                            "units (g vs m/s^2?) or motion")
    if tilt_deg > 2.0:
        axis = np.cross(up, [0.0, 0.0, 1.0])
        s = np.linalg.norm(axis)
        if s > 1e-9:
            axis = axis / s
            ang = np.radians(tilt_deg)
            out["suggested_base_imu_rotvec"] = [
                round(float(x), 6) for x in axis * ang]
            out["flags"].append(
                f"gravity {tilt_deg:.1f} deg off base +z: missing/wrong "
                "IMU extrinsic rotation (suggestion above)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("calib")
    ap.add_argument("--bag", default=None)
    ap.add_argument("--imu", default="/imu")
    ap.add_argument("--stationary-secs", type=float, default=2.0)
    args = ap.parse_args()

    with open(args.calib) as fh:
        raw = json.load(fh)
    report = {"file": args.calib, "transforms": {}, "issues": []}
    for k, v in raw.items():
        if not k.startswith("T_"):
            continue
        T = np.asarray(v, dtype=np.float64)
        report["transforms"][k] = {
            "translation_m": [round(float(x), 4) for x in T[:3, 3]],
            "rotation_deg": round(float(np.degrees(np.arccos(np.clip(
                (np.trace(T[:3, :3]) - 1) / 2, -1, 1)))), 3),
        }
        report["issues"] += check_rigid(k, T)
    if "intrinsics" in raw:
        ii = raw["intrinsics"]
        fov_x = 2 * np.degrees(np.arctan(ii["width"] / (2 * ii["fx"])))
        report["intrinsics_fov_x_deg"] = round(float(fov_x), 1)
        if not 20 < fov_x < 160:
            report["issues"].append(f"fov_x {fov_x:.0f} deg implausible")
    if args.bag:
        T_bi = (np.asarray(raw["T_base_imu"])
                if "T_base_imu" in raw else None)
        report["gravity_check"] = gravity_check(
            args.bag, args.imu, args.stationary_secs, T_bi)
    report["ok"] = not report["issues"] and not (
        args.bag and report.get("gravity_check", {}).get("flags"))
    print(json.dumps(report, indent=2))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
