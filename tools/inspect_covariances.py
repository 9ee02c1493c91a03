"""Inspect reported sensor covariances vs the config's datasheet priors.

Three questions a new bag must answer before trusting the adaptive-noise
(IW) loop's initialization:

  1. Does the odometry publish REAL pose/twist covariances, or placeholder
     zeros / 1e6 sentinels? (Many drivers publish garbage; the pipeline uses
     its own ``odom_twist_*_sigma`` priors, so a mismatch is worth knowing.)
  2. What is the IMU's EMPIRICAL noise floor (Allan-style short-window
     variance from the stillest window), and how does it compare to the
     ``imu_gyro/accel_noise_density`` datasheet priors in ``GCConfig``?
  3. Are covariances constant over the bag, or do they move (a driver that
     actually estimates them)?

Parity: reference ``tools/inspect_odom_covariance.py`` +
``tools/compare_imu_sources.py`` (the covariance/noise-floor half; the
dead-reckoning half lives in ``tools/odom_deadreckon.py``).

Usage:
  python tools/inspect_covariances.py --bag DIR [--odom /odom] [--imu /imu]
      [--max-msgs 5000] [--window 200]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fl_slam_tpu.io.cdr import decode_imu, decode_odometry
from fl_slam_tpu.io.rosbag import RosbagReader


def _diag_stats(name, diags):
    """diags: (N, 6). Print per-axis min/median/max + placeholder verdicts."""
    labels = ("x", "y", "z", "rx", "ry", "rz")
    print(f"  {name} covariance diagonal over {len(diags)} msgs:")
    n_const = 0
    for i, lab in enumerate(labels):
        col = diags[:, i]
        const = np.allclose(col, col[0])
        n_const += const
        flag = ""
        if np.allclose(col, 0.0):
            flag = "  <- ZEROS (placeholder)"
        elif np.median(col) >= 1e5:
            flag = "  <- 1e6-style sentinel (unused axis)"
        elif const:
            flag = "  (constant)"
        print(f"    {lab:>2}: min {col.min():.3e}  med {np.median(col):.3e}"
              f"  max {col.max():.3e}{flag}")
    if n_const == 6:
        print("    verdict: STATIC covariances — driver does not estimate them")
    else:
        print("    verdict: covariances move — driver appears to estimate them")


def _stillest_window(arr, stamps, window):
    """Index range of the lowest-variance window (gyro norm criterion)."""
    n = len(arr)
    w = min(window, n)
    norms = np.linalg.norm(arr, axis=1)
    c = np.cumsum(np.concatenate([[0.0], norms]))
    c2 = np.cumsum(np.concatenate([[0.0], norms ** 2]))
    mean = (c[w:] - c[:-w]) / w
    var = (c2[w:] - c2[:-w]) / w - mean ** 2
    i0 = int(np.argmin(var))
    return i0, i0 + w


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--bag", required=True)
    ap.add_argument("--odom", default="/odom")
    ap.add_argument("--imu", default="/imu")
    ap.add_argument("--max-msgs", type=int, default=5000)
    ap.add_argument("--window", type=int, default=200,
                    help="IMU stillest-window length (samples)")
    args = ap.parse_args()

    from fl_slam_tpu.config import GCConfig
    cfg = GCConfig.tpu()
    reader = RosbagReader(args.bag)

    # ---- odometry covariances -------------------------------------------
    pose_d, twist_d = [], []
    for _ts, blob in reader.read_topic(args.odom):
        m = decode_odometry(blob)
        pose_d.append(np.diag(m.pose_cov))
        twist_d.append(np.diag(m.twist_cov))
        if len(pose_d) >= args.max_msgs:
            break
    if pose_d:
        print(f"odometry ({args.odom}):")
        _diag_stats("pose", np.asarray(pose_d))
        _diag_stats("twist", np.asarray(twist_d))
        print(f"  config priors: odom_twist_vel_sigma^2 = "
              f"{cfg.odom_twist_vel_sigma ** 2:.3e}, "
              f"odom_twist_wz_sigma^2 = {cfg.odom_twist_wz_sigma ** 2:.3e}")
    else:
        print(f"no odometry on {args.odom}")

    # ---- IMU empirical noise floor --------------------------------------
    gyro, accel, stamps = [], [], []
    for _ts, blob in reader.read_topic(args.imu):
        m = decode_imu(blob)
        gyro.append(m.gyro)
        accel.append(m.accel)
        stamps.append(m.stamp)
        if len(gyro) >= args.max_msgs:
            break
    if not gyro:
        print(f"no IMU on {args.imu}")
        return
    gyro = np.asarray(gyro)
    accel = np.asarray(accel)
    stamps = np.asarray(stamps)
    dt = float(np.median(np.diff(stamps))) if len(stamps) > 1 else 0.01
    i0, i1 = _stillest_window(gyro, stamps, args.window)
    g_var = gyro[i0:i1].var(axis=0)
    a_var = accel[i0:i1].var(axis=0)
    print(f"imu ({args.imu}): rate {1.0 / max(dt, 1e-9):.1f} Hz, "
          f"stillest window [{stamps[i0] - stamps[0]:.1f}, "
          f"{stamps[i1 - 1] - stamps[0]:.1f}] s")
    # discrete variance = PSD / dt
    g_prior = cfg.imu_gyro_noise_density / max(dt, 1e-9)
    a_prior = cfg.imu_accel_noise_density / max(dt, 1e-9)
    print(f"  gyro  var (rad^2/s^2): {g_var[0]:.3e} {g_var[1]:.3e} "
          f"{g_var[2]:.3e}  | datasheet prior (PSD/dt) {g_prior:.3e}")
    print(f"  accel var (m^2/s^4)  : {a_var[0]:.3e} {a_var[1]:.3e} "
          f"{a_var[2]:.3e}  | datasheet prior (PSD/dt) {a_prior:.3e}")
    for name, var, prior in (("gyro", g_var, g_prior),
                             ("accel", a_var, a_prior)):
        ratio = float(np.max(var) / max(prior, 1e-30))
        if ratio > 100 or ratio < 0.01:
            print(f"  {name}: empirical/prior ratio {ratio:.3g} — "
                  f"datasheet prior is off by >100x; consider overriding "
                  f"imu_{name}_noise_density (IW adaptation will converge "
                  f"anyway, but initialization transients shrink with a "
                  f"correct prior)")
        else:
            print(f"  {name}: empirical/prior ratio {ratio:.2f} — consistent")


if __name__ == "__main__":
    main()
