"""Estimate the LiDAR mount rotation (and height) from the ground plane.

For a roughly planar indoor/outdoor rig, the dominant low-height plane seen
by the LiDAR is the floor. Fitting it per scan gives the ground normal in
the SENSOR frame; if the base frame is Z-up, the roll/pitch of
``R_base_lidar`` must map that normal to +Z. This answers two pre-run
questions without ground truth:

  1. What roll/pitch should ``T_base_lidar`` carry? (``--estimate``, default)
  2. Does the rig JSON's ``T_base_lidar`` agree with the data? (``--calib``:
     reports the residual tilt angle after applying the calibration — healthy
     rigs read < 1 deg.)

Method: per scan, ground candidates = points in a [1, r_max] m ring whose z
lies in the lowest height band; plane fit = PCA smallest eigenvector,
re-fit twice on distance inliers (IRLS-lite). Scans whose inlier fraction or
planarity is poor are dropped; the report aggregates the survivors.

Parity: reference ``tools/estimate_lidar_base_extrinsic_rotation_from_ground.py``
+ ``tools/check_lidar_mount_angle.py`` (merged: estimate and check are the
same fit, with/without a calibration to compare against).

Usage:
  python tools/check_lidar_mount.py --bag DIR [--lidar /points]
      [--scans 20] [--r-max 8.0] [--band 0.25] [--calib rig.json]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fl_slam_tpu.io.cdr import decode_pointcloud2, pointcloud2_fields
from fl_slam_tpu.io.rosbag import RosbagReader, load_calibration


def fit_ground_plane(xyz, r_max=8.0, band=0.25, inlier_dist=0.05):
    """Ground plane from one scan's points (sensor frame).

    Returns (normal (3,) pointing toward the sensor origin side, d, inlier
    fraction, planarity sigma) or None when no credible plane exists.
    """
    fin = np.isfinite(xyz).all(axis=1)
    p = xyz[fin]
    r = np.linalg.norm(p[:, :2], axis=1)
    p = p[(r > 1.0) & (r < r_max)]
    if len(p) < 200:
        return None
    # Lowest height band: the floor is the lowest broad surface. Use a robust
    # low percentile as the band anchor (the absolute min may be an outlier).
    z0 = np.percentile(p[:, 2], 2.0)
    cand = p[np.abs(p[:, 2] - z0) < band]
    if len(cand) < 100:
        return None
    n, d = None, None
    for _ in range(3):  # PCA fit, re-fit on distance inliers
        c = cand.mean(axis=0)
        q = cand - c
        cov = q.T @ q / len(cand)
        w, v = np.linalg.eigh(cov)
        n = v[:, 0]
        d = -float(n @ c)
        dist = np.abs(cand @ n + d)
        keep = dist < inlier_dist
        if keep.sum() < 100:
            return None
        cand = cand[keep]
    # Orient the normal toward the sensor origin (origin is above the floor:
    # signed distance of 0 must be positive).
    if d < 0:
        n, d = -n, -d
    dist_all = np.abs(p @ n + d)
    frac = float((dist_all < inlier_dist).mean())
    sigma = float(np.std(cand @ n + d))
    return n, d, frac, sigma


def rotation_from_normal(n):
    """Minimal rotation taking the measured ground normal to +Z, and the
    (roll, pitch) it implies for R_base_lidar with base Z-up."""
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(n, z)
    s = np.linalg.norm(v)
    c = float(n @ z)
    if s < 1e-12:
        R = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R = np.eye(3) + vx + vx @ vx * ((1 - c) / (s * s))
    # ZYX euler (yaw is unobservable from the ground plane; report 0)
    pitch = float(np.arcsin(-R[2, 0]))
    roll = float(np.arctan2(R[2, 1], R[2, 2]))
    return R, roll, pitch


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--bag", required=True)
    ap.add_argument("--lidar", default="/points")
    ap.add_argument("--scans", type=int, default=20)
    ap.add_argument("--r-max", type=float, default=8.0)
    ap.add_argument("--band", type=float, default=0.25)
    ap.add_argument("--inlier-dist", type=float, default=0.05)
    ap.add_argument("--calib", default=None,
                    help="rig JSON with T_base_lidar to CHECK instead of "
                         "estimating from scratch")
    args = ap.parse_args()

    reader = RosbagReader(args.bag)
    normals, heights, fracs = [], [], []
    n_seen = 0
    for _ts, blob in reader.read_topic(args.lidar):
        msg = decode_pointcloud2(blob)
        flds = pointcloud2_fields(msg, ("x", "y", "z"))
        if flds["x"] is None:
            raise SystemExit("cloud has no x/y/z fields")
        xyz = np.stack([np.asarray(flds[k], np.float64)
                        for k in ("x", "y", "z")], axis=1)
        fit = fit_ground_plane(xyz, args.r_max, args.band, args.inlier_dist)
        n_seen += 1
        if fit is not None:
            n, d, frac, sigma = fit
            if frac > 0.05 and sigma < 0.03:
                normals.append(n)
                heights.append(d)
                fracs.append(frac)
        if n_seen >= args.scans:
            break

    if not normals:
        raise SystemExit(
            f"no credible ground plane in the first {n_seen} scans "
            f"(try a larger --band or --r-max; is the floor visible?)")
    normals = np.asarray(normals)
    n_mean = normals.mean(axis=0)
    n_mean /= np.linalg.norm(n_mean)
    spread = np.degrees(np.arccos(np.clip(normals @ n_mean, -1, 1)))
    height = float(np.median(heights))

    print(f"scans used          : {len(normals)}/{n_seen}")
    print(f"ground normal (lidar frame): "
          f"[{n_mean[0]:+.4f} {n_mean[1]:+.4f} {n_mean[2]:+.4f}]")
    print(f"normal spread       : median {np.median(spread):.3f} deg, "
          f"p95 {np.percentile(spread, 95):.3f} deg")
    print(f"sensor height above ground : {height:.3f} m")
    print(f"inlier fraction     : median {np.median(fracs):.3f}")

    R_est, roll, pitch = rotation_from_normal(n_mean)
    print(f"implied mount roll/pitch (base Z-up): "
          f"roll {np.degrees(roll):+.3f} deg, pitch {np.degrees(pitch):+.3f} deg")

    if args.calib:
        cal = load_calibration(args.calib)
        if "T_base_lidar" not in cal:
            raise SystemExit(f"{args.calib} has no T_base_lidar")
        R_bl = cal["T_base_lidar"][:3, :3]
        n_base = R_bl @ n_mean
        tilt = float(np.degrees(np.arccos(np.clip(n_base[2], -1, 1))))
        print(f"calibration check   : ground normal in base frame = "
              f"[{n_base[0]:+.4f} {n_base[1]:+.4f} {n_base[2]:+.4f}]")
        print(f"residual tilt after T_base_lidar: {tilt:.3f} deg "
              f"({'OK' if tilt < 1.0 else 'SUSPECT — mount rotation disagrees with data'})")
    else:
        print("estimated R_base_lidar (roll/pitch only; yaw unobservable):")
        for row in R_est:
            print(f"  [{row[0]:+.6f}, {row[1]:+.6f}, {row[2]:+.6f}]")


if __name__ == "__main__":
    main()
