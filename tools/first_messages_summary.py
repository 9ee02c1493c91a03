"""Dump the first N messages of each staged topic, decoded.

The first thing to run against an unfamiliar bag: stamps (epoch + deltas),
units sanity (|a| near 9.81, plausible point ranges, odom covariance
magnitudes), frame ids as stored, and per-topic rates — before any
pipeline code touches the data.

Parity role: reference ``tools/first_n_messages_summary.py`` /
``inspect_kimera_bag.py`` (the bag-forensics entry point).

Usage:
  python tools/first_messages_summary.py <bag_dir> [--lidar T] [--imu T]
      [--odom T] [-n 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag_dir")
    ap.add_argument("--lidar", default=None)
    ap.add_argument("--imu", default=None)
    ap.add_argument("--odom", default=None)
    ap.add_argument("-n", type=int, default=5)
    args = ap.parse_args()

    from fl_slam_tpu.io import native
    from fl_slam_tpu.io.rosbag import RosbagReader

    reader = RosbagReader(args.bag_dir)
    print("=== topics in bag ===")
    for t, typ in sorted(reader.topics().items()):
        print(f"  {t:50s} {typ}")

    def head(topic, k):
        out = []
        for _, b in reader.read_topic(topic):
            out.append(b)
            if len(out) >= k:
                break
        return out

    if args.imu:
        blobs = head(args.imu, max(args.n, 200))
        imu = native.decode_imu_batch(blobs)
        st = imu[:, 0]
        print(f"\n=== {args.imu} (IMU) ===")
        print(f"first stamp {st[0]:.6f}  dt median "
              f"{np.median(np.diff(st)) * 1e3:.2f} ms "
              f"(~{1.0 / max(np.median(np.diff(st)), 1e-9):.0f} Hz)")
        print(f"|gyro| mean {np.linalg.norm(imu[:, 1:4], axis=1).mean():.4f} "
              f"rad/s   |accel| mean "
              f"{np.linalg.norm(imu[:, 4:7], axis=1).mean():.3f} m/s^2 "
              f"(gravity check: ~9.81)")
        for r in imu[:args.n]:
            print(f"  t={r[0]:.4f} gyro={r[1:4]} accel={r[4:7]}")

    if args.odom:
        blobs = head(args.odom, max(args.n, 50))
        od = native.decode_odom_batch(blobs)
        st = od[:, 0]
        print(f"\n=== {args.odom} (odom) ===")
        print(f"first stamp {st[0]:.6f}  dt median "
              f"{np.median(np.diff(st)) * 1e3:.1f} ms")
        print(f"pose xyz range: {od[:, 1:4].min(axis=0)} .. "
              f"{od[:, 1:4].max(axis=0)}")
        cov = od[0, 8:44].reshape(6, 6)
        print(f"pose cov diag (msg 0): {np.diag(cov)}")
        for r in od[:args.n]:
            print(f"  t={r[0]:.4f} t_xyz={r[1:4]} quat={r[4:8]}")

    if args.lidar:
        blobs = head(args.lidar, args.n)
        print(f"\n=== {args.lidar} (lidar) ===")
        prev = None
        for b in blobs:
            stamp, xyz, t_rel, ring = native.decode_pointcloud2(b, 200000)
            rng = np.linalg.norm(xyz, axis=1)
            fin = np.isfinite(rng)
            dt = f"  dt={stamp - prev:.4f}s" if prev is not None else ""
            prev = stamp
            print(f"  t={stamp:.4f} n={len(xyz)} finite={int(fin.sum())} "
                  f"range[{np.nanmin(rng[fin]):.2f}, "
                  f"{np.nanmax(rng[fin]):.2f}] m "
                  f"rings={int(ring.max()) + 1 if len(ring) else 0} "
                  f"t_rel_span={t_rel.max() - t_rel.min():.4f}s{dt}")


if __name__ == "__main__":
    main()
