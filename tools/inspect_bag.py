"""Bag forensics (parity: reference ``tools/inspect_kimera_bag.py`` /
``first_n_messages_summary.py``): topics, message counts, rates, first-message
field summaries."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("--decode", action="store_true",
                    help="decode first messages of known types")
    args = ap.parse_args()

    from fl_slam_tpu.io import cdr
    from fl_slam_tpu.io.rosbag import RosbagReader

    reader = RosbagReader(args.bag)
    topics = reader.topics()
    print(f"{'topic':44s} {'type':38s} count  rate_hz")
    for name, typ in sorted(topics.items()):
        stamps = []
        n = 0
        first = None
        for ts, blob in reader.read_topic(name):
            if first is None:
                first = blob
            stamps.append(ts)
            n += 1
        rate = 0.0
        if n > 1:
            span = (stamps[-1] - stamps[0]) * 1e-9
            rate = (n - 1) / span if span > 0 else 0.0
        print(f"{name:44s} {typ:38s} {n:6d}  {rate:7.2f}")
        if args.decode and first is not None:
            try:
                if "PointCloud2" in typ:
                    m = cdr.decode_pointcloud2(first)
                    print(f"    stamp={m.stamp:.6f} {m.width}x{m.height} "
                          f"step={m.point_step} fields="
                          f"{[f.name for f in m.fields]}")
                elif "Imu" in typ:
                    m = cdr.decode_imu(first)
                    print(f"    stamp={m.stamp:.6f} gyro={m.gyro} "
                          f"accel={m.accel}")
                elif "Odometry" in typ:
                    m = cdr.decode_odometry(first)
                    print(f"    stamp={m.stamp:.6f} pos={m.position} "
                          f"cov_diag={np.diag(m.pose_cov)}")
            except Exception as e:  # noqa: BLE001 - forensics tool
                print(f"    decode failed: {e}")


if __name__ == "__main__":
    main()
