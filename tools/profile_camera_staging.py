"""Per-stage camera-staging profile (dev tool; round-5 campaign item 2).

Synthesizes one camera-equipped bag (same generator as bench_staging) and
times each stage of the per-scan camera path separately: JPEG decode, depth
convert, feature extraction (per frame), lidar_depth_evidence + PoE fuse +
slice fields (per scan). Prints one JSON line with ms per stage.

Usage: python tools/profile_camera_staging.py [--scans 40] [--wh 640 480]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=40)
    ap.add_argument("--wh", type=int, nargs=2, default=(640, 480))
    ap.add_argument("--points", type=int, default=28800)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import tempfile

    from tools.bench_staging import make_bag
    from fl_slam_tpu.camera.depth_fusion import (camera_slice_fields,
                                                 lidar_depth_evidence,
                                                 splat_prep_fused)
    from fl_slam_tpu.camera.features import PinholeIntrinsics, extract_features
    from fl_slam_tpu.config import GCConfig
    from fl_slam_tpu.io.cdr import depth_image_to_m
    from fl_slam_tpu.io.rosbag import (BagTopics, CameraTopics, RosbagReader,
                                       _CameraIndex, _decode_rgb,
                                       load_scan_records)

    w, h = args.wh
    cfg = GCConfig.tpu()
    rng = np.random.default_rng(0)
    td = tempfile.mkdtemp()
    make_bag(td, args.scans, w, h, rng, args.points)
    topics = BagTopics("/lidar", "/imu", "/odom")
    intr = PinholeIntrinsics(fx=300.0, fy=300.0, cx=w / 2, cy=h / 2,
                             width=w, height=h)

    recs = load_scan_records(td, topics, cfg)
    pts0 = recs["points"][0]

    audit = {"consumed": {}}
    reader = RosbagReader(td)
    cam = CameraTopics("/cam/rgb", "/cam/depth")
    idx = _CameraIndex(reader, cam, intr, np.eye(4), audit)

    R = 10  # repeats per timed stage

    t0 = time.perf_counter()
    for _ in range(R):
        rgb = _decode_rgb(idx.rgb_msgs[0].data)
    t_jpeg = (time.perf_counter() - t0) / R * 1e3

    t0 = time.perf_counter()
    for _ in range(R):
        depth = depth_image_to_m(idx.depth_msgs[0])
    t_depth = (time.perf_counter() - t0) / R * 1e3

    t0 = time.perf_counter()
    for _ in range(R):
        feats = extract_features(rgb, depth, intr, cfg.n_feat)
    t_feat = (time.perf_counter() - t0) / R * 1e3

    pts_cam = pts0  # identity extrinsic in this profile
    t0 = time.perf_counter()
    for _ in range(R):
        lam, the, sup = lidar_depth_evidence(feats.uv, feats.valid, pts_cam,
                                             intr)
    t_lde = (time.perf_counter() - t0) / R * 1e3

    t0 = time.perf_counter()
    for _ in range(R):
        fused = splat_prep_fused(feats, intr, pts_cam)
    t_fuse_total = (time.perf_counter() - t0) / R * 1e3

    t0 = time.perf_counter()
    for _ in range(R):
        fields = camera_slice_fields(fused, np.eye(4), cfg.vmf_n_lobes)
    t_slice = (time.perf_counter() - t0) / R * 1e3

    # whole-path reference measurement through the index
    t0 = time.perf_counter()
    out = idx.stage(recs["scan_start"][:args.scans] + 0.0,
                    recs["points"][:args.scans], cfg, audit)
    t_all = (time.perf_counter() - t0) / args.scans * 1e3

    print(json.dumps({
        "metric": "camera_staging_profile_ms",
        "image": f"{w}x{h}", "n_feat": cfg.n_feat,
        "raw_points": args.points,
        "per_frame": {"jpeg_decode": round(t_jpeg, 2),
                      "depth_convert": round(t_depth, 2),
                      "extract_features": round(t_feat, 2)},
        "per_scan": {"lidar_depth_evidence": round(t_lde, 2),
                     "splat_prep_fused_total": round(t_fuse_total, 2),
                     "camera_slice_fields": round(t_slice, 2)},
        "stage_all_ms_per_scan": round(t_all, 2),
        "n_valid_feats": int(feats.valid.sum()),
    }))


if __name__ == "__main__":
    main()
