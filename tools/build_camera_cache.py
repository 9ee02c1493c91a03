"""Build the per-bag camera feature sidecar (one-time host pass).

SURVEY.md section 7.3 legitimizes precomputing full-bag camera features
host-side; the reference's equivalent pass is its separate C++
visual_feature_node running over the whole bag. After this pass, camera-on
staging skips per-frame JPEG decode + FAST extraction entirely
(io/rosbag._CameraIndex picks the sidecar up automatically).

Usage:
  python tools/build_camera_cache.py --bag DIR --calib CALIB.json
      [--rgb TOPIC --depth TOPIC | --profile kimera] [--n-feat 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bag", required=True)
    ap.add_argument("--calib", required=True)
    ap.add_argument("--rgb", default=None)
    ap.add_argument("--depth", default=None)
    ap.add_argument("--profile", default=None, choices=["kimera"])
    ap.add_argument("--n-feat", type=int, default=None,
                    help="feature budget (default: GCConfig.tpu().n_feat)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from fl_slam_tpu.camera.feature_cache import build_sidecar
    from fl_slam_tpu.config import GCConfig
    from fl_slam_tpu.io.rosbag import CameraTopics, load_calibration

    if args.profile == "kimera":
        from fl_slam_tpu.io.kimera import KIMERA_CAM_TOPICS
        rgb, depth = KIMERA_CAM_TOPICS.rgb, KIMERA_CAM_TOPICS.depth
    else:
        rgb, depth = args.rgb, args.depth
    if not rgb or not depth:
        print("[FAIL] need --rgb/--depth or --profile kimera")
        sys.exit(2)
    calib = load_calibration(args.calib)
    if "intrinsics" not in calib:
        print("[FAIL] calibration JSON has no intrinsics")
        sys.exit(2)
    n_feat = args.n_feat or GCConfig.tpu().n_feat

    t0 = time.perf_counter()

    def progress(done, total):
        dt = time.perf_counter() - t0
        print(f"  {done}/{total} frames ({done / max(dt, 1e-9):.1f}/s)",
              flush=True)

    path = build_sidecar(args.bag, CameraTopics(rgb=rgb, depth=depth),
                         calib["intrinsics"], n_feat, out_path=args.out,
                         progress=progress)
    print(f"[done] sidecar: {path} ({os.path.getsize(path) / 1e6:.1f} MB, "
          f"{time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()
