"""Standalone SLAM dashboard from a completed run's artifacts (parity:
reference ``tools/slam_dashboard.py`` — a Plotly HTML dashboard built from
the minimal diagnostics tape + cert summary, without re-running anything).

``run_eval.py`` already writes ``dashboard.html`` during the run; this tool
regenerates it (or the matplotlib PNG fallback) post-hoc from the saved
``diagnostics.npz`` + ``trajectory.tum`` — the reference's forensic loop of
re-plotting a finished run with different GT/without the backend alive.

Usage:
  python tools/slam_dashboard.py RUN_DIR [--gt acl_jackal_gt.tum]
      [--out dashboard2.html]
"""

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="a run_eval output directory")
    ap.add_argument("--gt", default=None, help="TUM ground-truth file")
    ap.add_argument("--out", default=None,
                    help="output path (default: RUN_DIR/dashboard.html)")
    args = ap.parse_args()

    diag = os.path.join(args.run_dir, "diagnostics.npz")
    tum = os.path.join(args.run_dir, "trajectory.tum")
    if not os.path.exists(diag) or not os.path.exists(tum):
        print(f"[FAIL] need {diag} and {tum}")
        sys.exit(2)
    with np.load(diag) as z:
        certs = {k: z[k] for k in z.files if k != "stamps"}
        stamps = z["stamps"] if "stamps" in z.files else None
    traj = np.loadtxt(tum)
    if stamps is None:
        stamps = traj[:, 0]
    from fl_slam_tpu.io.rosbag import quat_xyzw_to_rotvec
    poses = np.stack([np.concatenate([r[1:4], quat_xyzw_to_rotvec(r[4:8])])
                      for r in traj])

    gt_poses = None
    if args.gt:
        gt = np.loadtxt(args.gt)
        from fl_slam_tpu.io.time_alignment import align_gt_timebase
        off = align_gt_timebase(gt[:, 0], traj[:, 0])
        idx = np.argmin(np.abs((gt[:, 0] + off)[None, :]
                               - traj[:, 0][:, None]), axis=1)
        gt_poses = np.stack([np.concatenate(
            [gt[i, 1:4], quat_xyzw_to_rotvec(gt[i, 4:8])]) for i in idx])

    # Reuse run_eval's dashboard renderers on a shim carrying the certs.
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "run_eval", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "run_eval.py"))
    re_mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(re_mod)
    outs = types.SimpleNamespace(certs=certs)
    out_dir = args.run_dir
    re_mod._dashboard(out_dir, outs, poses, gt_poses,
                      stamps - stamps[0])
    if args.out:
        src = os.path.join(out_dir, "dashboard.html")
        if os.path.exists(src):
            os.replace(src, args.out)
            print(f"[dashboard] {args.out}")


if __name__ == "__main__":
    main()
