"""Production-config accuracy gate (dev tool): the bisect-and-fix regression
workflow from docs/PERF_NOTES.md as one reproducible command.

Runs the FULL production-budget replay (GCConfig.tpu(), f32 — on CPU unless
--tpu) over the 200-scan drifting-wheel-odometry benchmark for N seeds and
prints per-seed + mean ATE translation/rotation for SLAM vs raw odometry.
Any config knob can be overridden on the command line for ablations:

  python tools/eval_accuracy.py                         # canonical gate
  python tools/eval_accuracy.py view_refresh_every=8    # R-cadence ablation
  python tools/eval_accuracy.py select_kernel=False     # kernel ablation
  python tools/eval_accuracy.py --scans 400 --seeds 5

Parity role: the reference gates every change on the Kimera-bag ATE
(tools/run_and_evaluate_gc.sh); with no bag in this environment the
production-scale synthetic drift benchmark is the standing equivalent
(docs/PERF_NOTES.md rule 5: the small-config suite alone misses
production-scale numeric cliffs).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_override(s: str):
    k, v = s.split("=", 1)
    for cast in (int, float):
        try:
            return k, cast(v)
        except ValueError:
            pass
    if v in ("True", "False"):
        return k, v == "True"
    return k, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=200)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator (default: CPU, hermetic)")
    ap.add_argument("--camera", action="store_true",
                    help="simulate the RGB-D camera slice (the round-3/5 "
                    "camera accuracy issue's benchmark)")
    ap.add_argument("--world", default="default",
                    choices=["default", "corridor"],
                    help="corridor = degenerate-geometry scenario: "
                    "along-track translation unobservable from lidar "
                    "(the camera-advantaged benchmark)")
    ap.add_argument("--drift-vel", type=float, default=1.03)
    ap.add_argument("--drift-yaw", type=float, default=0.01)
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("overrides", nargs="*",
                    help="GCConfig overrides as key=value")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fl_slam_tpu.config import GCConfig
    from fl_slam_tpu.eval.metrics import ate
    from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
    from fl_slam_tpu.pipeline import init_state, replay_jit

    overrides = dict(parse_override(s) for s in args.overrides)
    cfg = GCConfig.tpu(**overrides)
    run = replay_jit(cfg)
    drift = dict(odom_drift_vel_scale=args.drift_vel,
                 odom_drift_yaw_rate=args.drift_yaw)

    rows = []
    for seed in range(args.seeds):
        ds = simulate(cfg, n_scans=args.scans, seed=seed,
                      with_camera=args.camera, world=args.world, **drift)
        scans = to_scan_inputs(ds, cfg)
        state = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
        t0 = time.perf_counter()
        _, outs = run(state, scans)
        poses = np.asarray(outs.pose)
        wall = time.perf_counter() - t0
        gt = np.asarray(ds.gt_poses)
        a_slam = ate(poses, gt)
        a_odom = ate(np.asarray(ds.scans["odom_pose"]), gt)
        rows.append({
            "seed": seed,
            "slam_trans_m": a_slam["trans"]["rmse"],
            "slam_rot_deg": a_slam["rot_deg"]["rmse"],
            "odom_trans_m": a_odom["trans"]["rmse"],
            "odom_rot_deg": a_odom["rot_deg"]["rmse"],
            "wall_s": round(wall, 1),
        })
        r = rows[-1]
        print(f"seed {seed}: SLAM {r['slam_trans_m']:.3f} m / "
              f"{r['slam_rot_deg']:.3f} deg   "
              f"odom {r['odom_trans_m']:.3f} m / "
              f"{r['odom_rot_deg']:.3f} deg   ({wall:.0f}s)",
              flush=True)

    mean = {k: float(np.mean([r[k] for r in rows]))
            for k in rows[0] if k != "seed"}
    print(f"MEAN ({args.seeds} seeds, {args.scans} scans, "
          f"{' '.join(args.overrides) or 'baseline'}): "
          f"SLAM {mean['slam_trans_m']:.3f} m / {mean['slam_rot_deg']:.3f} "
          f"deg   odom {mean['odom_trans_m']:.3f} m / "
          f"{mean['odom_rot_deg']:.3f} deg", flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"config_overrides": overrides, "scans": args.scans,
                       "rows": rows, "mean": mean}, fh, indent=2)


if __name__ == "__main__":
    main()
