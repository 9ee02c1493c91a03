"""THE evaluation entry point (parity: reference ``tools/run_and_evaluate_gc.sh``
stage structure + ``tools/evaluate_slam.py`` metrics + ``slam_dashboard.py``).

Stages: stage data (synthetic or a ROS 2 bag) -> single jitted lax.scan replay
-> audit-invariant gates (cert finiteness, budget shapes) -> ATE/RPE metrics
-> artifacts (TUM trajectory, metrics.json, diagnostics npz, splat export,
runtime manifest, HTML dashboard when plotly is available).

Usage:
  python tools/run_eval.py --out runs/eval1 [--scans 100] [--seed 3]
      [--drift] [--camera] [--cpu] [--small]
  python tools/run_eval.py --bag /path/to/bag --lidar /topic ... --out runs/x
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scans", type=int, default=100,
                    help="scan cap (0 = the whole bag; bag runs only)")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--drift", action="store_true",
                    help="drifting wheel odometry (the SLAM stress case)")
    ap.add_argument("--camera", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="reduced test budgets (default on CPU)")
    ap.add_argument("--bag", default=None, help="ROS 2 bag directory")
    ap.add_argument("--lidar", default="/gc/sensors/lidar_points")
    ap.add_argument("--imu", default="/imu")
    ap.add_argument("--odom", default="/odom")
    ap.add_argument("--rgb", default=None,
                    help="CompressedImage topic (enables the camera slice)")
    ap.add_argument("--depth", default=None, help="raw depth Image topic")
    ap.add_argument("--calib", default=None,
                    help="calibration JSON: T_base_lidar / T_base_cam / "
                         "intrinsics (io.rosbag.load_calibration schema)")
    ap.add_argument("--gt", default=None, help="TUM ground-truth file")
    ap.add_argument("--no-render", action="store_true",
                    help="skip the chase/BEV map renders")
    ap.add_argument("--seg-len", type=int, default=0,
                    help="replay in fixed segments of N scans (bounds "
                    "device staging memory for long bags; 0 = one shot)")
    ap.add_argument("--stream", action="store_true",
                    help="with --seg-len and --bag: stage each segment "
                    "LAZILY so host staging of segment k+1 overlaps the "
                    "device replay of segment k (io/rosbag.StreamingStager)"
                    " — the end-to-end (staging-inclusive) path")
    ap.add_argument("--profile", default=None, choices=["kimera"],
                    help="topic-name preset; 'kimera' = the canonical "
                    "/acl_jackal/* topics of the reference workload "
                    "(io/kimera.py), so the real bag needs no topic flags")
    args = ap.parse_args()

    if args.profile == "kimera":
        from fl_slam_tpu.io.kimera import KIMERA_CAM_TOPICS, KIMERA_TOPICS
        args.lidar = KIMERA_TOPICS.lidar
        args.imu = KIMERA_TOPICS.imu
        args.odom = KIMERA_TOPICS.odom
        if (args.rgb is None) and (args.depth is None) and args.calib:
            args.rgb = KIMERA_CAM_TOPICS.rgb
            args.depth = KIMERA_CAM_TOPICS.depth

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fl_slam_tpu.config import GCConfig
    from fl_slam_tpu.eval.metrics import ate, rpe, save_tum
    from fl_slam_tpu.pipeline import init_state, replay_jit
    from fl_slam_tpu.render.export import (save_diagnostics,
                                           save_runtime_manifest,
                                           save_splat_export)

    os.makedirs(args.out, exist_ok=True)
    if args.scans == 0:
        if not args.bag:
            print("[FAIL] --scans 0 (whole bag) needs --bag")
            sys.exit(2)
        args.scans = None
    on_cpu = jax.default_backend() == "cpu"
    cfg = GCConfig.small() if (args.small or on_cpu) else GCConfig.tpu()
    print(f"[stage] backend={jax.default_backend()} "
          f"config={'small' if (args.small or on_cpu) else 'tpu'}")

    # ---- stage data -----------------------------------------------------------
    gt_poses = gt_stamps = None
    if args.bag:
        from fl_slam_tpu.io.rosbag import (BagTopics, CameraTopics,
                                           load_calibration,
                                           load_scan_records)
        from fl_slam_tpu.io.rosbag import to_scan_inputs as bag_to_inputs
        calib = load_calibration(args.calib) if args.calib else {}
        cam = None
        if args.rgb and args.depth:
            if "intrinsics" not in calib:
                print("[FAIL] --rgb/--depth need --calib with intrinsics")
                sys.exit(2)
            cam = CameraTopics(rgb=args.rgb, depth=args.depth)
        stager = None
        if args.stream and args.seg_len:
            # Lazy segment staging: only a 10-scan HEAD is staged up front
            # (initial anchor + budget-shape probe); the rest stages
            # segment-by-segment inside the replay loop, overlapped with
            # the device (StreamingStager).
            from fl_slam_tpu.io.rosbag import StreamingStager
            recs = load_scan_records(
                args.bag, BagTopics(args.lidar, args.imu, args.odom), cfg,
                max_scans=10, T_base_lidar=calib.get("T_base_lidar"))
            stager = StreamingStager(
                args.bag, BagTopics(args.lidar, args.imu, args.odom), cfg,
                args.seg_len, T_base_lidar=calib.get("T_base_lidar"),
                cam_topics=cam, intrinsics=calib.get("intrinsics"),
                T_base_cam=calib.get("T_base_cam"), max_scans=args.scans)
            host_recs = None
            scans = None
            stamps = recs["scan_start"]      # head (relative); replaced
            t_origin = recs["__audit__"].get("time_origin", 0.0)
        else:
            recs = load_scan_records(
                args.bag, BagTopics(args.lidar, args.imu, args.odom),
                cfg, max_scans=args.scans,
                T_base_lidar=calib.get("T_base_lidar"),
                cam_topics=cam, intrinsics=calib.get("intrinsics"),
                T_base_cam=calib.get("T_base_cam"))
            # --seg-len must not stage the whole bag on device: keep the
            # host records and let the segment generator upload one segment
            # at a time (io/rosbag.scan_input_segments).
            host_recs = recs if args.seg_len else None
            scans = None if args.seg_len else bag_to_inputs(recs, cfg)
            stamps = recs["scan_start"]      # RELATIVE time base (f32-safe)
            t_origin = recs["__audit__"].get("time_origin", 0.0)
            if "__audit__" in recs:
                with open(os.path.join(args.out, "wiring_audit.json"),
                          "w") as fh:
                    json.dump(recs["__audit__"], fh, indent=2)
                _print_wiring_summary(recs["__audit__"])
            if cam is not None \
                    and recs["__audit__"].get("camera_scans", 0) == 0:
                print("[FAIL] camera requested but no scan got camera "
                      "features")
                sys.exit(2)
        # Smoothed initial anchor from the first K odom with IMU stability
        # weights (parity: backend_node.py:1467-1513) — one noisy first odom
        # message must not bias the whole anchor chain.
        from fl_slam_tpu.io.rosbag import smoothed_initial_anchor
        anchor0 = jnp.asarray(smoothed_initial_anchor(recs, cfg),
                              dtype=cfg.jdtype)
        t0 = float(stamps[0]) - 0.1
    else:
        from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
        kw = dict(odom_drift_vel_scale=1.03, odom_drift_yaw_rate=0.01) \
            if args.drift else {}
        ds = simulate(cfg, n_scans=args.scans, seed=args.seed,
                      with_camera=args.camera, **kw)
        scans = to_scan_inputs(ds, cfg)
        host_recs = ({k: np.asarray(getattr(scans, k))
                      for k in scans._fields} if args.seg_len else None)
        stamps = ds.gt_stamps
        t_origin = 0.0
        gt_poses, gt_stamps = ds.gt_poses, ds.gt_stamps
        anchor0 = jnp.asarray(ds.gt_poses[0], dtype=cfg.jdtype)
        t0 = float(ds.gt_stamps[0]) - 0.1

    def _field(name):
        """Staged field, whichever form this run holds (device ScanInput for
        one-shot; host records for --seg-len; the staged 10-scan head for
        --stream — same staging code path, probe-sized)."""
        if scans is not None:
            return np.asarray(getattr(scans, name))
        if host_recs is not None:
            return host_recs[name]
        return recs[name]

    # ---- replay (one compiled program over the whole bag; --seg-len bounds
    # device staging memory for bags too large to stage at once) -----------------
    state = init_state(cfg, anchor0=anchor0, t0=t0)

    # Heartbeat thread: the replay compile can take minutes on a cold cache;
    # a silent terminal is indistinguishable from a hang (round-2 verdict;
    # parity: the reference eval's /gc/status monitor loop,
    # run_and_evaluate_gc.sh:338-441).
    import threading

    class _Heartbeat:
        def __init__(self, what):
            self.what = what
            self.t0 = time.perf_counter()
            self._stop = threading.Event()
            self._th = threading.Thread(target=self._run, daemon=True)

        def _run(self):
            while not self._stop.wait(30.0):
                print(f"[replay] {self.what}... "
                      f"{time.perf_counter() - self.t0:.0f}s elapsed",
                      flush=True)

        def __enter__(self):
            self._th.start()
            return self

        def __exit__(self, *a):
            self._stop.set()

    t_start = time.perf_counter()
    if args.seg_len:
        from fl_slam_tpu.io.rosbag import scan_input_segments
        from fl_slam_tpu.pipeline import replay_segments

        def _progress(i, n_disp, wall_s, n_done):
            print(f"[replay] segment {i + 1}: {n_disp} scans dispatched, "
                  f"{n_done} done, t={wall_s:.2f}s, "
                  f"{n_disp / max(wall_s, 1e-9):.1f} scans/s "
                  f"(incl. compile)", flush=True)

        if args.bag and args.stream:
            # end-to-end path: segments stage lazily INSIDE this loop,
            # overlapped with the device replay (wall below includes ALL
            # host staging)
            print("[replay] compiling + running (streamed segments)...",
                  flush=True)
            with _Heartbeat("streamed replay"):
                final_state, outs = replay_segments(
                    state, iter(stager), cfg, progress=_progress)
            T_total = int(stager.n_scans)
            t_origin = stager.time_origin or 0.0
            stamps = np.concatenate(stager.scan_starts) - t_origin
            with open(os.path.join(args.out, "wiring_audit.json"),
                      "w") as fh:
                json.dump(stager.audit, fh, indent=2)
            _print_wiring_summary(stager.audit)
            if cam is not None and stager.audit.get("camera_scans", 0) == 0:
                print("[FAIL] camera requested but no scan got camera "
                      "features")
                sys.exit(2)
        else:
            T_total = int(host_recs["scan_start"].shape[0])
            print("[replay] compiling + running (segmented)...", flush=True)
            with _Heartbeat("segmented replay"):
                final_state, outs = replay_segments(
                    state, scan_input_segments(host_recs, cfg,
                                               args.seg_len),
                    cfg, progress=_progress)
        outs = jax.tree.map(lambda a: a[:T_total], outs)
    else:
        run = replay_jit(cfg)
        print("[replay] compiling...", flush=True)
        with _Heartbeat("compiling"):
            compiled = run.lower(state, scans).compile()
        print(f"[replay] compiled in "
              f"{time.perf_counter() - t_start:.1f}s; running...",
              flush=True)
        t_run = time.perf_counter()
        with _Heartbeat("running"):
            final_state, outs = compiled(state, scans)
            jax.block_until_ready(outs.pose)
        print(f"[replay] executed in {time.perf_counter() - t_run:.2f}s",
              flush=True)
    jax.block_until_ready(outs.pose)
    wall = time.perf_counter() - t_start
    poses = np.asarray(outs.pose)
    n = poses.shape[0]
    print(f"[replay] {n} scans in {wall:.1f}s "
          f"({n / wall:.2f} scans/s incl. compile)")

    # ---- audit gates (parity: the reference runs the audit pytest as a
    # hard gate plus backend-death greps, run_and_evaluate_gc.sh:483-510) ----
    from fl_slam_tpu import certs as C
    schema = C.tape_schema(outs.certs)
    budget = C.compute_budget(cfg)
    gates = {
        "poses_finite": bool(np.isfinite(poses).all()),
        "certs_finite": all(bool(np.isfinite(np.asarray(v)).all())
                            for v in outs.certs.values()),
        # --seg-len pads the tail segment with repeats of the last scan;
        # those repeats advance scan_seq past n by design (outputs trimmed).
        "scan_seq_advanced": int(final_state.scan_seq) == (
            n if not args.seg_len
            else -(-n // args.seg_len) * args.seg_len),
        # cert-schema gate: every key categorized, schema non-trivial,
        # ExpectedEffect pairs cover EXACTLY the pinned operator registry
        # (certs.EXPECTED_EFFECT_OPS — the reference's every-operator
        # contract; a new operator without a pair, or a dropped pair,
        # fails here)
        "cert_schema": (len(schema) > 40
                        and all(C.category(k) != "other" for k in schema)
                        and set(C.effect_pairs(outs.certs))
                        == set(C.EXPECTED_EFFECT_OPS)),
        # budget-shape gate: the staged tensors match the declared
        # compile-time budgets (spec section 12.9.1)
        "budget_shapes": (
            tuple(_field("points").shape[1:]) == (budget["points_cap"], 3)
            and _field("imu_gyro").shape[1] == budget["imu_len"]
            and final_state.atlas.fdata.shape[0] == budget["largest_tensor_shape"][0]),
    }
    if not all(gates.values()):
        print("[FAIL] audit gates:", gates)
        sys.exit(2)
    print("[gates] all pass:", gates)

    # ---- metrics ----------------------------------------------------------------
    metrics = {"wall_s": wall, "scans": n, "scans_per_sec": n / wall,
               "backend": jax.default_backend()}
    if args.gt:
        gt = np.loadtxt(args.gt)
        # TUM: stamp tx ty tz qx qy qz qw. HARD GATES first (parity:
        # reference align_ground_truth.py + gt_checks.py run as gates,
        # run_and_evaluate_gc.sh:522-529): estimate the GT time-base offset,
        # then require temporal overlap before any metric is computed —
        # nearest-stamp pairing on misaligned clocks silently produces
        # garbage metrics.
        from fl_slam_tpu.io.rosbag import quat_xyzw_to_rotvec
        from fl_slam_tpu.io.time_alignment import (align_gt_timebase,
                                                   overlap_fraction)
        est_stamps = np.asarray(stamps, dtype=np.float64) + t_origin
        offset = align_gt_timebase(gt[:, 0], est_stamps)
        overlap = overlap_fraction(gt[:, 0], est_stamps, offset=offset)
        metrics["gt_time_offset_s"] = float(offset)
        metrics["gt_overlap_fraction"] = float(overlap)
        print(f"[gt] time offset {offset:+.3f} s, overlap {overlap:.2%}")
        if overlap < 0.5:
            print("[FAIL] GT overlap gate: trajectories share "
                  f"{overlap:.0%} < 50% of their time span")
            sys.exit(2)
        gt_t = gt[:, 0] + offset       # map the GT clock onto the estimate's
        idx = np.argmin(np.abs(gt_t[None, :] - est_stamps[:, None]), axis=1)
        gtp = np.stack([np.concatenate([
            gt[i, 1:4], quat_xyzw_to_rotvec(gt[i, 4:8])]) for i in idx])
        gt_poses = gtp
    if gt_poses is not None:
        m_ate = ate(poses, gt_poses, align="initial")
        metrics["ate"] = m_ate
        # Reference protocol: RPE at 1 / 5 / 10 m traveled (evaluate_slam.py).
        for d in (1.0, 5.0, 10.0):
            metrics[f"rpe_{int(d)}m"] = rpe(poses, gt_poses, delta_m=d)
        m_rpe = metrics["rpe_1m"]
        odom = (np.concatenate(stager.odom_poses)
                if (args.bag and args.stream and args.seg_len)
                else np.asarray(_field("odom_pose")))
        metrics["ate_raw_odom"] = ate(odom, gt_poses, align="initial")
        print(f"[metrics] ATE trans {m_ate['trans']['rmse']:.4f} m, "
              f"rot {m_ate['rot_deg']['rmse']:.3f} deg | raw odom "
              f"{metrics['ate_raw_odom']['trans']['rmse']:.4f} m")

    # ---- artifacts ----------------------------------------------------------------
    save_tum(os.path.join(args.out, "trajectory.tum"),
             np.asarray(stamps, dtype=np.float64) + t_origin, poses)
    with open(os.path.join(args.out, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=2)
    save_diagnostics(os.path.join(args.out, "diagnostics.npz"),
                     {k: np.asarray(v) for k, v in outs.certs.items()},
                     stamps=np.asarray(stamps, dtype=np.float64) + t_origin)
    save_splat_export(os.path.join(args.out, "splat_export.npz"),
                      final_state.atlas, cfg, poses=poses,
                      stamps=np.asarray(stamps))
    save_runtime_manifest(os.path.join(args.out, "runtime_manifest.json"),
                          cfg, extra={"metrics": {"wall_s": wall}})
    _dashboard(args.out, outs, poses, gt_poses, stamps)
    if not args.no_render:
        _render_views(args.out)
    print(f"[done] artifacts in {args.out}")


def _print_wiring_summary(audit: dict) -> None:
    """Processed-vs-dead-ended stream report (parity: the reference's
    wiring auditor end-of-run JSON summary,
    frontend/audit/wiring_auditor.py:1-20)."""
    consumed = audit.get("consumed", {})
    in_bag = audit.get("topics_in_bag", {})
    print("[wiring] streams:")
    for t in sorted(in_bag):
        n = consumed.get(t)
        if n is None:
            print(f"  DEAD-END  {t}  ({in_bag[t]}) — present in the bag, "
                  "not consumed by any staging path")
        else:
            print(f"  consumed  {t}: {n} msgs")
    drops = {k: audit.get(k, 0) for k in
             ("missing_odom_scans", "imu_windows_saturated",
              "nonfinite_points_total")}
    print(f"[wiring] in-stream drops/flags: {drops}; "
          f"staged {audit.get("staged_bytes", 0) / 1e6:.1f} MB, "
          f"{audit.get('n_scans', 0)} scans"
          + (f"; camera pairs {audit.get('camera_pairs')}, camera scans "
             f"{audit.get('camera_scans')}"
             if audit.get("camera_pairs") is not None else ""))


def _render_views(out_dir):
    """Chase-view + BEV renders of the exported map (parity: the reference
    eval chains build_rerun_from_splat/view_splat_jaxsplat renders,
    run_and_evaluate_gc.sh render step)."""
    import subprocess
    import jax
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "view_splat.py")
    # The EWA renderer is sized for the TPU; on CPU drop the budget so the
    # render finishes in seconds instead of minutes.
    on_cpu = jax.default_backend() == "cpu"
    small = ["--wh", "480", "360", "--max-prims", "4096"] if on_cpu else []
    env = dict(os.environ)
    if on_cpu:
        # The subprocess must not try (and possibly hang on) an accelerator
        # backend this process deliberately avoided.
        env["JAX_PLATFORMS"] = "cpu"
    for name, extra in (("map_chase.png", small),
                        ("map_bev.png", small + ["--bev"])):
        r = subprocess.run(
            [sys.executable, tool, out_dir,
             "--out", os.path.join(out_dir, name)] + extra,
            capture_output=True, text=True, timeout=600, env=env)
        if r.returncode == 0:
            print(f"[render] {out_dir}/{name}")
        else:
            print(f"[render] {name} failed: {r.stderr.strip()[-200:]}")


def _dashboard(out_dir, outs, poses, gt_poses, stamps):
    try:
        import plotly.graph_objects as go
        from plotly.subplots import make_subplots
    except Exception:
        _dashboard_mpl(out_dir, outs, poses, gt_poses, stamps)
        return
    import numpy as np
    certs = {k: np.asarray(v) for k, v in outs.certs.items()}
    fig = make_subplots(rows=2, cols=2, subplot_titles=(
        "trajectory (xy)", "odom residual", "map size/insertions",
        "tempering / trust"))
    fig.add_trace(go.Scatter(x=poses[:, 0], y=poses[:, 1], name="est"),
                  row=1, col=1)
    if gt_poses is not None:
        fig.add_trace(go.Scatter(x=gt_poses[:, 0], y=gt_poses[:, 1],
                                 name="gt"), row=1, col=1)
    t = np.asarray(stamps)
    fig.add_trace(go.Scatter(x=t, y=certs["odom_pose.residual_norm"],
                             name="|odom residual|"), row=1, col=2)
    fig.add_trace(go.Scatter(x=t, y=np.cumsum(certs["map.inserted_count"]),
                             name="cum inserted"), row=2, col=1)
    fig.add_trace(go.Scatter(x=t, y=certs["map.merged_pairs"],
                             name="merged/scan"), row=2, col=1)
    fig.add_trace(go.Scatter(x=t, y=certs["temper.beta"], name="beta"),
                  row=2, col=2)
    fig.add_trace(go.Scatter(x=t, y=certs["fusion.alpha"], name="alpha"),
                  row=2, col=2)
    path = f"{out_dir}/dashboard.html"
    fig.write_html(path)
    print(f"[dashboard] {path}")
    _effect_dashboard(out_dir, certs, t, backend="plotly")




def _effect_dashboard(out_dir, certs, t, backend="mpl"):
    """ExpectedEffect panel: predicted-vs-realized objective per operator
    (parity: reference certificates.py:348-510 audit axis)."""
    from fl_slam_tpu.certs import effect_pairs
    pairs = effect_pairs(certs)
    if not pairs:
        return
    if backend == "plotly":
        try:
            import plotly.graph_objects as go
            from plotly.subplots import make_subplots
        except Exception:
            backend = "mpl"
    if backend == "plotly":
        n = len(pairs)
        cols = 2
        rows = (n + cols - 1) // cols
        fig = make_subplots(rows=rows, cols=cols,
                            subplot_titles=list(pairs))
        for i, (op, (p, r)) in enumerate(sorted(pairs.items())):
            fig.add_trace(go.Scatter(x=t, y=p, name=f"{op} predicted"),
                          row=i // cols + 1, col=i % cols + 1)
            fig.add_trace(go.Scatter(x=t, y=r, name=f"{op} realized"),
                          row=i // cols + 1, col=i % cols + 1)
        path = f"{out_dir}/expected_effect.html"
        fig.write_html(path)
    else:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        n = len(pairs)
        cols = 2
        rows = (n + cols - 1) // cols
        fig, ax = plt.subplots(rows, cols, figsize=(12, 3 * rows),
                               squeeze=False)
        for i, (op, (p, r)) in enumerate(sorted(pairs.items())):
            a = ax[i // cols][i % cols]
            a.plot(t, p, label="predicted")
            a.plot(t, r, "--", label="realized")
            a.set_title(op)
            a.legend(fontsize=7)
        fig.tight_layout()
        path = f"{out_dir}/expected_effect.png"
        fig.savefig(path, dpi=110)
        plt.close(fig)
    print(f"[dashboard] {path}")


def _dashboard_mpl(out_dir, outs, poses, gt_poses, stamps):
    """Matplotlib fallback dashboard (plotly is not in the base image)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        print("[dashboard] no plotting backend available; skipped")
        return
    import numpy as np
    certs = {k: np.asarray(v) for k, v in outs.certs.items()}
    t = np.asarray(stamps)
    fig, ax = plt.subplots(2, 2, figsize=(12, 8))
    ax[0, 0].plot(poses[:, 0], poses[:, 1], label="est")
    if gt_poses is not None:
        ax[0, 0].plot(gt_poses[:, 0], gt_poses[:, 1], "--", label="gt")
    ax[0, 0].set_title("trajectory (xy)")
    ax[0, 0].legend()
    ax[0, 0].axis("equal")
    ax[0, 1].plot(t, certs["odom_pose.residual_norm"])
    ax[0, 1].set_title("|odom residual|")
    ax[1, 0].plot(t, np.cumsum(certs["map.inserted_count"]),
                  label="cum inserted")
    ax[1, 0].plot(t, certs["map.merged_pairs"], label="merged/scan")
    ax[1, 0].set_title("map size/insertions")
    ax[1, 0].legend()
    ax[1, 1].plot(t, certs["temper.beta"], label="beta")
    ax[1, 1].plot(t, certs["fusion.alpha"], label="alpha")
    ax[1, 1].set_title("tempering / trust")
    ax[1, 1].legend()
    fig.tight_layout()
    path = f"{out_dir}/dashboard.png"
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print(f"[dashboard] {path}")
    _effect_dashboard(out_dir, certs, t, backend="mpl")


if __name__ == "__main__":
    main()
