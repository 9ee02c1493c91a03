"""Capture an XLA op-level profile of the fused replay step (dev tool).

Runs the compiled ``lax.scan`` replay under ``jax.profiler.trace`` and parses
the resulting xplane protobuf with tensorboard_plugin_profile to print the
top self-time HLO ops. This sees INSIDE the single fused program, which
per-stage dispatch timing cannot (each dispatch floors at ~3.3 ms tunnel
round-trip on this host).

Usage: python tools/trace_replay.py [--scans N] [--out DIR]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=20)
    ap.add_argument("--out", default="/tmp/gc_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from fl_slam_tpu.config import GCConfig
    from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
    from fl_slam_tpu.pipeline import init_state, replay_jit

    on_accel = jax.default_backend() not in ("cpu",)
    cfg = GCConfig.tpu() if on_accel else GCConfig.small()
    ds = simulate(cfg, n_scans=args.scans, seed=0)
    scans = to_scan_inputs(ds, cfg)
    run = replay_jit(cfg)

    state = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
    t0 = time.perf_counter()
    state, out = run(state, scans)
    jax.block_until_ready(out.pose)
    print(f"compile+first run: {time.perf_counter() - t0:.1f} s")

    state = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
    with jax.profiler.trace(args.out):
        state, out = run(state, scans)
        jax.block_until_ready(out.pose)

    planes = sorted(glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("no xplane.pb produced — profiler unsupported on this backend?")
        return
    xplane = planes[-1]
    print("xplane:", xplane)

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
        import json
        data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats^",
                                          {"tqx": "out:json"})
        tbl = json.loads(data) if isinstance(data, (str, bytes)) else data
        rows = tbl["table"]["rows"] if "table" in tbl else tbl["rows"]
        cols = [c["label"] for c in (tbl["table"]["cols"] if "table" in tbl
                                     else tbl["cols"])]
        i_name = cols.index("Operation") if "Operation" in cols else 1
        i_self = next(i for i, c in enumerate(cols) if "self" in c.lower()
                      and "time" in c.lower())
        print(f"{'op':60s} {'self_us':>12s}")
        for r in rows[: args.top]:
            c = [x["v"] if isinstance(x, dict) else x for x in r["c"]]
            print(f"{str(c[i_name])[:60]:60s} {c[i_self]!s:>12s}")
    except Exception as e:  # fall back: raw summary via op_profile
        print("framework_op_stats parse failed:", e)
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
        data, _ = rtd.xspace_to_tool_data([xplane], "op_profile^", {})
        open("/tmp/op_profile.json", "wb").write(
            data if isinstance(data, bytes) else data.encode())
        print("wrote /tmp/op_profile.json")


if __name__ == "__main__":
    main()
