"""Batched-replay throughput: N independent SLAM instances on the local mesh.

Measures aggregate scan-instances/second for the instance-vmapped replay
(`fl_slam_tpu/parallel/replicas.py`) at production budgets with the Pallas
kernels ON (round-3: the batched kernels lower natively; round-2 force-
disabled them and paid 6.3x aggregate throughput).

Usage: python tools/bench_batched.py [--instances 8] [--scans 50] [--xla]

Prints one JSON line with aggregate + per-instance rates and the
single-instance comparison point.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", type=int, default=8)
    ap.add_argument("--scans", type=int, default=50)
    ap.add_argument("--xla", action="store_true",
                    help="force-disable the Pallas kernels (round-2 mode)")
    ap.add_argument("--single", action="store_true",
                    help="also measure the single-instance replay rate")
    ap.add_argument("--trace", default=None,
                    help="capture an xplane profile of one batched run here")
    args = ap.parse_args()

    from fl_slam_tpu.config import GCConfig
    from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
    from fl_slam_tpu.parallel.replicas import (
        batched_replay, init_states_batched, make_mesh, shard_scan_inputs)

    on_accel = jax.default_backend() not in ("cpu",)
    cfg = GCConfig.tpu() if on_accel else GCConfig.small()
    if args.xla:
        cfg = cfg.replace(slab_dma_kernel=False, sinkhorn_kernel=False,
                          belief_kernel=False, surfel_moment_kernel=False)

    B, T = args.instances, args.scans
    ds = simulate(cfg, n_scans=T, seed=0)
    scans1 = to_scan_inputs(ds, cfg)
    # instances replay the same bag (different bags would change nothing
    # about the compiled program; this bench measures throughput)
    scans = jax.tree.map(
        lambda a: np.broadcast_to(np.asarray(a)[None],
                                  (B,) + a.shape).copy(), scans1)

    mesh = make_mesh()
    run = batched_replay(cfg, mesh)
    scans = shard_scan_inputs(scans, mesh)

    # Fail fast on HBM before allocating anything (certs.memory_envelope:
    # the measured v5e density limit is 8 instances/chip at production).
    from fl_slam_tpu.certs import pytree_bytes
    staged = pytree_bytes(scans)
    n_dev = len(mesh.devices.flat)
    t0_anchor = float(ds.gt_stamps[0]) - 0.1
    states = init_states_batched(cfg, B, t0=t0_anchor, n_devices=n_dev,
                                 staged_bytes=staged)
    t0 = time.perf_counter()
    states, outs = run(states, scans)
    jax.block_until_ready(outs.pose)
    compile_s = time.perf_counter() - t0
    assert np.isfinite(np.asarray(outs.pose)).all()

    best = float("inf")
    for _ in range(3):
        states = init_states_batched(cfg, B, t0=t0_anchor, n_devices=n_dev,
                                     staged_bytes=staged)
        jax.block_until_ready(states)
        t0 = time.perf_counter()
        states, outs = run(states, scans)
        jax.block_until_ready(outs.pose)
        best = min(best, time.perf_counter() - t0)

    if args.trace:
        import shutil
        shutil.rmtree(args.trace, ignore_errors=True)
        states = init_states_batched(cfg, B, t0=t0_anchor, n_devices=n_dev,
                                     staged_bytes=staged)
        jax.block_until_ready(states)
        with jax.profiler.trace(args.trace):
            states, outs = run(states, scans)
            jax.block_until_ready(outs.pose)
        print(f"# trace written to {args.trace}", file=sys.stderr)

    agg = B * T / best
    result = {
        "metric": "batched_replay_throughput",
        "value": round(agg, 1),
        "unit": "scan_instances_per_sec",
        "extra": {
            "instances": B,
            "scans": T,
            "backend": jax.default_backend(),
            "kernels": "xla" if args.xla else "pallas",
            "compile_s": round(compile_s, 1),
            "per_instance_ms_per_scan": round(1000.0 * best / T, 3),
            "aggregate_x_realtime_10hz": round(agg / 10.0, 1),
        },
    }

    if args.single:
        from fl_slam_tpu.pipeline import init_state, replay_jit
        run1 = replay_jit(cfg)
        state = init_state(cfg, t0=t0_anchor)
        state, outs1 = run1(state, scans1)
        jax.block_until_ready(outs1.pose)
        best1 = float("inf")
        for _ in range(3):
            state = init_state(cfg, t0=t0_anchor)
            jax.block_until_ready(state)
            t0 = time.perf_counter()
            state, outs1 = run1(state, scans1)
            jax.block_until_ready(outs1.pose)
            best1 = min(best1, time.perf_counter() - t0)
        result["extra"]["single_instance_scans_per_sec"] = round(T / best1, 1)
        result["extra"]["single_instance_ms_per_scan"] = round(
            1000.0 * best1 / T, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
