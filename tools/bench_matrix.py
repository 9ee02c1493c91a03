"""Fused-step ablation matrix on the TPU (dev tool): which structural knob
owns the per-scan wall clock?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
from fl_slam_tpu.pipeline import init_state, make_step


def run_case(name, **overrides):
    cfg = GCConfig.tpu(**overrides)
    ds = simulate(cfg, n_scans=8, seed=0)
    scans = to_scan_inputs(ds, cfg)
    state = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
    step = make_step(cfg)
    scan0 = jax.tree.map(lambda a: a[0], scans)
    t0 = time.perf_counter()
    state, out = step(state, scan0)
    jax.block_until_ready(out.pose)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 7
    for i in range(1, 8):
        state, out = step(state, jax.tree.map(lambda a: a[i], scans))
    jax.block_until_ready(out.pose)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s} {ms:9.2f} ms/scan  (compile {compile_s:6.1f} s)",
          flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run_case("baseline (prod)")
    run_case("k_hyp=1", k_hyp=1)
    run_case("no merge", k_merge_pairs=0)
    run_case("k_hyp=1 + no merge", k_hyp=1, k_merge_pairs=0)
    run_case("pool16", n_tiles_pool=16)
    run_case("m_tile=12500", m_tile=12500)
    run_case("imu_len=128", imu_len=128)
    run_case("view=256", m_tile_view=256)
