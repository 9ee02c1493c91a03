"""Replay-mode ablation matrix (dev tool): per-scan cost inside the single
compiled lax.scan, under different structural knobs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
from fl_slam_tpu.pipeline import init_state, replay_jit


def run_case(name, T=50, **overrides):
    cfg = GCConfig.tpu(**overrides)
    ds = simulate(cfg, n_scans=T, seed=0)
    scans = to_scan_inputs(ds, cfg)
    run = replay_jit(cfg)
    state = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
    t0 = time.perf_counter()
    _, out = run(state, scans)
    jax.block_until_ready(out.pose)
    compile_s = time.perf_counter() - t0
    state = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
    t0 = time.perf_counter()
    _, out = run(state, scans)
    jax.block_until_ready(out.pose)
    ms = (time.perf_counter() - t0) / T * 1000
    print(f"{name:34s} {ms:9.2f} ms/scan  (compile {compile_s:6.1f} s)",
          flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run_case("baseline (prod)")
    run_case("no merge", k_merge_pairs=0)
    run_case("merge subset 128", merge_max_tile=128)
    run_case("k_hyp=1", k_hyp=1)
    run_case("n_points=4096", n_points=4096)
    run_case("n_surfel=512", n_surfel=512)
    run_case("view=512", m_tile_view=512)
    run_case("sinkhorn=20", k_sinkhorn=20)
    run_case("m_tile=24576", m_tile=24576)  # % 1024 == 0: DMA + page aligned
    run_case("per-slot view (no pages)", view_page=0)
    run_case("paged view 2048", m_tile_view=2048)
    run_case("R=1 paged", view_refresh_every=1)
    run_case("R=8 paged", view_refresh_every=8, T=64)
