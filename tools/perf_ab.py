"""Interleaved A/B replay benchmark protocol (docs/PERF_NOTES.md):
best-of-N per case with cases alternated within ONE process, so shared-
tunnel tenant drift (~+-0.15 ms/scan between processes) cancels. Edit
CASES for the ablation at hand.

Usage: python tools/perf_ab.py
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
from fl_slam_tpu.pipeline import init_state, replay_jit

T = 200
CASES = {
    "fuse_scatter": dict(fuse_moment_kernel=False),
    "fuse_moment_kernel": dict(fuse_moment_kernel=True),
}
print("backend:", jax.default_backend(), flush=True)
runs = {}
for name, ov in CASES.items():
    cfg = GCConfig.tpu(**ov)
    ds = simulate(cfg, n_scans=T, seed=0)
    scans = to_scan_inputs(ds, cfg)
    run = replay_jit(cfg)
    st = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
    t0 = time.perf_counter()
    _, out = run(st, scans)
    jax.block_until_ready(out.pose)
    print(f"compile {name}: {time.perf_counter()-t0:.1f} s", flush=True)
    runs[name] = (cfg, ds, scans, run, [])

for rep in range(4):
    for name, (cfg, ds, scans, run, times) in runs.items():
        st = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        _, out = run(st, scans)
        jax.block_until_ready(out.pose)
        times.append((time.perf_counter() - t0) / T * 1000)

for name, (_, _, _, _, times) in runs.items():
    print(f"{name:18s} min {min(times):.3f}  all "
          f"{[round(t,3) for t in times]} ms/scan", flush=True)
