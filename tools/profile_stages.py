"""Per-stage TPU timing at production shapes (dev tool).

Times each pipeline stage as its own jitted function to find the wall-clock
offenders. Not a benchmark — stage boundaries force materialization that the
fused program avoids — but the ranking is what matters.
"""

import os
import sys
import time

# NOTE: do NOT use PYTHONPATH=/root/repo for TPU runs — the repo's top-level
# dirs shadow modules the axon jax plugin imports at discovery time.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.core.hexgrid import (
    stencil_offsets_3d, stencil_tile_keys, tile_keys_from_xyz,
    xyz_to_tile_axial)
from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
from fl_slam_tpu.ops import association as AS
from fl_slam_tpu.ops import deskew as DS
from fl_slam_tpu.ops import imu as IM
from fl_slam_tpu.ops import noise as NO
from fl_slam_tpu.ops import predict as PR
from fl_slam_tpu.ops import surfels as SF
from fl_slam_tpu.ops.visual_evidence import visual_pose_evidence
from fl_slam_tpu.structures import atlas as A
from fl_slam_tpu.structures import measurement_batch as MB
from fl_slam_tpu.pipeline import init_state


def bench_fn(name, fn, *args, n=10):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000.0
    print(f"{name:28s} {ms:9.3f} ms   (compile {compile_s:6.1f} s)")
    return ms


def main():
    cfg = GCConfig.tpu()
    print("backend:", jax.default_backend(), "| config: production")
    ds = simulate(cfg, n_scans=2, seed=0)
    scans = to_scan_inputs(ds, cfg)
    scan = jax.tree.map(lambda a: a[0], scans)
    state = init_state(cfg, t0=0.0)
    f = cfg.jdtype

    # predict
    Q = NO.process_noise_to_Q(state.process_noise, cfg.eps_psd)
    belief0 = jax.tree.map(lambda a: a[0], state.belief)  # hypothesis 0
    bench_fn("predict", lambda b: PR.predict_diffusion(
        b, Q, 0.1, lambda_ou=cfg.ou_lambda, eps_psd=cfg.eps_psd,
        eps_lift=cfg.eps_lift)[0].L, belief0)

    # preintegration (512-step lax.scan)
    bench_fn("preintegrate x1", lambda g: IM.preintegrate(
        scan.imu_stamps, g, scan.imu_accel,
        jnp.ones_like(scan.imu_stamps), jnp.zeros(3, f), jnp.zeros(3, f),
        jnp.zeros(3, f), jnp.asarray([0, 0, -9.81], f))["delta_pose"],
        scan.imu_gyro)

    # deskew
    bench_fn("deskew 8192", lambda p: DS.deskew_constant_twist(
        p, scan.point_stamps, scan.point_weights, scan.scan_start,
        scan.scan_end, jnp.zeros(6, f), time_warp_sigma_frac=0.1,
        eps_mass=1e-12)[0], scan.points.T)

    # surfels
    bench_fn("surfels 8192->1024", lambda p: SF.extract_surfels(
        p, scan.point_weights, cfg)[0]["Lambdas"], scan.points.T)

    # atlas ops
    atlas = state.atlas
    q, r, z = xyz_to_tile_axial(jnp.zeros(3, f), cfg.h_tile)
    offs = stencil_offsets_3d(cfg.r_active_xy, cfg.r_active_z)
    keys = stencil_tile_keys(q, r, z, offs)
    bench_fn("atlas.activate", lambda a: A.activate_tiles(a, keys, 0)[0].tile_keys, atlas)
    atlas, slots, _, _ = A.activate_tiles(atlas, keys, 0)
    bench_fn("atlas.recency_inflate", lambda a: A.recency_inflate(a, slots, 1, cfg)[0].lam6, atlas)
    bench_fn("atlas.extract_view", lambda a: A.extract_view(a, slots, cfg).positions, atlas)
    view = A.extract_view(atlas, slots, cfg)

    surf, _ = SF.extract_surfels(scan.points.T, scan.point_weights, cfg)
    batch = MB.with_lidar_surfels(MB.empty_batch(cfg), cfg,
                                  **{k: surf[k] for k in
                                     ("Lambdas", "thetas", "etas", "weights", "valid")})
    mu = MB.mean_positions(batch, cfg.eps_lift)
    mdir = MB.mean_directions(batch, cfg.eps_mass)
    mkap = MB.kappas(batch)
    bench_fn("associate (dense+sinkhorn)", lambda m: AS.associate(
        m, mdir, mkap, batch.valid, view, 0, cfg)[0].responsibilities, mu)
    assoc, _ = AS.associate(mu, mdir, mkap, batch.valid, view, 0, cfg)

    bench_fn("visual_evidence", lambda m: visual_pose_evidence(
        m, batch.Lambdas, mdir, mkap, batch.valid, assoc, view,
        jnp.zeros(6, f), cfg)[0], mu)

    bench_fn("atlas.fuse", lambda a: A.fuse(
        a, batch, assoc.responsibilities, assoc.cand_view_idx,
        assoc.cand_valid, view.slab_idx, 0, cfg, slots=slots)[0].weights, atlas)
    nov = AS.novelty_mass(assoc, batch.valid, cfg.eps_mass)
    mk = tile_keys_from_xyz(mu, cfg.h_tile)
    bench_fn("atlas.insert", lambda a: A.insert(
        a, batch, nov, mk, keys, slots, 0, cfg)[0].weights, atlas)
    bench_fn("atlas.cull", lambda a: A.cull(a, slots, cfg)[0].weights, atlas)
    bench_fn("atlas.forget", lambda a: A.forget(a, slots, cfg).weights, atlas)
    bench_fn("atlas.merge_reduce", lambda a: A.merge_reduce(a, slots, cfg)[0].weights, atlas)

    # IW apply
    dpsi = jnp.zeros((7, 6, 6), f)
    bench_fn("iw process apply", lambda s: NO.process_apply_suffstats(
        s, dpsi, jnp.ones(7, f), cfg)[0].psi, state.process_noise)


if __name__ == "__main__":
    main()
