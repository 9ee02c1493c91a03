"""The per-scan inference step and bag replay (parity: reference
``backend/pipeline.py:316-1591`` ``process_scan_single_hypothesis`` +
``backend_node.py`` orchestration + ``process_hypotheses``).

TPU-first architecture (SURVEY.md section 7.1): the entire 14-step fixed-cost
pipeline is ONE pure function ``process_scan(state, scan, cfg)`` with static
shapes, compiled once and driven by ``lax.scan`` over the pre-staged bag
(``replay``). There is no ROS, no threads, no host round-trips: certificates
are device scalars collected per scan and returned as stacked arrays.

Multi-hypothesis: the K_HYP hypothesis bank is a leading vmap axis on the
belief (the reference loops a Python list, ``backend_node.py:2036``). The
22D algebra (predict -> evidence -> fuse -> recompose -> anchor drift) is
vmapped per hypothesis; the measurement-side branch (deskew, surfels, map
view, OT association, visual evidence residuals) is computed once at
hypothesis 0's linearization point and shared — exactly the reference's
behavior, where all hypotheses see identical inputs and the map is updated
from hypothesis 0 only (``backend_node.py:2079``). Per-scan the bank is
combined by the information barycenter for the published pose, and IW
sufficient statistics are hypothesis-weight-averaged before the single
per-scan apply.

Step map (reference step -> here):
   1 point budget        host/io layer (ops.point_budget, applied at staging)
   2 predict             ops.predict.predict_diffusion (mechanized; vmapped)
   3 soft IMU windows    ops.imu.smooth_window_weights x2
   4 preintegration x2   ops.imu.preintegrate (lax.scan over imu_len)
   5 deskew              ops.deskew.deskew_constant_twist (batched)
   6 IMU+odom evidence   ops.imu / ops.odom / ops.priors (vmapped over K)
   7 map branch          ops.surfels -> structures.atlas view -> ops.association
                         at hypothesis 0's z_lin (world frame; see
                         ops/association.py docstring)
   8 visual evidence     ops.visual_evidence at z_lin[0]; absolute lift per hyp
   9 tempering           ops.fusion.power_tempering_beta (vmapped)
  10 trust alpha         ops.fusion.fusion_alpha (constant 1 at ref. config)
  11 additive fusion     ops.fusion.info_fusion_additive (vmapped)
  12 recompose           ops.recompose.frobenius_recompose (vmapped)
  12b map update         atlas.fuse / insert / cull / forget / merge at z_t[0]
  13 anchor drift        ops.recompose.anchor_drift_update (vmapped)
  14 certs               hypothesis-0 slice of the vmapped cert dicts
  15 hypothesis combine  ops.hypothesis.barycenter_projection
  (IW apply once/scan)   ops.noise.process/measurement_apply_suffstats
"""

from __future__ import annotations

import time as _time
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fl_slam_tpu.config import (
    D_Z, GCConfig, GRAVITY_W, IDX_BA, IDX_BG, IDX_DT, IDX_POSE, IDX_VEL,
)
from fl_slam_tpu.core import se3
from fl_slam_tpu.core.belief import (
    Belief, floor_and_normalize_weights, identity_belief, world_pose,
    world_pose_from_increment,
)
from fl_slam_tpu.core.hexgrid import (
    stencil_offsets_3d, stencil_tile_keys, tile_keys_from_xyz, xyz_to_tile_axial,
)
from fl_slam_tpu.core.linalg import spd_inverse_lifted, spd_solve_lifted
from fl_slam_tpu.ops import association as assoc_ops
from fl_slam_tpu.ops import belief_kernels
from fl_slam_tpu.ops import deskew as deskew_ops
from fl_slam_tpu.ops import fusion as fusion_ops
from fl_slam_tpu.ops import hypothesis as hyp_ops
from fl_slam_tpu.ops import imu as imu_ops
from fl_slam_tpu.ops import noise as noise_ops
from fl_slam_tpu.ops import odom as odom_ops
from fl_slam_tpu.ops import predict as predict_ops
from fl_slam_tpu.ops import priors as prior_ops
from fl_slam_tpu.ops import recompose as recompose_ops
from fl_slam_tpu.ops import surfels as surfel_ops
from fl_slam_tpu.ops.visual_evidence import visual_pose_evidence
from fl_slam_tpu.structures import atlas as atlas_ops
from fl_slam_tpu.structures import atlas_kernels
from fl_slam_tpu.structures import measurement_batch as mb


class ScanInput(NamedTuple):
    """One scan record; all fixed shapes, built host-side by the io layer."""

    points: jnp.ndarray         # (n_points, 3) base frame, sentinel-padded
    point_stamps: jnp.ndarray   # (n_points,) absolute seconds
    point_weights: jnp.ndarray  # (n_points,) range weights; 0 = padding
    scan_start: jnp.ndarray     # () seconds — THE scan clock t_scan: the
                                # belief/evidence timestamp and deskew target
                                # frame (points are deskewed to body@scan_start)
    scan_end: jnp.ndarray       # () seconds (sweep end; deskew window only)
    imu_stamps: jnp.ndarray     # (imu_len,) ascending, 0-padded tail
    imu_gyro: jnp.ndarray       # (imu_len, 3) rad/s
    imu_accel: jnp.ndarray      # (imu_len, 3) m/s^2
    odom_pose: jnp.ndarray      # (6,) [t, rotvec] world
    odom_cov: jnp.ndarray       # (6, 6)
    odom_vel_body: jnp.ndarray  # (3,)
    odom_omega_body: jnp.ndarray  # (3,)
    # Camera slice (RGB-D visual features; zeros when no camera). Base frame.
    cam_Lambdas: jnp.ndarray    # (n_feat, 3, 3)
    cam_thetas: jnp.ndarray     # (n_feat, 3)
    cam_etas: jnp.ndarray       # (n_feat, B, 3)
    cam_weights: jnp.ndarray    # (n_feat,)
    cam_valid: jnp.ndarray      # (n_feat,) 1.0/0.0
    cam_colors: jnp.ndarray     # (n_feat, 3)


class PipelineState(NamedTuple):
    """The lax.scan carry: everything that persists across scans.

    The active tiles' slabs are RESIDENT in the carry (``slabs`` +
    ``slab_slots``/``slab_keys``): pool<->slab movement costs ~2 ms/scan
    (dynamic-offset DMA of 7x5.6 MB each way) but the active tile set only
    changes when the robot crosses a tile boundary (every ~15-20 scans), so
    the flush + regather runs under ``lax.cond`` on set change and
    steady-state scans touch only the slabs. ``atlas`` holds the inactive
    tiles and is stale for the active ones until the next flush;
    ``flush_slabs`` reconciles (replay() does it after the scan loop).
    """

    belief: Belief              # K_HYP-stacked hypothesis bank
    mu: jnp.ndarray             # (K_HYP, D_Z) lifted means of the bank:
                                # (L + eps_lift I)^{-1} h, threaded across
                                # scans (the tail produces them for free off
                                # its existing factorization — no front-of-
                                # scan batched Cholesky)
    Sigma: jnp.ndarray          # (K_HYP, D_Z, D_Z) lifted covariances
                                # (L + eps_lift I)^{-1}, threaded like mu:
                                # feeds the OU predict's cov_prev (kernel B
                                # skips its leading factorization) and the
                                # dt marginal (window softness)
    pose_prev7: jnp.ndarray     # (7,) hyp-0 world pose the threaded mean
                                # encodes (anchor + Exp(mu[pose])), and
    R_prev: jnp.ndarray         # (3, 3) its rotation — produced by the tail
                                # so the scan front runs no scalar
                                # quaternion chains
    hyp_weights: jnp.ndarray    # (K_HYP,)
    process_noise: noise_ops.ProcessNoiseIW
    meas_noise: noise_ops.MeasurementNoiseIW
    atlas: atlas_ops.AtlasMap
    slabs: atlas_ops.SlabsFF    # resident working set, col-major (CF, S*M)
    slab_slots: jnp.ndarray     # (S,) int32 pool slots of the resident slabs
    slab_keys: jnp.ndarray      # (S,) int64 tile keys of the resident slabs
    scan_seq: jnp.ndarray       # () int32
    prev_scan_t: jnp.ndarray    # () previous scan clock (scan_start)
    odom_prev6: jnp.ndarray     # (6,) previous scan's raw odom pose (for
                                # the relative-odometry factor; see
                                # GCConfig.odom_pose_relative)


class ScanOutput(NamedTuple):
    pose: jnp.ndarray           # (6,) barycenter world pose [t, rotvec]
    stamp: jnp.ndarray          # () scan clock
    certs: dict                 # flat dict of device scalars


class ViewCtx(NamedTuple):
    """Per-chunk resident view (see GCConfig.view_refresh_every): the
    gathered candidate rows live in the inner-scan carry; fuse/merge update
    them in place and ONE scatter writes them back at the chunk boundary."""

    rows: jnp.ndarray           # (V, CF) resident field rows
    slab_cols: jnp.ndarray      # (V,) int32 slab-flat source columns
    dup: jnp.ndarray            # (V,) bool duplicate rows (dropped on put)
    prim_ids: jnp.ndarray       # (V,) int32
    put_idx: jnp.ndarray        # (V,) int32 write-back columns (SM = drop);
                                # doubles as the insert-eviction exclusion
                                # list (ff_insert membership test)
    active_keys: jnp.ndarray    # (S,) int64 tile keys of this chunk
    certs: dict                 # boundary certs (constant within the chunk)
    put_pages: object = None    # paged mode (cfg.view_page): (S*Vp,) int32
                                # flat page write-back targets (S*npg = drop)
                                # + the insert page-exclusion list
    page_stats: object = None   # paged mode: (inv_cnt, ret_pg) (S, npg)
                                # insert-targeting aggregates, chunk-seeded
                                # and maintained by ff_insert


def _kw_view(cfg: GCConfig) -> int:
    """Weight-half prefix length of the view rows (the merge-reduce scope).

    Paged membership keeps the weight half as whole pages (first in row
    order), so the merge prefix covers exactly those pages."""
    if cfg.view_page:
        vp = cfg.m_tile_view // cfg.view_page
        npg = cfg.m_tile // cfg.view_page
        return min(vp - vp // 2, npg) * cfg.view_page
    return min(cfg.m_tile_view - cfg.m_tile_view // 2, cfg.m_tile)


def initial_belief(cfg: GCConfig, anchor0=None) -> Belief:
    """Datasheet-style per-block diagonal prior at the anchor.

    Pose is defined by the anchor (weak 1e-6); the non-pose components carry
    physically sized priors — in particular dt (sensor time offset) must NOT
    start with a ~1e3 s std or the soft-window machinery degenerates.
    """
    d = cfg.jdtype
    sig = jnp.concatenate([
        jnp.full((6,), 1e3, d),      # pose: anchor-defined
        jnp.full((3,), 1.0, d),      # vel  (m/s)
        jnp.full((3,), 0.01, d),     # gyro bias (rad/s)
        jnp.full((3,), 0.1, d),      # accel bias (m/s^2)
        jnp.full((1,), 0.05, d),     # dt offset (s)
        jnp.full((6,), 0.01, d),     # extrinsic
    ])
    L0 = jnp.diag(1.0 / sig ** 2)
    b = identity_belief(dtype=d, prior_info=1e-6, anchor=anchor0)
    return b._replace(L=L0.astype(d))


def mht_enabled(cfg: GCConfig) -> bool:
    """Static flag: the hypothesis bank carries real MHT semantics (diverse
    initial poses + per-scan likelihood weight updates). Off (spread 0) is
    reference parity: an identical bank with frozen uniform weights
    (``backend_node.py:2079-2083``, ``docs/PIPELINE_DESIGN_GAPS.md:396``)."""
    return cfg.k_hyp > 1 and (cfg.hyp_init_spread_rot > 0.0
                              or cfg.hyp_init_spread_trans > 0.0)


def hyp_perturbations(cfg: GCConfig) -> jnp.ndarray:
    """(K, D_Z) deterministic pose-block offsets for the hypothesis bank.

    Hypothesis 0 is unperturbed; k>=1 cycles [+yaw, +x, +y, -yaw, -x, -y]
    scaled by the configured spreads (doubling each full cycle) — a fixed,
    seedless design so replays stay bit-deterministic.
    """
    import numpy as np
    out = np.zeros((cfg.k_hyp, D_Z))
    pattern = [(5, cfg.hyp_init_spread_rot), (0, cfg.hyp_init_spread_trans),
               (1, cfg.hyp_init_spread_trans)]
    for k in range(1, cfg.k_hyp):
        i = k - 1
        idx, scale = pattern[i % 3]
        sign = -1.0 if (i // 3) % 2 else 1.0
        mag = scale * (1.0 + i // 6)
        out[k, idx] = sign * mag
    return jnp.asarray(out, dtype=cfg.jdtype)


def init_state(cfg: GCConfig, anchor0=None, prior_info: float = 1e-6,
               t0: float = 0.0) -> PipelineState:
    cfg.validate()   # fail-fast knob ranges (GCConfig.validate)
    one = initial_belief(cfg, anchor0=anchor0)
    bank = jax.tree.map(lambda a: jnp.stack([a] * cfg.k_hyp), one)
    if mht_enabled(cfg):
        # Perturb the in-chart MEAN (h = L @ delta), not the anchor: the bank
        # shares hypothesis 0's chart at t0, so the barycenter's information
        # average starts exactly consistent.
        delta = hyp_perturbations(cfg)                       # (K, D_Z)
        bank = bank._replace(h=bank.h + jnp.einsum(
            "kij,kj->ki", bank.L, delta))
    atlas = atlas_ops.empty_atlas(cfg)
    S = cfg.n_active_tiles
    slots0 = jnp.arange(S, dtype=jnp.int32)
    mu0, _ = spd_solve_lifted(bank.L, bank.h, cfg.eps_lift)
    Sigma0, _ = spd_inverse_lifted(bank.L, cfg.eps_lift)
    pose_prev7 = se3.pose7_plus(bank.anchor[0], mu0[0, IDX_POSE])
    return PipelineState(
        belief=bank,
        mu=mu0,
        Sigma=0.5 * (Sigma0 + jnp.swapaxes(Sigma0, -1, -2)),
        pose_prev7=pose_prev7,
        R_prev=se3.quat_to_R(pose_prev7[3:7]),
        hyp_weights=jnp.full((cfg.k_hyp,), 1.0 / cfg.k_hyp, dtype=cfg.jdtype),
        process_noise=noise_ops.init_process_noise(cfg),
        meas_noise=noise_ops.init_measurement_noise(cfg),
        atlas=atlas,
        # Consistent resident set: slabs of (empty) pool rows 0..S-1 with
        # sentinel keys no stencil produces -> the first scan refreshes.
        slabs=atlas_ops.gather_slabs_ff(atlas, slots0),
        slab_slots=slots0,
        slab_keys=jnp.full((S,), -2, dtype=jnp.int64),
        scan_seq=jnp.int32(0),
        prev_scan_t=jnp.asarray(t0, dtype=cfg.jdtype),
        odom_prev6=jnp.zeros((6,), dtype=cfg.jdtype),
    )


def flush_slabs(state: PipelineState) -> PipelineState:
    """Reconcile the pool with the resident slabs (end-of-replay / export)."""
    atlas = atlas_ops.scatter_slabs_ff(state.atlas, state.slab_slots,
                                       state.slabs)
    return state._replace(atlas=atlas)


def _chunk_begin(state: PipelineState, cfg: GCConfig, *,
                 gamma_power: int = 1) -> tuple[PipelineState, ViewCtx]:
    """Per-chunk map maintenance: tile activation + slab exchange + the
    dense inflate/forget/cull pass + view membership selection/gather.

    Runs once per ``view_refresh_every`` scans at a STATIC position in the
    chunked replay (R=1 == per scan == the reference cadence). The tile set
    derives from the CARRY's hypothesis-0 world pose (<= one scan staler
    than the reference's z_lin-based activation; the active disk has >= 2 m
    of margin at any ground-robot speed).
    """
    certs: dict = {}
    seq = state.scan_seq
    bel0 = jax.tree.map(lambda a: a[0], state.belief)
    pose0 = world_pose(bel0, cfg.eps_lift)

    offs = stencil_offsets_3d(cfg.r_active_xy, cfg.r_active_z)
    q, r, z = xyz_to_tile_axial(pose0[:3], cfg.h_tile)
    active_keys = stencil_tile_keys(q, r, z, offs)

    # Resident-slab refresh: the active tiles' slabs live in the carry and
    # only move when the tile set changes (every ~15-20 scans). The
    # reconciliation is a PREDICATED-DMA Pallas kernel with the pool and
    # slabs aliased in place (structures/atlas_kernels.py): XLA cannot
    # express a conditional no-op on a 358 MB buffer — a drop-mode scatter
    # still costs ~400 us/scan and a lax.cond on the pool copies it wholly.
    # The directory update (activate_tiles) runs unconditionally — with an
    # unchanged set every key is found and it is idempotent.
    refresh = ~jnp.all(active_keys == state.slab_keys)
    touch = state.atlas.tile_touch_seq.at[state.slab_slots].set(seq)
    atlas = state.atlas._replace(tile_touch_seq=touch,
                                 next_prim_id=state.slabs.next_prim_id)
    atlas, slots, fresh_mask, c = atlas_ops.activate_tiles(atlas, active_keys,
                                                           seq)
    certs.update(c)
    pool_f, pool_p, slab_ff, slab_fp = atlas_kernels.conditional_slab_exchange_ff(
        atlas.fdata, atlas.prim_ids, state.slabs.ff, state.slabs.prim_ids,
        state.slab_slots, slots, refresh, use_kernel=cfg.slab_dma_kernel)
    atlas = atlas._replace(fdata=pool_f, prim_ids=pool_p)
    sff = atlas_ops.SlabsFF(ff=slab_ff, prim_ids=slab_fp,
                            next_prim_id=state.slabs.next_prim_id)
    # ONE dense pass: fresh-clear + recency inflation + forget + cull (the
    # forget/cull scheduling delta is documented on ff_inflate_and_clear;
    # gamma_power applies the chunk's deferred forgetting composite).
    sff, c = atlas_ops.ff_inflate_and_clear(sff, fresh_mask, seq, cfg,
                                            gamma_power=gamma_power)
    certs.update(c)

    SM = sff.ff.shape[1]
    page_stats = None
    if cfg.view_page:
        pages, dupp = atlas_ops.ff_select_view_pages(sff, cfg.n_active_tiles,
                                                     cfg)
        rows, slab_cols, dup, view_pids, put_pages = atlas_ops.ff_gather_pages(
            sff, pages, dupp, cfg.n_active_tiles, cfg)
        page_stats = atlas_ops.ff_page_stats(sff, cfg.n_active_tiles, cfg,
                                             seq)
    else:
        slab_cols, dup = atlas_ops.ff_select_view_cols(sff,
                                                       cfg.n_active_tiles,
                                                       cfg)
        rows = sff.ff[:, slab_cols].T                        # (V, CF)
        view_pids = sff.prim_ids[slab_cols]
        put_pages = None
    put_idx = jnp.where(dup, jnp.int32(SM), slab_cols)

    if cfg.merge_at_chunk:
        # Chunk-cadence merge on the freshly gathered view (see
        # GCConfig.merge_at_chunk); _scan_core skips its per-scan merge.
        rows, c = atlas_ops.compact_merge_reduce(rows, cfg.n_active_tiles,
                                                 _kw_view(cfg), cfg)
        certs.update(c)

    state = state._replace(atlas=atlas, slabs=sff, slab_slots=slots,
                           slab_keys=active_keys)
    ctx = ViewCtx(rows=rows, slab_cols=slab_cols, dup=dup,
                  prim_ids=view_pids, put_idx=put_idx,
                  active_keys=active_keys, certs=certs, put_pages=put_pages,
                  page_stats=page_stats)
    return state, ctx


def _chunk_end(state: PipelineState, ctx: ViewCtx,
               cfg: GCConfig) -> PipelineState:
    """Write the resident view rows back to their slab columns (paged: one
    page scatter; else ONE column scatter; inserts never target resident
    columns/pages, so no clobbering)."""
    if cfg.view_page:
        sff = atlas_ops.ff_write_view_pages(state.slabs, ctx.put_pages,
                                            ctx.rows, cfg.n_active_tiles, cfg)
        return state._replace(slabs=sff)
    view_meta = atlas_ops.MapView(
        positions=None, Lambdas=None, directions=None, kappas=None,
        weights=None, valid=None, last_supported=None, prim_ids=None,
        slab_idx=ctx.slab_cols, packed=None, raw=None, put_idx=ctx.put_idx)
    sff = atlas_ops.ff_write_view(state.slabs, view_meta, ctx.rows)
    return state._replace(slabs=sff)


def process_scan(state: PipelineState, scan: ScanInput,
                 cfg: GCConfig) -> tuple[PipelineState, ScanOutput]:
    """One full scan at per-scan refresh cadence (reference parity; the
    chunked replay calls ``_chunk_begin`` / ``_scan_core`` / ``_chunk_end``
    at its own cadence)."""
    state, ctx = _chunk_begin(state, cfg, gamma_power=1)
    state, ctx, out = _scan_core(state, ctx, scan, cfg)
    state = _chunk_end(state, ctx, cfg)
    return state, out


def _scan_core(state: PipelineState, ctx: ViewCtx, scan: ScanInput,
               cfg: GCConfig) -> tuple[PipelineState, ViewCtx, ScanOutput]:
    dt = cfg.jdtype
    certs: dict = dict(ctx.certs)
    seq = state.scan_seq
    bel0_prev = jax.tree.map(lambda a: a[0], state.belief)

    dt_sec = jnp.clip(scan.scan_start - state.prev_scan_t, 1e-4, 20.0)
    gravity_w = jnp.asarray(GRAVITY_W, dtype=dt) * cfg.imu_gravity_scale

    # ---- steps 3-4 (shared): soft IMU windows + preintegration ---------------
    # Windows + preintegration run BEFORE predict so the preintegrated deltas
    # can mechanize the prediction mean. Biases/start rotation come from
    # hypothesis 0 (all hypotheses see identical inputs; reference behavior).
    # The bank's previous means and the dt marginal are THREADED through the
    # carry (state.mu / state.Sigma): the previous scan's tail produced them
    # off its own factorization, so the scan front runs zero Cholesky custom
    # calls (they used to be one batched (K, 22, 22) mean solve + one
    # triangular dt-column solve per scan).
    mu_prev_k = state.mu
    mu_prev0 = mu_prev_k[0]
    gyro_bias = mu_prev0[IDX_BG]
    accel_bias = mu_prev0[IDX_BA]

    dt_std = jnp.sqrt(jnp.maximum(
        state.Sigma[0, IDX_DT.start, IDX_DT.start], 0.0))
    # Window softness lives on the sensor time-offset scale (10-50 ms). The
    # reference only floors this (pipeline.py:438); without a ceiling a weak
    # initial dt prior (std ~ seconds) smears the windows flat and silently
    # attenuates all preintegrated deltas.
    sigma_warp = jnp.clip(dt_std, 0.01, 0.05)
    imu_valid = (scan.imu_stamps > 0.0).astype(dt)
    w_scan = imu_ops.smooth_window_weights(
        scan.imu_stamps, scan.scan_start, scan.scan_end, sigma_warp) * imu_valid
    w_int = imu_ops.smooth_window_weights(
        scan.imu_stamps, state.prev_scan_t, scan.scan_start, sigma_warp) * imu_valid
    # INTEGRATION measures use midpoint-evaluated interval weights with a
    # closed tail (ops/imu.window_interval_weights): the left-endpoint sum
    # under-integrated every window ~5% and the gyro relative factor then
    # enforced 5% under-rotation per scan against the absolute factors —
    # a persistent, trajectory-phase-locked yaw lag. Sample-point weights
    # (w_scan / w_int) still drive the per-sample statistics below.
    wm_scan, dtv_scan = imu_ops.window_interval_weights(
        scan.imu_stamps, scan.scan_start, scan.scan_end, sigma_warp)
    wm_int, dtv_int = imu_ops.window_interval_weights(
        scan.imu_stamps, state.prev_scan_t, scan.scan_start, sigma_warp)

    # Both windows preintegrate in ONE vmapped call (batch axis 2): the op
    # count halves and every 3x3 level of the blocked prefix product stays
    # a single batched einsum.
    pre2 = jax.vmap(lambda w, dtv: imu_ops.preintegrate(
        scan.imu_stamps, scan.imu_gyro, scan.imu_accel, w, None,
        gyro_bias, accel_bias, gravity_w, R_start=state.R_prev,
        dt_intervals=dtv))(jnp.stack([wm_scan, wm_int]),
                           jnp.stack([dtv_scan, dtv_int]))
    pre_scan = jax.tree.map(lambda a: a[0], pre2)
    pre_int = jax.tree.map(lambda a: a[1], pre2)

    dt_int = imu_ops.integration_time(scan.imu_stamps, state.prev_scan_t,
                                      scan.scan_start)
    dt_imu = imu_ops.mean_sample_period(scan.imu_stamps)
    omega_avg = imu_ops.weighted_mean_rate(scan.imu_gyro, w_int, gyro_bias,
                                           cfg.eps_mass)
    certs["imu.ess_scan"] = pre_scan["ess"]
    certs["imu.ess_int"] = pre_int["ess"]
    certs["imu.dt_int"] = dt_int

    # The soft membership window attenuates the preintegrated deltas by its
    # sigmoid edges (by design for evidence; wrong for mechanization, where it
    # would systematically shrink the predicted motion). Rescale by actual
    # IMU coverage over effective weighted time — exact under the constant-
    # twist assumption the deskew already makes.
    cover = jnp.clip(dt_int / jnp.maximum(pre_int["dt_eff_sum"],
                                          cfg.eps_mass), 1.0, 2.0)
    motion = predict_ops.MotionDelta(
        delta_rotvec=pre_int["delta_pose"][3:6] * cover,
        delta_p_body=pre_int["delta_p"] * cover * cover,
        delta_v_body=pre_int["delta_v"] * cover)
    certs["predict.window_coverage_scale"] = cover

    Q = noise_ops.process_noise_to_Q(state.process_noise, cfg.eps_psd, cfg)
    sigma_g = noise_ops.measurement_noise_mean(state.meas_noise, 0, cfg.eps_psd)
    sigma_a = noise_ops.measurement_noise_mean(state.meas_noise, 1, cfg.eps_psd)

    # Measurement-noise IW suffstats (gyro/accel), commutative; hypothesis-
    # independent up to the shared hyp-0 linearization (reference accumulates
    # weight-scaled identical copies, backend_node.py:2085-2090).
    dpsi_gyro = imu_ops.gyro_iw_suffstats(
        scan.imu_gyro, w_int, gyro_bias, omega_avg, dt_imu,
        eps_mass=cfg.eps_mass, eps_psd=cfg.eps_psd)

    # ---- step 5 (shared): deskew ----------------------------------------------
    xi_body = pre_scan["delta_pose"]
    xi_body = xi_body.at[:3].mul(0.0 if cfg.deskew_rotation_only else 1.0)
    # Component planes (3, N) from here on (see ops/deskew.py layout note).
    points_dsk, w_dsk, c = deskew_ops.deskew_constant_twist(
        scan.points.T, scan.point_stamps, scan.point_weights,
        scan.scan_start, scan.scan_end, xi_body,
        time_warp_sigma_frac=cfg.time_warp_sigma_frac, eps_mass=cfg.eps_mass)
    certs.update(c)

    # ---- steps 2+6 per hypothesis: mechanized predict + IMU/odom evidence -----
    def predict_and_evidence(bel_prev: Belief, mu_prev, sigma_prev):
        k_certs: dict = {}
        pose_prev = world_pose_from_increment(bel_prev, mu_prev)
        belief_pred, mu_pred, c = predict_ops.predict_diffusion(
            bel_prev, Q, dt_sec, lambda_ou=cfg.ou_lambda, eps_psd=cfg.eps_psd,
            eps_lift=cfg.eps_lift, motion=motion, mean_prev=mu_prev,
            cov_prev=sigma_prev)
        k_certs.update(c)
        # Exact: h_pred = L_pred @ mu_pred by construction (predict returns
        # the mechanized mean; no lifted re-solve).
        pose_pred = world_pose_from_increment(belief_pred, mu_pred)
        vel_pred = mu_pred[IDX_VEL]

        L_io = jnp.zeros_like(belief_pred.L)
        h_io = jnp.zeros_like(belief_pred.h)

        if cfg.odom_pose_relative:
            # relative-odometry target: previous ESTIMATE composed with the
            # scan-to-scan odom increment (drift-free to first order); the
            # first scan anchors on the absolute pose. A cfg.odom_pose_mix
            # share of the ABSOLUTE factor (rotation scaled by
            # odom_pose_rot_scale) blends back in as the anchor.
            d_od = se3.se3_minus(scan.odom_pose, state.odom_prev6)
            tgt = se3.se3_plus(pose_prev, d_od)
            odom_target = jnp.where(state.scan_seq == 0, scan.odom_pose,
                                    tgt)
            mix = cfg.odom_pose_mix
            L1r, h1r, dz_odom, c = odom_ops.quadratic_pose_evidence(
                pose_pred, odom_target, scan.odom_cov,
                eps_psd=cfg.eps_psd, eps_lift=cfg.eps_lift)
            L1a, h1a, _, _ = odom_ops.quadratic_pose_evidence(
                pose_pred, scan.odom_pose, scan.odom_cov,
                eps_psd=cfg.eps_psd, eps_lift=cfg.eps_lift,
                rot_scale=cfg.odom_pose_rot_scale)
            L1 = (1.0 - mix) * L1r + mix * L1a
            h1 = (1.0 - mix) * h1r + mix * h1a
        else:
            L1, h1, dz_odom, c = odom_ops.quadratic_pose_evidence(
                pose_pred, scan.odom_pose, scan.odom_cov,
                eps_psd=cfg.eps_psd, eps_lift=cfg.eps_lift,
                rot_scale=cfg.odom_pose_rot_scale)
        L_io = L_io + cfg.odom_pose_weight * L1
        h_io = h_io + cfg.odom_pose_weight * h1
        k_certs.update(c)

        Lg, hg, c = imu_ops.gravity_vmf_evidence(
            pose_pred[3:6], scan.imu_accel, scan.imu_gyro, w_int, accel_bias,
            gravity_w, dt_imu, eps_psd=cfg.eps_psd, eps_mass=cfg.eps_mass,
            eps_r=cfg.eps_r, blend_r0=cfg.kappa_blend_r0,
            blend_tau=cfg.kappa_blend_tau)
        s_dep = imu_ops.dependence_inflation_scale(
            c["imu_grav.transport_sigma"], cfg.eps_mass)
        L_io, h_io = L_io + s_dep * Lg, h_io + s_dep * hg
        k_certs.update(c)
        k_certs["imu_grav.dependence_scale"] = s_dep

        # The factors use the SAME coverage-corrected deltas as the mechanized
        # prediction — otherwise their high-precision residuals fight the
        # prediction by exactly the soft-window attenuation every scan.
        w_imu_f = cfg.imu_factor_weight
        L2, h2, c = imu_ops.gyro_rotation_evidence(
            pose_prev[3:6], pose_pred[3:6], motion.delta_rotvec, sigma_g,
            dt_int, eps_psd=cfg.eps_psd, eps_lift=cfg.eps_lift,
            eps_mass=cfg.eps_mass)
        L_io, h_io = L_io + w_imu_f * L2, h_io + w_imu_f * h2
        k_certs.update(c)

        L3, h3, c = imu_ops.preintegration_factor(
            pose_prev[:3], pose_prev[3:6], vel_pred, pose_pred[:3], vel_pred,
            motion.delta_v_body, motion.delta_p_body, sigma_a, dt_int,
            eps_psd=cfg.eps_psd, eps_lift=cfg.eps_lift, eps_mass=cfg.eps_mass)
        L_io, h_io = L_io + w_imu_f * L3, h_io + w_imu_f * h3
        k_certs.update(c)

        a_body_exp = jnp.cross(scan.odom_omega_body, scan.odom_vel_body)
        Lb, hb, c = imu_ops.accel_bias_evidence(
            pre_int["a_body_mean"], pose_pred[3:6], gravity_w,
            cfg.accel_bias_sigma, dt, a_body_expected=a_body_exp,
            perp_scale=cfg.ba_perp_scale)
        L_io, h_io = L_io + Lb, h_io + hb
        k_certs.update(c)

        L4, h4, c = prior_ops.planar_z_prior(pose_pred[2], cfg.planar_z_ref,
                                             cfg.planar_z_sigma, dt)
        L_io = L_io + cfg.planar_weight * L4
        h_io = h_io + cfg.planar_weight * h4
        k_certs.update(c)
        L5, h5, c = prior_ops.velocity_z_prior(vel_pred[2],
                                               cfg.planar_vz_sigma, dt)
        L_io = L_io + cfg.planar_weight * L5
        h_io = h_io + cfg.planar_weight * h5
        k_certs.update(c)

        sig_v = cfg.odom_twist_vel_sigma ** 2 * jnp.eye(3, dtype=dt)
        L6, h6, c = odom_ops.velocity_evidence(
            vel_pred, pose_pred[3:6], scan.odom_vel_body, sig_v,
            eps_psd=cfg.eps_psd, eps_lift=cfg.eps_lift)
        k_certs.update(c)
        L7, h7, c = odom_ops.yawrate_evidence(
            omega_avg[2], scan.odom_omega_body[2], cfg.odom_twist_wz_sigma, dt)
        k_certs.update(c)
        sig_w = cfg.odom_twist_wz_sigma ** 2 * jnp.eye(3, dtype=dt)
        L8, h8, r_tr, r_rt, c = odom_ops.pose_twist_consistency(
            pose_prev, pose_pred, scan.odom_vel_body, scan.odom_omega_body,
            dt_sec, sig_v, sig_w, eps_psd=cfg.eps_psd, eps_lift=cfg.eps_lift)
        k_certs.update(c)
        s_odom = (odom_ops.dependence_inflation_scale(r_tr, r_rt, cfg.eps_mass)
                  * cfg.odom_twist_weight)
        w_kin = cfg.odom_kinematic_weight
        L_io = L_io + s_odom * (L6 + L7 + w_kin * L8)
        h_io = h_io + s_odom * (h6 + h7 + w_kin * h8)
        k_certs["odom.dependence_scale"] = s_odom

        # ExpectedEffect pairs, one per factor (reference contract: EVERY
        # operator returns (result, certs, ExpectedEffect) —
        # certificates.py:348-510). predicted = the factor's nominal NLL
        # reduction at unit weight; realized = after the continuous
        # down-scalings actually applied (dependence inflation, ablation
        # weights). Divergence = how much the adaptive scalings shrank the
        # factor this scan. Mirrored in the kernel path
        # (belief_kernels._pe_math / PE_CERT_KEYS).
        def _pair(op, nll, scale):
            k_certs[op + ".effect_predicted"] = nll
            k_certs[op + ".effect_realized"] = scale * nll
        _pair("odom_pose", k_certs["odom_pose.nll_proxy"],
              cfg.odom_pose_weight)
        _pair("imu_grav", k_certs["imu_grav.nll_proxy"], s_dep)
        _pair("imu_gyro", k_certs["imu_gyro.nll_proxy"], w_imu_f)
        _pair("imu_preint", k_certs["imu_preint.nll_proxy"], w_imu_f)
        _pair("imu_ba", k_certs["imu_ba.nll_proxy"], 1.0)
        _pair("planar", k_certs["planar_z.nll_proxy"]
              + k_certs["planar_vz.nll_proxy"], cfg.planar_weight)
        _pair("odom_vel", k_certs["odom_vel.nll_proxy"], s_odom)
        _pair("odom_wz", k_certs["odom_wz.nll_proxy"], s_odom)
        _pair("odom_kin", k_certs["odom_kin.nll_proxy"], s_odom * w_kin)

        # Every factor above encodes h = L * r with r the residual measured AT
        # the prediction; information fusion needs the absolute chart target
        # h = L * (mu_pred + r). (The reference adds L*r directly — benign
        # only while the in-chart means stay near zero; with a mechanized
        # prediction it would cancel the predicted motion every scan.)
        h_io = h_io + L_io @ mu_pred

        # Linearization point (IMU+odom-informed; invariant of
        # docs/PIPELINE_ORDER_AND_EVIDENCE.md:19-22).
        z_lin, _ = spd_solve_lifted(belief_pred.L + L_io,
                                    belief_pred.h + h_io, cfg.eps_lift)
        return belief_pred, mu_pred, L_io, h_io, z_lin, dz_odom, k_certs

    if belief_kernels.use_scalar_tail_kernel(cfg):
        # Kernel B (ops/belief_kernels.predict_evidence): the whole per-pose
        # predict + evidence chain as ONE Pallas kernel. Only the big-array
        # reductions stay out here (the gravity resultant's sort-based MAD
        # has no Mosaic lowering; the accel moments are plain big reduces).
        grav = imu_ops.gravity_resultant(scan.imu_accel, scan.imu_gyro,
                                         w_int, accel_bias, dt_imu,
                                         cfg.eps_mass)
        acc_M2, acc_m1, acc_sw = imu_ops.accel_moments(
            scan.imu_accel, w_int, accel_bias, cfg.eps_mass)
        bel0_prev = jax.tree.map(lambda a: a[0], state.belief)
        (L_pred0, h_pred0, mu_pred0, L_io0, h_io0, z_lin0, xi_odom0,
         z_lin_pose, dpsi_accel, kcertB,
         R_zlin) = belief_kernels.predict_evidence(
            cfg, bel0_prev.L, bel0_prev.h, bel0_prev.anchor, mu_prev0,
            state.Sigma[0], state.R_prev, Q,
            sigma_g, sigma_a, scan.odom_cov, acc_M2, dt_sec=dt_sec,
            pre_ess=pre_int["ess"], dt_int=dt_int, dt_imu=dt_imu,
            grav_rbar=grav["rbar"], transport_sigma=grav["transport_sigma"],
            pose_prev=jnp.concatenate([state.pose_prev7[0:3],
                                       jnp.zeros((3,), dtype=dt)]),
            motion_rot=motion.delta_rotvec,
            motion_p=motion.delta_p_body, motion_v=motion.delta_v_body,
            omega_avg=omega_avg, a_body_mean=pre_int["a_body_mean"],
            odom_vel=scan.odom_vel_body, odom_omega=scan.odom_omega_body,
            odom_pose=scan.odom_pose, grav_xbar=grav["xbar"],
            acc_m1=acc_m1, acc_sw=acc_sw,
            odom_rel=se3.se3_minus(scan.odom_pose, state.odom_prev6),
            first_scan=(state.scan_seq == 0).astype(cfg.jdtype))
        certs["__packed__:pe"] = kcertB    # spliced by replay's pack()
        certs["imu_grav.rbar"] = grav["rbar"]
        certs["imu_grav.ess"] = grav["ess_w"]
        certs["imu_grav.reliability_mean"] = grav["rel_mean"]
        certs["imu_grav.transport_sigma"] = grav["transport_sigma"]
        certs["imu_grav.ess_ratio"] = grav["ess_w"] / (grav["ess_raw"]
                                                       + cfg.eps_mass)
        bel0_pred = Belief(L=L_pred0, h=h_pred0, anchor=bel0_prev.anchor)
        beliefs_pred = jax.tree.map(lambda a: a[None], bel0_pred)
        mu_pred_k = mu_pred0[None]
        L_io_k, h_io_k, z_lin_k = L_io0[None], h_io0[None], z_lin0[None]
        dz_odom_k = jnp.zeros((1, D_Z), dtype=dt).at[0, IDX_POSE].set(
            xi_odom0)
    else:
        (beliefs_pred, mu_pred_k, L_io_k, h_io_k, z_lin_k, dz_odom_k,
         certsA) = jax.vmap(predict_and_evidence)(state.belief, mu_prev_k,
                                                  state.Sigma)
        certs.update(jax.tree.map(lambda a: a[0], certsA))

        bel0_pred = jax.tree.map(lambda a: a[0], beliefs_pred)
        z_lin0 = z_lin_k[0]
        R_zlin = None
        z_lin_pose = se3.pose7_plus(bel0_pred.anchor, z_lin0[IDX_POSE])

        # accel IW suffstats at the hyp-0 predicted rotation
        dpsi_accel = imu_ops.accel_iw_suffstats(
            world_pose_from_increment(bel0_pred, mu_pred_k[0])[3:6],
            scan.imu_accel, w_int,
            accel_bias, gravity_w, dt_imu, eps_mass=cfg.eps_mass,
            eps_psd=cfg.eps_psd)

    # ---- step 7 (shared): map branch ------------------------------------------
    surf, c = surfel_ops.extract_surfels(points_dsk, w_dsk, cfg)
    certs.update(c)
    batch = mb.with_lidar_surfels(
        mb.empty_batch(cfg), cfg, Lambdas=surf["Lambdas"],
        thetas=surf["thetas"], etas=surf["etas"], weights=surf["weights"],
        valid=surf["valid"])
    # Camera slice [0, n_feat): RGB-D features staged by the io layer
    # (zeros = no camera; every consumer masks on valid).
    batch = mb.with_camera_features(
        batch, cfg, Lambdas=scan.cam_Lambdas, thetas=scan.cam_thetas,
        etas=scan.cam_etas, weights=scan.cam_weights,
        valid=scan.cam_valid > 0.5, colors=scan.cam_colors)
    batch_w = mb.transform_to_world(batch, z_lin_pose, eps_lift=cfg.eps_lift,
                                    R=R_zlin)

    # The candidate view derives from the RESIDENT rows (updated in place by
    # fuse/merge, so mid-chunk scans see the freshest data; only MEMBERSHIP
    # is chunk-stale — bounded by view_refresh_every-1 scans).
    sff = state.slabs
    view = atlas_ops.view_from_rows(ctx.rows, ctx.slab_cols, ctx.dup,
                                    ctx.prim_ids, sff.ff.shape[1], cfg)

    mu_w = mb.mean_positions(batch_w, cfg.eps_lift)
    dir_w = mb.mean_directions(batch_w, cfg.eps_mass)
    kap = mb.kappas(batch_w)
    assoc, c = assoc_ops.associate(mu_w, dir_w, kap, batch_w.valid, view,
                                   seq, cfg, meas_weights=batch_w.weights)
    certs.update(c)

    # ---- step 8 (shared residuals): visual pose evidence at z_lin[0] ----------
    L_vis, h_vis_rel, c = visual_pose_evidence(
        mu_w, batch_w.Lambdas, dir_w, kap, batch_w.valid, assoc, view,
        z_lin_pose, cfg, scan_seq=seq)
    certs.update(c)
    if not belief_kernels.use_scalar_tail_kernel(cfg):
        # Diagnostics: correction the visual evidence alone would apply at
        # z_lin (the kernel path emits these from inside scalar_tail — every
        # outside scalar-op chain costs ~2-10 us of per-op issue overhead).
        Lp6_d = L_vis[IDX_POSE, IDX_POSE]
        lift6 = 1e-9 + 1e-6 * jnp.trace(Lp6_d) / 6.0
        dz_vis, _ = spd_solve_lifted(Lp6_d,
                                     h_vis_rel[IDX_POSE]
                                     + Lp6_d @ z_lin0[IDX_POSE], lift6)
        dz_vis_rel = dz_vis - z_lin0[IDX_POSE]
        certs["visual.implied_dtrans_norm"] = jnp.linalg.norm(dz_vis_rel[:3])
        certs["visual.implied_dz"] = dz_vis_rel[2]
        certs["visual.implied_drot_norm"] = jnp.linalg.norm(dz_vis_rel[3:6])

    # LiDAR measurement-noise IW suffstats from weighted residuals.
    map_pos_cand = assoc.cand_packed[..., 0:3]
    r_lidar = jnp.einsum("nk,nki->ni", assoc.responsibilities,
                         map_pos_cand - mu_w[:, None, :])
    row_m = jnp.maximum(assoc.row_masses, cfg.eps_mass)
    dpsi_lidar = noise_ops.lidar_iw_suffstats(
        r_lidar / row_m[:, None], assoc.row_masses, cfg.eps_mass, cfg.eps_psd)

    ot_ess = certs["ot.ess"]
    ot_cost = certs["ot.total_cost"]

    # ---- steps 9-15 + IW: the scalar belief tail --------------------------------
    # On TPU at k_hyp=1 the whole chain (temper/fuse/recompose/drift/
    # barycenter/IW apply) runs as ONE Pallas kernel (ops/belief_kernels.py):
    # ~300 tiny HLOs of 22-D algebra, each below the ~0.4 us sequencing
    # floor, collapse into a single fused program. The XLA path below is the
    # reference implementation (CPU, K>1, MHT) and the equivalence oracle.
    if belief_kernels.use_scalar_tail_kernel(cfg):
        bel0 = jax.tree.map(lambda a: a[0], beliefs_pred)
        # cond feeds a cert + the (constant at alpha_min=alpha_max=1) trust
        # alpha; computed OUTSIDE the kernel on the untempered evidence
        # (eigvalsh has no Mosaic lowering; cond is scale-invariant, so the
        # missing beta factor only shifts which eigenvalues hit the floor).
        L_ev_raw = L_io_k[0] + cfg.visual_evidence_weight * L_vis
        cond_p6 = fusion_ops.pose6_conditioning(L_ev_raw, cfg.eps_psd)
        (L_fin, h_fin, anchor_fin, anchor_rec, z_drift, pose6_out, pnu,
         ppsi, mnu, mpsi, kcert, mu_next0, Sigma_next0, pose_prev7_next,
         R_prev_next, R_rec) = belief_kernels.scalar_tail(
            cfg, bel0.L, bel0.h, bel0.anchor, mu_pred_k[0], L_io_k[0],
            h_io_k[0], z_lin_k[0], L_vis, h_vis_rel,
            dz_odom_k[0][IDX_POSE], state.process_noise.nu,
            state.process_noise.psi, state.meas_noise.nu,
            state.meas_noise.psi, dpsi_gyro, dpsi_accel, dpsi_lidar,
            pre_int["ess"], ot_ess, ot_cost,
            certs["__packed__:pe"][belief_kernels.PE_CERT_KEYS.index(
                "imu_grav.psd_projection")], cond_p6)
        certs["fusion.cond_pose6"] = cond_p6
        certs["__packed__:tail"] = kcert   # spliced by replay's pack()
        beliefs_final = Belief(L=L_fin[None], h=h_fin[None],
                               anchor=anchor_fin[None])
        mu_next_k = mu_next0[None]
        Sigma_next_k = Sigma_next0[None]
        w_norm = jnp.ones((1,), dtype=dt)
        proc_noise = noise_ops.ProcessNoiseIW(nu=pnu, psi=ppsi)
        meas_noise = noise_ops.MeasurementNoiseIW(nu=mnu, psi=mpsi)
        pose_out = pose6_out
        z_t0 = anchor_rec
        R_zt = R_rec
    else:
        # ---- steps 9-13 per hypothesis: temper + fuse + recompose + drift ----------
        def fuse_and_recompose(belief_pred: Belief, mu_pred, L_io, h_io, z_lin):
            k_certs: dict = {}
            # Residuals are measured at z_lin: lift to the absolute chart target,
            # then temper (scan-to-map evidence is overconfident by construction;
            # see GCConfig.visual_evidence_weight).
            h_vis = h_vis_rel + L_vis @ z_lin
            L_v = cfg.visual_evidence_weight * L_vis
            h_v = cfg.visual_evidence_weight * h_vis

            L_ev = L_io + L_v
            h_ev = h_io + h_v
            ess_total = pre_int["ess"] + ot_ess
            s_dt, s_ex = fusion_ops.excitation_scales(L_ev, belief_pred.L,
                                                      cfg.exc_eps)
            exc_total = s_dt + s_ex
            beta, c = fusion_ops.power_tempering_beta(
                L_ev, ess_total, exc_total, power_beta_min=cfg.power_beta_min,
                power_beta_z_c=cfg.power_beta_z_c,
                power_beta_exc_c=cfg.power_beta_exc_c, eps_mass=cfg.eps_mass)
            k_certs.update(c)
            L_ev, h_ev = beta * L_ev, beta * h_ev

            L_prior, h_prior = fusion_ops.apply_excitation_prior_scaling(
                belief_pred.L, belief_pred.h, s_dt, s_ex)
            belief_pred = belief_pred._replace(L=L_prior, h=h_prior)
            k_certs["exc.s_dt"] = s_dt
            k_certs["exc.s_ex"] = s_ex

            cond_p6 = fusion_ops.pose6_conditioning(L_ev, cfg.eps_psd)
            nll_per_ess = ot_cost / jnp.maximum(ess_total, cfg.eps_mass)
            alpha = fusion_ops.fusion_alpha(
                cond_p6, ess_total, nll_per_ess, c["temper.dt_asymmetry"],
                c["temper.z_to_xy"], exc_total, beta, alpha_min=cfg.alpha_min,
                alpha_max=cfg.alpha_max, c0_cond=cfg.c0_cond,
                eps_mass=cfg.eps_mass)
            k_certs["fusion.cond_pose6"] = cond_p6

            belief_post, c = fusion_ops.info_fusion_additive(
                belief_pred, L_ev, h_ev, alpha, eps_psd=cfg.eps_psd)
            k_certs.update(c)

            trigger_mag = (k_certs["fusion.psd_projection"]
                           + certs["imu_grav.psd_projection"])
            belief_rec, z_lin_new, delta_pose, dz_new, c = \
                recompose_ops.frobenius_recompose(
                    belief_post, z_lin, trigger_mag, c_frob=cfg.c_frob,
                    eps_lift=cfg.eps_lift)
            k_certs.update(c)
            z_t = belief_rec.anchor

            # Process-noise IW suffstats (pred vs post), plus the ODOM INNOVATION
            # on the pose blocks. Pred-vs-post alone underestimates Q by the
            # filter gain (small gain -> small updates -> small learned Q: the
            # filter can never loosen an overconfident prior); the innovation
            # measures the actual per-scan prediction error independent of gain.
            # mu_pred = the mechanized prediction mean (pre excitation scaling —
            # the scaled prior is a fusion artifact, not the prediction);
            # mu_post = the recompose increment before the chart shift (same
            # (L, h) system recompose solved — no second solve).
            shift22 = jnp.zeros((D_Z,), dtype=dt).at[IDX_POSE].set(delta_pose)
            dpsi_q, dnu_q = noise_ops.process_suffstats(
                belief_pred.L, belief_pred.h, belief_post.L, belief_post.h,
                cfg.eps_lift, mu_pred=mu_pred, mu_post=dz_new + shift22)
            return belief_rec, z_lin_new, z_t, dz_new, dpsi_q, dnu_q, k_certs

        (beliefs_rec, z_lin_new_k, z_t_k, dz_new_k, dpsi_q_k, dnu_q_k,
         certsB) = jax.vmap(fuse_and_recompose)(beliefs_pred, mu_pred_k,
                                                L_io_k, h_io_k, z_lin_k)
        certs.update(jax.tree.map(lambda a: a[0], certsB))

        if mht_enabled(cfg):
            # Bayes weight update from each hypothesis's own odometry-innovation
            # NLL (its marginal-likelihood proxy; the residual is measured at
            # that hypothesis's predicted pose, so diverse hypotheses score
            # differently): w_k ∝ w_k exp(-nll_k / T). Rebased at the minimum
            # for overflow safety; floored/renormalized as the reference floors
            # its (static) weights.
            nll_k = certsA["odom_pose.nll_proxy"]                # (K,)
            logw = (jnp.log(jnp.maximum(state.hyp_weights, cfg.hyp_weight_floor))
                    - (nll_k - jnp.min(nll_k)) / cfg.hyp_nll_temp)
            w_hyp = floor_and_normalize_weights(
                jnp.exp(logw - jnp.max(logw)), cfg.hyp_weight_floor)
            certs["hyp.nll_spread"] = jnp.max(nll_k) - jnp.min(nll_k)
        else:
            w_hyp = floor_and_normalize_weights(state.hyp_weights,
                                                cfg.hyp_weight_floor)
        dpsi_q = jnp.einsum("k,kabc->abc", w_hyp, dpsi_q_k)
        dnu_q = jnp.einsum("k,ka->a", w_hyp, dnu_q_k)
        xi_err = dz_odom_k[0][IDX_POSE]
        xi_t = jnp.clip(xi_err[:3], -cfg.innovation_clip_trans,
                        cfg.innovation_clip_trans)
        xi_r = jnp.clip(xi_err[3:6], -cfg.innovation_clip_rot,
                        cfg.innovation_clip_rot)
        dpsi_q = dpsi_q.at[0, :3, :3].add(
            cfg.innovation_q_trans * jnp.outer(xi_t, xi_t))
        dpsi_q = dpsi_q.at[1, :3, :3].add(
            cfg.innovation_q_rot * jnp.outer(xi_r, xi_r))

        # ---- step 13 per hypothesis: anchor drift ----------------------------------
        def drift(bel, z_lin_new, dz_new):
            return recompose_ops.anchor_drift_update(
                bel, z_lin_new, m0=cfg.anchor_drift_m0, r0=cfg.anchor_drift_r0,
                eps_lift=cfg.eps_lift, dz=dz_new)
        # z_drift_k = (1 - rho) dz: after drift h = L @ z_drift holds exactly, so
        # z_drift_k IS the per-hypothesis mean increment (feeds the barycenter's
        # spread diagnostic below without a batched re-solve).
        beliefs_final, z_drift_k, certsC = jax.vmap(drift)(beliefs_rec,
                                                           z_lin_new_k, dz_new_k)
        certs.update(jax.tree.map(lambda a: a[0], certsC))

        # ---- step 15: hypothesis barycenter (published pose) ------------------------
        if mht_enabled(cfg):
            # Anchors diverge under per-hypothesis recompose/drift; transport
            # each (L, h, z_lin) into hypothesis 0's chart before averaging
            # (first order: z' = z + xi_k with xi_k = Log(X_a0^{-1} ∘ X_ak);
            # exact for the small inter-anchor offsets the bank develops).
            anchors_k = beliefs_final.anchor                     # (K, 7)
            xi_k = jax.vmap(lambda a: se3.pose7_minus(
                a, anchors_k[0]))(anchors_k)                     # (K, 6)
            e_k = jnp.zeros((cfg.k_hyp, D_Z), dtype=dt).at[:, IDX_POSE].set(xi_k)
            h_bar_in = beliefs_final.h + jnp.einsum(
                "kij,kj->ki", beliefs_final.L, e_k)
            z_bar_in = z_lin_new_k + e_k
            means_in = z_drift_k + e_k
            certs["hyp.anchor_spread"] = jnp.sum(xi_k ** 2)
        else:
            h_bar_in, z_bar_in = beliefs_final.h, z_lin_new_k
            means_in = z_drift_k
        L_bar, h_bar, z_lin_bar, w_norm, c = hyp_ops.barycenter_projection(
            beliefs_final.L, h_bar_in, z_bar_in, w_hyp,
            weight_floor=cfg.hyp_weight_floor, eps_psd=cfg.eps_psd,
            eps_lift=cfg.eps_lift, means=means_in)
        certs.update(c)
        bel_bar = Belief(L=L_bar, h=h_bar,
                         anchor=jax.tree.map(lambda a: a[0], beliefs_final).anchor)
        pose_out = world_pose(bel_bar, cfg.eps_lift)

        # ---- IW apply (once per scan) ------------------------------------------------
        proc_noise, c = noise_ops.process_apply_suffstats(
            state.process_noise, dpsi_q, dnu_q, cfg)
        certs.update(c)
        dpsi_meas = jnp.stack([dpsi_gyro, dpsi_accel, dpsi_lidar])
        dnu_meas = jnp.ones((3,), dtype=dt)
        meas_noise, c = noise_ops.measurement_apply_suffstats(
            state.meas_noise, dpsi_meas, dnu_meas, cfg)
        certs.update(c)

        z_t0 = z_t_k[0]

        # Thread next scan's lifted means + covariances (the solves the
        # scan front / predict used to run — moved here so the carry always
        # holds them; one batched factorization serves both).
        Sigma_next_k, _ = spd_inverse_lifted(beliefs_final.L, cfg.eps_lift)
        Sigma_next_k = 0.5 * (Sigma_next_k
                              + jnp.swapaxes(Sigma_next_k, -1, -2))
        mu_next_k = jnp.einsum("kij,kj->ki", Sigma_next_k, beliefs_final.h)
        pose_prev7_next = se3.pose7_plus(beliefs_final.anchor[0],
                                         mu_next_k[0, IDX_POSE])
        R_prev_next = se3.quat_to_R(pose_prev7_next[3:7])
        R_zt = None

    # ---- step 12b: map update at hypothesis 0's z_t ----------------------------
    # The whole scatter phase runs COMPACTLY on the view's (V, CF) rows:
    # fuse accumulates its delta there, merge runs on the weight-half prefix,
    # and ONE column scatter writes the rows back (forget/cull moved into the
    # scan-start dense pass; insert runs last against the written-back state,
    # with its below-threshold proposals pre-culled). Reference order was
    # fuse -> insert -> cull -> forget -> merge; each reordering delta is
    # bounded to one scan and documented on the respective atlas op.
    batch_t = mb.transform_to_world(batch, z_t0, eps_lift=cfg.eps_lift,
                                    R=R_zt)
    rows, c = atlas_ops.compact_fuse(view, batch_t, assoc.responsibilities,
                                     assoc.cand_view_idx, assoc.cand_valid,
                                     seq, cfg)
    certs.update(c)
    if not cfg.merge_at_chunk:
        rows, c = atlas_ops.compact_merge_reduce(rows, cfg.n_active_tiles,
                                                 _kw_view(cfg), cfg)
        certs.update(c)
    # The updated rows stay RESIDENT (ctx.rows); _chunk_end writes them back
    # with one column scatter. Inserts go straight to slab columns, with the
    # resident columns excluded from eviction (no write-back clobber); a
    # mid-chunk insert becomes view-matchable at the next membership refresh
    # (<= R-1 scans; merge-reduce absorbs interim duplicates).
    nov = assoc_ops.novelty_mass(assoc, batch_w.valid, cfg.eps_mass)
    if not cfg.camera_insert:
        # Camera features contribute EVIDENCE + fuse-into-existing only;
        # their novelty never proposes map primitives (see
        # GCConfig.camera_insert for the production-scale rationale).
        nov = nov * (batch_w.sources == mb.SOURCE_LIDAR).astype(nov.dtype)
    elif cfg.camera_insert_novelty_floor > 0.0:
        # Camera-landmark floor (GCConfig.camera_insert_novelty_floor):
        # geometry-explained != appearance-explained — let valid camera
        # rows keep at least a floor novelty so texture landmarks can
        # enter the map on lidar-covered surfaces.
        is_cam = (batch_w.sources == mb.SOURCE_CAMERA) & batch_w.valid
        nov = jnp.where(
            is_cam,
            jnp.maximum(nov, jnp.asarray(cfg.camera_insert_novelty_floor,
                                         nov.dtype)), nov)
    mu_t = mb.mean_positions(batch_t, cfg.eps_lift)
    meas_keys = tile_keys_from_xyz(mu_t, cfg.h_tile)
    if cfg.view_page:
        sff, c, page_stats = atlas_ops.ff_insert(
            sff, batch_t, nov, meas_keys, ctx.active_keys, seq, cfg,
            resident_pages=ctx.put_pages, page_stats=ctx.page_stats)
        ctx = ctx._replace(page_stats=page_stats)
    else:
        sff, c = atlas_ops.ff_insert(sff, batch_t, nov, meas_keys,
                                     ctx.active_keys, seq, cfg,
                                     evict_exclude=ctx.put_idx)
    certs.update(c)
    slabs = sff
    ctx = ctx._replace(rows=rows)

    new_state = state._replace(
        belief=beliefs_final,
        mu=mu_next_k,
        Sigma=Sigma_next_k,
        pose_prev7=pose_prev7_next,
        R_prev=R_prev_next,
        hyp_weights=w_norm,
        process_noise=proc_noise,
        meas_noise=meas_noise,
        slabs=slabs,
        scan_seq=seq + 1,
        prev_scan_t=scan.scan_start,
        odom_prev6=scan.odom_pose,
    )
    out = ScanOutput(pose=pose_out, stamp=scan.scan_start, certs=certs)
    return new_state, ctx, out


def make_step(cfg: GCConfig):
    """Jitted step function (cfg is closed over; shapes are static)."""
    def step(state, scan):
        return process_scan(state, scan, cfg)
    return jax.jit(step, donate_argnums=(0,))


def replay(state: PipelineState, scans: ScanInput, cfg: GCConfig):
    """Chunked lax.scan over a stacked ScanInput (leading time axis).

    Outer scan over T/R chunks, inner scan over R scans: the per-chunk map
    maintenance (_chunk_begin: activation/exchange/inflate/selection/gather)
    and the write-back scatter (_chunk_end) sit at STATIC chunk boundaries —
    no predication, no dead per-scan refresh cost. R = view_refresh_every
    (falls back to the largest divisor of T; R=1 == per-scan reference
    cadence). Returns (final_state, ScanOutput with stacked (T, ...) fields)
    — the single compiled program for the whole bag.
    """
    T = scans.scan_start.shape[0]
    R = max(1, int(cfg.view_refresh_every))
    while T % R != 0:
        R -= 1

    # The ~120 per-scan cert scalars are packed into ONE vector inside the
    # scanned body (one (T, C) output instead of ~120 per-scan update-slices
    # and output leaves; also shrinks the compiled graph) and unpacked to the
    # same dict shape afterwards — consumers see dict-of-(T,) either way.
    keys_box: list = []

    def pack(out):
        # Kernel cert VECTORS (``__packed__:*``) are spliced verbatim; only
        # genuine scalars are stacked. The unpack below expands the packed
        # groups to their registered names, so consumers see dict-of-(T,)
        # either way (see belief_kernels.PACKED_CERT_GROUPS).
        pk = sorted(k for k in out.certs if k.startswith("__packed__:"))
        sk = sorted(k for k in out.certs if not k.startswith("__packed__:"))
        if not keys_box:
            names = list(sk)
            for k in pk:
                names.extend(belief_kernels.PACKED_CERT_GROUPS[k])
            keys_box.append(names)
        parts = [jnp.stack([jnp.asarray(out.certs[k], dtype=cfg.jdtype)
                            for k in sk])]
        parts += [out.certs[k].astype(cfg.jdtype) for k in pk]
        return out._replace(certs=jnp.concatenate(parts))

    if R == 1:
        def step(carry, scan):
            new_state, out = process_scan(carry, scan, cfg)
            return new_state, pack(out)

        final, outs = jax.lax.scan(step, state, scans,
                                   unroll=max(1, cfg.scan_unroll))
        certs = {k: outs.certs[:, i] for i, k in enumerate(keys_box[0])}
        return flush_slabs(final), outs._replace(certs=certs)

    chunked = jax.tree.map(
        lambda a: a.reshape((T // R, R) + a.shape[1:]), scans)

    def inner(carry, scan):
        st, ctx = carry
        st, ctx, out = _scan_core(st, ctx, scan, cfg)
        return (st, ctx), pack(out)

    def chunk(carry, chunk_scans):
        st, ctx = _chunk_begin(carry, cfg, gamma_power=R)
        (st, ctx), outs = jax.lax.scan(inner, (st, ctx), chunk_scans,
                                       unroll=max(1, cfg.scan_unroll))
        return _chunk_end(st, ctx, cfg), outs

    final, outs = jax.lax.scan(chunk, state, chunked)
    outs = jax.tree.map(
        lambda a: a.reshape((T,) + a.shape[2:]), outs)
    certs = {k: outs.certs[:, i] for i, k in enumerate(keys_box[0])}
    return flush_slabs(final), outs._replace(certs=certs)


def replay_jit(cfg: GCConfig):
    return jax.jit(lambda state, scans: replay(state, scans, cfg),
                   donate_argnums=(0,))


def replay_segments(state: PipelineState, segments, cfg: GCConfig,
                    progress=None):
    """Replay a bag too large to stage on device at once: a host loop over
    pre-staged fixed-shape segments, ONE compiled program reused for all.

    One-shot staging costs ~0.5-1 MB/scan on device; an hour-long bag
    (36k scans) would not fit beside the ~400 MB tile pool. Segments bound
    staging memory, and the loop pipelines naturally: the jitted call
    dispatches asynchronously, so the host stages/uploads segment i+1 while
    the device replays segment i (the reference streams the bag through ROS
    at 0.25-0.5x rate instead — backend_node.py:1340-1389). Per-segment
    dispatch costs ~0.2 ms amortized over seg_len scans; use >= 512-scan
    segments where memory allows.

    ``segments``: iterable of stacked ScanInput, ALL with the same leading
    length (one compile; a different length recompiles). The final state and
    concatenated ScanOutput match the monolithic ``replay`` exactly when
    segment boundaries fall on ``view_refresh_every`` chunk boundaries (the
    inter-segment flush is an idempotent slab write-back and the resident
    set is carried in the state).
    """
    run = replay_jit(cfg)
    outs_list = []
    n_done = 0
    t0 = _time.perf_counter() if progress else 0.0
    for i, seg in enumerate(segments):
        state, outs = run(state, seg)
        # 1-deep pipeline: block on segment i-1 after dispatching i. Device
        # i runs while the host stages i+1 either way; the explicit block
        # (a) bounds in-flight memory and (b) forces the dispatch to FLUSH
        # on runtimes that defer execution until a blocking call (the
        # tunneled axon runtime was observed running zero segments until
        # the loop ended, serializing everything into the final wait).
        if outs_list:
            jax.block_until_ready(outs_list[-1].pose)
        outs_list.append(outs)
        if progress is not None:
            # NON-blocking progress: the dispatch is async, so the host
            # returns here immediately and the generator stages segment
            # i+1 WHILE the device replays segment i — blocking on
            # outs.pose (the round-3 behavior) serialized staging after
            # replay and forfeited the overlap. ``done`` counts segments
            # whose outputs are already materialized.
            n_done += int(outs.pose.shape[0])
            done = sum(int(o.pose.shape[0]) for o in outs_list
                       if o.pose.is_ready())
            progress(i, n_done, _time.perf_counter() - t0, done)
    if not outs_list:
        raise ValueError("replay_segments: empty segment iterable")
    merged = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                          *outs_list)
    return state, merged
