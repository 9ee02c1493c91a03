"""Atlas map as one fixed-shape device structure (TPU-first redesign of the
reference ``backend/structures/primitive_map.py``).

The reference keeps a Python dict ``tile_id -> PrimitiveMapTile`` and loops
over ``n_blocks x active_tiles`` on the host every scan (its own docs flag this
as the dominant wall-clock cost, ``pipeline.py:1272-1447``). Here the atlas is
a **fixed pool**: ``n_tiles_pool`` tile slabs of ``m_tile`` primitive slots
each, stored as SoA arrays with leading shape ``(P, M)``, plus an int64
tile-key directory. Every operator (activate/inflate/view/fuse/insert/cull/
forget/merge) is a masked gather/scatter over these arrays, so the whole map
update jits into the single per-scan ``lax.scan`` step.

Semantics preserved from the reference (cited per function):
  - PoE fuse: ``Lambda += sum_k pi*Lambda_meas`` etc. (primitive_map.py:992+)
  - masked fixed-budget insert with lowest-retention eviction (:807-981)
  - weight-threshold cull with mass-drop logging (:1175-1304)
  - multiplicative forgetting (:1314-1384)
  - recency precision downscale, mean-preserving (:1400-1484)
  - Bhattacharyya merge-reduce, greedy disjoint pairs, moment matching
    (:1501-2031) — redesigned to run on a top-``merge_max_tile``-by-weight
    subset so it is ALWAYS active at production tile sizes (the reference
    no-ops whenever the tile exceeds its O(M^2) cap).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.core.linalg import inv3x3
from fl_slam_tpu.structures.measurement_batch import MeasurementBatch

EMPTY_KEY = jnp.int64(-1)
_GRAY = (0.5, 0.5, 0.5)


class AtlasMap(NamedTuple):
    """Fixed-pool tile atlas. P = n_tiles_pool, M = m_tile, B = vmf_n_lobes."""

    tile_keys: jnp.ndarray       # (P,) int64 packed hex keys; -1 = free
    tile_touch_seq: jnp.ndarray  # (P,) int32 last scan this tile was active
    Lambdas: jnp.ndarray         # (P, M, 3, 3)
    thetas: jnp.ndarray          # (P, M, 3)
    etas: jnp.ndarray            # (P, M, B, 3)
    weights: jnp.ndarray         # (P, M)
    cam_mass: jnp.ndarray        # (P, M)
    lidar_mass: jnp.ndarray      # (P, M)
    rgb_accum: jnp.ndarray       # (P, M, 3) camera-color accumulator
    rgb_denom: jnp.ndarray       # (P, M)
    rgb: jnp.ndarray             # (P, M, 3) resolved color (camera-dominant)
    created_seq: jnp.ndarray     # (P, M) int32
    last_supported: jnp.ndarray  # (P, M) int32 last scan with OT support
    prim_ids: jnp.ndarray        # (P, M) int64 global primitive ids; -1 empty
    valid: jnp.ndarray           # (P, M) bool
    next_prim_id: jnp.ndarray    # () int64


class MapView(NamedTuple):
    """Stitched fixed-size candidate pool over the active tiles.

    V = n_active_tiles * m_tile_view rows, deterministic order: tile-stencil
    order outer, weight-descending inner (parity: extract_atlas_map_view,
    primitive_map.py:356-450).
    """

    positions: jnp.ndarray       # (V, 3) world-frame means
    directions: jnp.ndarray      # (V, 3) primary vMF directions
    kappas: jnp.ndarray          # (V,)
    weights: jnp.ndarray         # (V,)
    valid: jnp.ndarray           # (V,) bool
    last_supported: jnp.ndarray  # (V,) int32
    prim_ids: jnp.ndarray        # (V,) int64
    global_idx: jnp.ndarray      # (V,) int32 flat index slot*M + m into pool


def empty_atlas(cfg: GCConfig) -> AtlasMap:
    P, M, B = cfg.n_tiles_pool, cfg.m_tile, cfg.vmf_n_lobes
    dt = cfg.jdtype
    return AtlasMap(
        tile_keys=jnp.full((P,), -1, dtype=jnp.int64),
        tile_touch_seq=jnp.full((P,), -1, dtype=jnp.int32),
        Lambdas=jnp.zeros((P, M, 3, 3), dtype=dt),
        thetas=jnp.zeros((P, M, 3), dtype=dt),
        etas=jnp.zeros((P, M, B, 3), dtype=dt),
        weights=jnp.zeros((P, M), dtype=dt),
        cam_mass=jnp.zeros((P, M), dtype=dt),
        lidar_mass=jnp.zeros((P, M), dtype=dt),
        rgb_accum=jnp.zeros((P, M, 3), dtype=dt),
        rgb_denom=jnp.zeros((P, M), dtype=dt),
        rgb=jnp.full((P, M, 3), 0.5, dtype=dt),
        created_seq=jnp.full((P, M), -1, dtype=jnp.int32),
        last_supported=jnp.full((P, M), -1, dtype=jnp.int32),
        prim_ids=jnp.full((P, M), -1, dtype=jnp.int64),
        valid=jnp.zeros((P, M), dtype=bool),
        next_prim_id=jnp.int64(0),
    )


# ---------------------------------------------------------------------------
# Tile directory: lookup + allocate (replaces dict tiles.get / create_empty).
# ---------------------------------------------------------------------------

def activate_tiles(atlas: AtlasMap, keys: jnp.ndarray,
                   scan_seq) -> Tuple[AtlasMap, jnp.ndarray, dict]:
    """Resolve S active tile keys to pool slots, allocating missing tiles.

    Allocation is deterministic: free slots first (lowest index), then the
    least-recently-active tile (oldest ``tile_touch_seq``, lowest index).
    Evicted slabs have their validity/weights cleared (contents of invalid
    slots are never read downstream). Returns (atlas', slots (S,) int32, certs).
    """
    P = atlas.tile_keys.shape[0]
    S = keys.shape[0]
    eq = keys[:, None] == atlas.tile_keys[None, :]          # (S, P)
    found = jnp.any(eq, axis=1)
    slot_found = jnp.argmax(eq, axis=1).astype(jnp.int32)

    # Eviction priority per pool slot (ascending = evict first): free slots get
    # -inf-like, active-this-call slots get +inf-like, else last-touch seq.
    matched_now = jnp.any(eq, axis=0)                        # (P,)
    is_free = atlas.tile_keys == EMPTY_KEY
    big = jnp.int32(2 ** 30)
    prio = jnp.where(matched_now, big,
                     jnp.where(is_free, jnp.int32(-(2 ** 30)),
                               atlas.tile_touch_seq))
    order = jnp.argsort(prio).astype(jnp.int32)              # (P,) evict order

    missing = ~found
    rank = jnp.cumsum(missing.astype(jnp.int32)) - 1         # (S,)
    slot_alloc = order[jnp.clip(rank, 0, P - 1)]
    slots = jnp.where(missing, slot_alloc, slot_found).astype(jnp.int32)

    # Clear evicted/new slabs (weights + validity suffice: all readers mask).
    clear = jnp.zeros((P,), dtype=bool).at[slots].set(missing, mode="drop")
    n_evicted = jnp.sum(clear & ~is_free)
    valid = jnp.where(clear[:, None], False, atlas.valid)
    weights = jnp.where(clear[:, None], 0.0, atlas.weights)
    last_supported = jnp.where(clear[:, None], jnp.int32(-1), atlas.last_supported)

    tile_keys = atlas.tile_keys.at[slots].set(keys)
    seq32 = jnp.asarray(scan_seq, dtype=jnp.int32)
    touch = atlas.tile_touch_seq.at[slots].set(seq32)
    atlas = atlas._replace(tile_keys=tile_keys, tile_touch_seq=touch,
                           valid=valid, weights=weights,
                           last_supported=last_supported)
    certs = {
        "atlas.tiles_allocated": jnp.sum(missing).astype(atlas.weights.dtype),
        "atlas.tiles_evicted": n_evicted.astype(atlas.weights.dtype),
    }
    return atlas, slots, certs


# ---------------------------------------------------------------------------
# Recency inflation (parity: primitive_map_recency_inflate, :1400-1484).
# ---------------------------------------------------------------------------

def recency_inflate(atlas: AtlasMap, slots: jnp.ndarray, scan_seq,
                    cfg: GCConfig) -> Tuple[AtlasMap, dict]:
    """Downscale precision of stale primitives in the active slabs.

    decay = clip(exp(-lambda * (seq - last_supported)), min_scale, 1); scales
    Lambda AND theta together (mean-preserving); vMF etas untouched.
    """
    dt = atlas.weights.dtype
    seq = jnp.asarray(scan_seq, dtype=jnp.int32)
    last = atlas.last_supported[slots]                       # (S, M)
    vmask = atlas.valid[slots]
    ds = jnp.maximum(seq - last, 0).astype(dt)
    decay = jnp.clip(jnp.exp(-cfg.recency_decay_lambda * ds),
                     cfg.recency_min_scale, 1.0)
    decay = jnp.where(vmask, decay, 1.0)
    atlas = atlas._replace(
        Lambdas=atlas.Lambdas.at[slots].mul(decay[..., None, None]),
        thetas=atlas.thetas.at[slots].mul(decay[..., None]),
    )
    n_valid = jnp.maximum(jnp.sum(vmask.astype(dt)), 1.0)
    certs = {
        "map.staleness_downscale_total": jnp.sum((1.0 - decay) * vmask),
        "map.staleness_strength": jnp.sum((1.0 - decay) * vmask) / n_valid,
    }
    return atlas, certs


# ---------------------------------------------------------------------------
# View extraction (parity: extract_atlas_map_view, :356-450).
# ---------------------------------------------------------------------------

def extract_view(atlas: AtlasMap, slots: jnp.ndarray, cfg: GCConfig) -> MapView:
    """Top ``m_tile_view`` primitives by weight per active tile, stitched."""
    M = cfg.m_tile
    V = cfg.m_tile_view
    dt = atlas.weights.dtype
    w_slab = atlas.weights[slots]                            # (S, M)
    v_slab = atlas.valid[slots]
    neg_inf = jnp.asarray(-jnp.inf, dtype=dt)
    score = jnp.where(v_slab, w_slab, neg_inf)
    k = min(V, M)
    _, idx = jax.lax.top_k(score, k)                         # (S, k)
    if k < V:  # tiny-config safety: pad with repeats of slot 0
        idx = jnp.pad(idx, ((0, 0), (0, V - k)))
    gidx = (slots[:, None].astype(jnp.int32) * M + idx.astype(jnp.int32)).reshape(-1)

    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    Lam = flat(atlas.Lambdas)[gidx]
    the = flat(atlas.thetas)[gidx]
    eta0 = flat(atlas.etas)[gidx][:, 0, :]
    wv = flat(atlas.weights)[gidx]
    val = flat(atlas.valid)[gidx]
    if k < V:
        pad_col = jnp.arange(V, dtype=jnp.int32) >= k
        val = val & ~jnp.tile(pad_col, (slots.shape[0],))
    pos = jnp.einsum("nij,nj->ni", inv3x3(Lam, cfg.eps_lift), the)
    kap = jnp.linalg.norm(eta0, axis=-1)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype=dt), eta0.shape)
    dirs = jnp.where(kap[:, None] > cfg.eps_mass,
                     eta0 / jnp.maximum(kap[:, None], cfg.eps_mass), ez)
    return MapView(
        positions=pos, directions=dirs, kappas=kap, weights=wv, valid=val,
        last_supported=flat(atlas.last_supported)[gidx],
        prim_ids=flat(atlas.prim_ids)[gidx],
        global_idx=gidx.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# PoE fuse (parity: primitive_map_fuse, :992-1163) — one scatter-add.
# ---------------------------------------------------------------------------

def fuse(atlas: AtlasMap, batch_w: MeasurementBatch, resp: jnp.ndarray,
         cand_gidx: jnp.ndarray, cand_valid: jnp.ndarray, scan_seq,
         cfg: GCConfig) -> Tuple[AtlasMap, dict]:
    """Fuse world-frame measurements into candidates with responsibilities pi.

    resp: (N, K); cand_gidx: (N, K) flat pool indices; cand_valid: (N, K).
    Lambda += pi*Lambda_m, theta += pi*theta_m, eta += pi*eta_m,
    weight += pi*w_m; supported slots stamp ``last_supported = scan_seq``.
    """
    P, M = atlas.weights.shape
    dt = atlas.weights.dtype
    N, K = resp.shape
    r = resp * batch_w.valid[:, None].astype(dt) * cand_valid.astype(dt)
    idx = cand_gidx.reshape(-1).astype(jnp.int32)            # (N*K,)
    rf = r.reshape(-1)

    rep = lambda a: jnp.repeat(a, K, axis=0)                 # (N*K, ...)
    Lam_m, the_m, eta_m = rep(batch_w.Lambdas), rep(batch_w.thetas), rep(batch_w.etas)
    w_m = rep(batch_w.weights)
    col_m = jnp.clip(rep(batch_w.colors), 0.0, 1.0)
    src_m = rep(batch_w.sources)
    is_cam = (src_m == 0).astype(dt)
    is_lid = (src_m == 1).astype(dt)

    flat = lambda a: a.reshape((P * M,) + a.shape[2:])
    Lambdas = flat(atlas.Lambdas).at[idx].add(rf[:, None, None] * Lam_m)
    thetas = flat(atlas.thetas).at[idx].add(rf[:, None] * the_m)
    etas = flat(atlas.etas).at[idx].add(rf[:, None, None] * eta_m)
    weights = flat(atlas.weights).at[idx].add(rf * w_m)
    cam_mass = flat(atlas.cam_mass).at[idx].add(rf * w_m * is_cam)
    lidar_mass = flat(atlas.lidar_mass).at[idx].add(rf * w_m * is_lid)
    rgb_accum = flat(atlas.rgb_accum).at[idx].add(col_m * (rf * w_m * is_cam)[:, None])
    rgb_denom = flat(atlas.rgb_denom).at[idx].add(rf * w_m * is_cam)

    seq32 = jnp.asarray(scan_seq, dtype=jnp.int32)
    supported = jnp.where(rf > 0, seq32, jnp.int32(-1))
    last_supported = flat(atlas.last_supported).at[idx].max(supported)

    gray = jnp.asarray(_GRAY, dtype=dt)
    rgb = jnp.where((cam_mass > 0)[:, None],
                    jnp.clip(rgb_accum / jnp.maximum(rgb_denom[:, None], cfg.eps_mass), 0.0, 1.0),
                    gray)

    unflat = lambda a, ref: a.reshape(ref.shape)
    atlas = atlas._replace(
        Lambdas=unflat(Lambdas, atlas.Lambdas),
        thetas=unflat(thetas, atlas.thetas),
        etas=unflat(etas, atlas.etas),
        weights=unflat(weights, atlas.weights),
        cam_mass=unflat(cam_mass, atlas.cam_mass),
        lidar_mass=unflat(lidar_mass, atlas.lidar_mass),
        rgb_accum=unflat(rgb_accum, atlas.rgb_accum),
        rgb_denom=unflat(rgb_denom, atlas.rgb_denom),
        rgb=unflat(rgb, atlas.rgb),
        last_supported=unflat(last_supported, atlas.last_supported),
    )
    certs = {
        "map.fused_mass": jnp.sum(rf * w_m),
        "map.fuse_resp_total": jnp.sum(rf),
    }
    return atlas, certs


# ---------------------------------------------------------------------------
# Novelty insertion (parity: pipeline.py:1329-1410 + insert_masked :807-981).
# ---------------------------------------------------------------------------

def insert(atlas: AtlasMap, batch_w: MeasurementBatch, novelty: jnp.ndarray,
           meas_keys: jnp.ndarray, active_keys: jnp.ndarray,
           slots: jnp.ndarray, scan_seq,
           cfg: GCConfig) -> Tuple[AtlasMap, dict]:
    """Insert top-``k_insert`` novel measurements per active tile.

    novelty: (N,) = max(a - row_mass, 0) from unbalanced OT. Insert weight =
    novelty * meas weight. Eviction per tile: invalid slots first, then lowest
    retention = weight * exp(-lambda * staleness).
    """
    P, M = atlas.weights.shape
    dt = atlas.weights.dtype
    K = cfg.k_insert
    S = slots.shape[0]
    seq32 = jnp.asarray(scan_seq, dtype=jnp.int32)

    score = novelty * batch_w.weights
    score = jnp.where(batch_w.valid, score, -1e30)

    in_tile = meas_keys[None, :] == active_keys[:, None]     # (S, N)
    score_t = jnp.where(in_tile, score[None, :], -1e30)
    top_score, ins_idx = jax.lax.top_k(score_t, K)           # (S, K)
    do_insert = jnp.take_along_axis(in_tile, ins_idx, axis=1) & (top_score > -1e20)

    # Eviction targets: K lowest-retention slots per active tile.
    w_slab = atlas.weights[slots]
    v_slab = atlas.valid[slots]
    stale = jnp.maximum(seq32 - atlas.last_supported[slots], 0).astype(dt)
    retention = jnp.where(v_slab,
                          w_slab * jnp.exp(-cfg.recency_decay_lambda * stale),
                          -1.0)
    _, evict_slot = jax.lax.top_k(-retention, K)             # (S, K)
    tgt = (slots[:, None].astype(jnp.int32) * M + evict_slot.astype(jnp.int32)).reshape(-1)

    # New primitive ids by prefix sum over the flattened proposal order.
    do_f = do_insert.reshape(-1)
    prefix = jnp.cumsum(do_f.astype(jnp.int64)) - 1
    new_ids = jnp.where(do_f, atlas.next_prim_id + prefix, jnp.int64(-1))

    gi = ins_idx.reshape(-1)                                 # (S*K,) meas rows
    w_new = (novelty[gi] * batch_w.weights[gi]).astype(dt)
    w_new = jnp.where(do_f, w_new, 0.0)
    col_new = jnp.clip(batch_w.colors[gi], 0.0, 1.0)
    is_cam = (batch_w.sources[gi] == 0).astype(dt)
    cam_m = w_new * is_cam
    lid_m = w_new * (1.0 - is_cam)
    gray = jnp.asarray(_GRAY, dtype=dt)
    rgb_new = jnp.where((cam_m > 0)[:, None], col_new, gray)

    flat = lambda a: a.reshape((P * M,) + a.shape[2:])
    sel = lambda new, prev: jnp.where(
        do_f.reshape((-1,) + (1,) * (new.ndim - 1)), new, prev)

    def put(pool, new_vals):
        f = flat(pool)
        return f.at[tgt].set(sel(new_vals, f[tgt])).reshape(pool.shape)

    atlas = atlas._replace(
        Lambdas=put(atlas.Lambdas, batch_w.Lambdas[gi]),
        thetas=put(atlas.thetas, batch_w.thetas[gi]),
        etas=put(atlas.etas, batch_w.etas[gi]),
        weights=put(atlas.weights, w_new),
        cam_mass=put(atlas.cam_mass, cam_m),
        lidar_mass=put(atlas.lidar_mass, lid_m),
        rgb_accum=put(atlas.rgb_accum, col_new * cam_m[:, None]),
        rgb_denom=put(atlas.rgb_denom, cam_m),
        rgb=put(atlas.rgb, rgb_new),
        created_seq=put(atlas.created_seq, jnp.full((S * K,), seq32)),
        last_supported=put(atlas.last_supported, jnp.full((S * K,), seq32)),
        prim_ids=put(atlas.prim_ids, new_ids),
        valid=put(atlas.valid, jnp.ones((S * K,), dtype=bool)),
        next_prim_id=atlas.next_prim_id + jnp.sum(do_f.astype(jnp.int64)),
    )
    certs = {
        "map.inserted_count": jnp.sum(do_f.astype(dt)),
        "map.inserted_mass": jnp.sum(w_new),
    }
    return atlas, certs


# ---------------------------------------------------------------------------
# Cull + forget (parity: primitive_map_cull :1175-1304, _forget :1314-1384).
# ---------------------------------------------------------------------------

def cull(atlas: AtlasMap, slots: jnp.ndarray,
         cfg: GCConfig) -> Tuple[AtlasMap, dict]:
    """Invalidate primitives in active slabs with weight below threshold."""
    w = atlas.weights[slots]
    v = atlas.valid[slots]
    below = v & (w < cfg.cull_weight_threshold)
    dt = w.dtype
    atlas = atlas._replace(
        valid=atlas.valid.at[slots].set(v & ~below),
        weights=atlas.weights.at[slots].set(jnp.where(below, 0.0, w)),
    )
    certs = {
        "map.culled_count": jnp.sum(below.astype(dt)),
        "map.culled_mass": jnp.sum(w * below.astype(dt)),
    }
    return atlas, certs


def forget(atlas: AtlasMap, slots: jnp.ndarray,
           cfg: GCConfig) -> AtlasMap:
    """weights *= gamma on active slabs (continuous forgetting, every scan)."""
    return atlas._replace(
        weights=atlas.weights.at[slots].mul(cfg.forgetting_factor))


# ---------------------------------------------------------------------------
# Merge-reduce (parity: primitive_map_merge_reduce, :1501-2031).
# ---------------------------------------------------------------------------

def merge_reduce(atlas: AtlasMap, slots: jnp.ndarray,
                 cfg: GCConfig) -> Tuple[AtlasMap, dict]:
    """Greedy Bhattacharyya merge of up to ``k_merge_pairs`` pairs per tile.

    Runs on the top-``merge_max_tile``-by-weight subset of each active tile
    (the reference instead skips merging entirely when the tile exceeds its
    O(M^2) cap — here the subset keeps merge active at any tile size with
    bounded cost). Distance: Bhattacharyya between position Gaussians.
    Merge: moment matching (mean/cov), natural-param add for vMF, mass add.
    """
    M = cfg.m_tile
    Sm = min(cfg.merge_max_tile, M)
    P = cfg.k_merge_pairs
    dt = atlas.weights.dtype
    eps_lift = cfg.eps_lift
    eps_psd = cfg.eps_psd
    thr = cfg.merge_threshold

    def one_tile(slot):
        w_all = atlas.weights[slot]
        v_all = atlas.valid[slot]
        sc = jnp.where(v_all, w_all, -jnp.inf)
        _, sub = jax.lax.top_k(sc, Sm)                       # (Sm,) local slots

        Lam = atlas.Lambdas[slot][sub]
        the = atlas.thetas[slot][sub]
        eta = atlas.etas[slot][sub]
        w = w_all[sub]
        v = v_all[sub]
        cm = atlas.cam_mass[slot][sub]
        lm = atlas.lidar_mass[slot][sub]
        ra = atlas.rgb_accum[slot][sub]
        rd = atlas.rgb_denom[slot][sub]

        Sig = inv3x3(Lam, eps_lift)
        mu = jnp.einsum("nij,nj->ni", Sig, the)
        det = jnp.linalg.det(Sig)

        Sbar = 0.5 * (Sig[:, None] + Sig[None, :])           # (Sm, Sm, 3, 3)
        detS = jnp.linalg.det(Sbar)
        dmu = mu[:, None, :] - mu[None, :, :]
        quad = 0.125 * jnp.einsum("abi,abij,abj->ab", dmu,
                                  inv3x3(Sbar, eps_lift), dmu)
        logt = 0.5 * jnp.log(jnp.maximum(detS, 1e-30) /
                             jnp.sqrt(jnp.maximum(det[:, None] * det[None, :], 0.0) + 1e-24))
        D = quad + logt
        pair_ok = v[:, None] & v[None, :]
        iu = jnp.triu_indices(Sm, k=1)
        mask = jnp.zeros((Sm, Sm), dtype=bool).at[iu].set(True)
        D = jnp.where(pair_ok & mask, D, jnp.inf)

        def body(_, carry):
            D_c, Lam_c, the_c, eta_c, w_c, v_c, cm_c, lm_c, ra_c, rd_c, n_c = carry
            flat_idx = jnp.argmin(D_c)
            i = flat_idx // Sm
            j = flat_idx % Sm
            d = D_c[i, j]
            do = jnp.isfinite(d) & (d < thr)

            Sig_i = inv3x3(Lam_c[i], eps_lift)
            Sig_j = inv3x3(Lam_c[j], eps_lift)
            mu_i = Sig_i @ the_c[i]
            mu_j = Sig_j @ the_c[j]
            w1, w2 = w_c[i], w_c[j]
            ws = jnp.maximum(w1 + w2, eps_psd)
            mu_m = (w1 * mu_i + w2 * mu_j) / ws
            d1 = (mu_i - mu_m)[:, None]
            d2 = (mu_j - mu_m)[:, None]
            Sig_m = (w1 * (Sig_i + d1 @ d1.T) + w2 * (Sig_j + d2 @ d2.T)) / ws
            Sig_m = Sig_m + eps_psd * jnp.eye(3, dtype=dt)
            Lam_m = inv3x3(Sig_m)
            the_m = Lam_m @ mu_m
            eta_m = (w1 * eta_c[i] + w2 * eta_c[j]) / ws

            def upd(a, i_val, j_val, arr):
                arr = arr.at[i].set(jnp.where(do, i_val, arr[i]))
                return arr.at[j].set(jnp.where(do, j_val, arr[j]))

            Lam_c = upd(None, Lam_m, Lam_c[j], Lam_c)
            the_c = upd(None, the_m, the_c[j], the_c)
            eta_c = upd(None, eta_m, eta_c[j], eta_c)
            w_c = upd(None, w1 + w2, jnp.asarray(0.0, dt), w_c)
            v_c = upd(None, v_c[i], jnp.asarray(False), v_c)
            cm_c = upd(None, cm_c[i] + cm_c[j], jnp.asarray(0.0, dt), cm_c)
            lm_c = upd(None, lm_c[i] + lm_c[j], jnp.asarray(0.0, dt), lm_c)
            ra_c = upd(None, ra_c[i] + ra_c[j], jnp.zeros(3, dt), ra_c)
            rd_c = upd(None, rd_c[i] + rd_c[j], jnp.asarray(0.0, dt), rd_c)

            # Retire both rows from further pairing this scan.
            D_c = jnp.where(do, D_c.at[i, :].set(jnp.inf).at[:, i].set(jnp.inf)
                                  .at[j, :].set(jnp.inf).at[:, j].set(jnp.inf), D_c)
            n_c = n_c + do.astype(jnp.int32)
            return (D_c, Lam_c, the_c, eta_c, w_c, v_c, cm_c, lm_c, ra_c, rd_c, n_c)

        init = (D, Lam, the, eta, w, v, cm, lm, ra, rd, jnp.int32(0))
        (_, Lam, the, eta, w, v, cm, lm, ra, rd, n_merged) = jax.lax.fori_loop(
            0, P, body, init)
        return sub, Lam, the, eta, w, v, cm, lm, ra, rd, n_merged

    (subs, Lams, thes, etas, ws, vs, cms, lms, ras, rds,
     n_merged) = jax.vmap(one_tile)(slots)

    # Scatter subsets back (disjoint across tiles; disjoint slots within tile).
    gidx = (slots[:, None].astype(jnp.int32) * M + subs.astype(jnp.int32)).reshape(-1)
    Pp, Mm = atlas.weights.shape
    flat = lambda a: a.reshape((Pp * Mm,) + a.shape[2:])
    fl = lambda a: a.reshape((-1,) + a.shape[2:])

    gray = jnp.asarray(_GRAY, dtype=dt)
    rgb_sub = jnp.where((cms > 0)[..., None],
                        jnp.clip(ras / jnp.maximum(rds[..., None], cfg.eps_mass), 0.0, 1.0),
                        gray)

    atlas = atlas._replace(
        Lambdas=flat(atlas.Lambdas).at[gidx].set(fl(Lams)).reshape(atlas.Lambdas.shape),
        thetas=flat(atlas.thetas).at[gidx].set(fl(thes)).reshape(atlas.thetas.shape),
        etas=flat(atlas.etas).at[gidx].set(fl(etas)).reshape(atlas.etas.shape),
        weights=flat(atlas.weights).at[gidx].set(ws.reshape(-1)).reshape(atlas.weights.shape),
        valid=flat(atlas.valid).at[gidx].set(vs.reshape(-1)).reshape(atlas.valid.shape),
        cam_mass=flat(atlas.cam_mass).at[gidx].set(cms.reshape(-1)).reshape(atlas.cam_mass.shape),
        lidar_mass=flat(atlas.lidar_mass).at[gidx].set(lms.reshape(-1)).reshape(atlas.lidar_mass.shape),
        rgb_accum=flat(atlas.rgb_accum).at[gidx].set(fl(ras)).reshape(atlas.rgb_accum.shape),
        rgb_denom=flat(atlas.rgb_denom).at[gidx].set(rds.reshape(-1)).reshape(atlas.rgb_denom.shape),
        rgb=flat(atlas.rgb).at[gidx].set(fl(rgb_sub)).reshape(atlas.rgb.shape),
    )
    certs = {"map.merged_pairs": jnp.sum(n_merged).astype(dt)}
    return atlas, certs


# ---------------------------------------------------------------------------
# Export helpers (host-side; not in the jitted path).
# ---------------------------------------------------------------------------

def decode_positions(atlas: AtlasMap, eps_lift: float = 1e-9):
    """World positions (P, M, 3) of all primitives (invalid rows undefined)."""
    return jnp.einsum("pmij,pmj->pmi", inv3x3(atlas.Lambdas, eps_lift),
                      atlas.thetas)


def total_count(atlas: AtlasMap):
    return jnp.sum(atlas.valid.astype(jnp.int32))
