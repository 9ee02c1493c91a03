"""Atlas map as one fixed-shape device structure (TPU-first redesign of the
reference ``backend/structures/primitive_map.py``).

The reference keeps a Python dict ``tile_id -> PrimitiveMapTile`` and loops
over ``n_blocks x active_tiles`` on the host every scan (its own docs flag this
as the dominant wall-clock cost, ``pipeline.py:1272-1447``). Here the atlas is
a **fixed pool**: ``n_tiles_pool`` tile slabs of ``m_tile`` primitive slots
each, stored as a fused field block plus an int64 tile-key directory.

Slab execution model (the perf-critical design): per scan the active tiles'
slabs are gathered ONCE into ``Slabs`` arrays, every map operator
(inflate/view/fuse/insert/cull/forget/merge) runs on the slabs, and the result
is scattered back ONCE. Running the operators directly on the pool costs a
full-pool read/write per operator — measured 190 ms vs 42 ms per scan on a
v5e chip for a 64x50k pool.

TPU layout discipline (profiled, three times):
  1. ALL float per-primitive fields live in ONE fused block rather than
     per-field arrays: TPU gather/scatter cost is row-serialized (~8 ns per
     indexed row, INDEPENDENT of the window width), so any indexed op pays
     per-array, not per-byte — per-field scatters cost CF serialized passes
     (profiled 26 x 98 us/scan in fuse), a single fused one costs one.
  2. The fused block is **tile-row-major** ``(A, CF, M)`` (A = pool/slab
     axis), NOT component-major ``(CF, A, M)``: the pool->slab gather
     ``fdata[slots]`` and the slab->pool scatter then index the MAJOR axis and
     lower to ONE gather/scatter of S big (CF, M) windows. Indexing a
     non-major axis lowers to a serialized per-row dynamic-slice while loop
     (profiled: 28 x ~80 us of while.* per gather+scatter = ~2.5 ms/scan).
     Candidate/view row access composes both axes as ``fdata[s, :, m]`` — one
     gather of (CF,) windows. M stays minor-most: a small minor dim would
     make the (8, 128) tiler pad it (42x bandwidth blowup for (P, M, 3, 3)).

Field layout along ``CF`` (fixed offsets; CF = 19 + 3B rounded up to a
multiple of 8 — Mosaic DMA requires slab blocks tile-aligned on the sublane
dim, and fixed offsets keep every accessor independent of the lobe count):
  rows [0, 6)     lam6     packed symmetric precision (xx,xy,xz,yy,yz,zz)
  rows [6, 9)     theta    information mean
  rows [9, 12)    rgb_acc  camera-color accumulator
  row  12         weights
  row  13         cam_mass
  row  14         lidar_mass
  row  15         rgb_denom
  row  16         created_seq    (float; exact for seq < 2^24)
  row  17         last_supported (float; exact for seq < 2^24)
  row  18         valid          (float 0.0/1.0)
  rows [19, 19+3B) eta     vMF naturals, lobe-major
  rows [19+3B, CF) zero pad (tile alignment)
``prim_ids`` (int32; ~4.6M-scan headroom at the production insert budget)
stays a separate array. Resolved rgb is DERIVED from the
accumulators on read (the reference stores and recomputes it every fuse,
primitive_map.py:1100+; the per-scan pipeline never reads it).

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
import numpy as np

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.structures import atlas_kernels
from fl_slam_tpu.core.linalg import (
    inv3x3, mat33_to_sym6, sym6_to_mat33, top_k_maybe_approx)
from fl_slam_tpu.structures.measurement_batch import MeasurementBatch

EMPTY_KEY = jnp.int64(-1)
_GRAY = (0.5, 0.5, 0.5)

# Fixed row offsets (see module docstring).
_O_SCAL = 12
_ROW_W, _ROW_CM, _ROW_LM, _ROW_RD, _ROW_CS, _ROW_LS, _ROW_V = range(7)
_O_ETA = 19


def _cf_padded(n_lobes: int) -> int:
    cf = _O_ETA + 3 * n_lobes
    return ((cf + 7) // 8) * 8


class _FieldView:
    """Shared float-field accessors for AtlasMap / Slabs (pool axis P or slab
    axis S transparently). Block fields are returned component-major
    ``(C, A, M)`` (moveaxis view) for the dense helpers; scalar rows are
    ``(A, M)``. Views, not copies, until sliced."""

    @property
    def lam6(self):
        return jnp.moveaxis(self.fdata[:, 0:6], 1, 0)

    @property
    def theta(self):
        return jnp.moveaxis(self.fdata[:, 6:9], 1, 0)

    @property
    def rgb_acc(self):
        return jnp.moveaxis(self.fdata[:, 9:12], 1, 0)

    @property
    def weights(self):
        return self.fdata[:, _O_SCAL + _ROW_W]

    @property
    def cam_mass(self):
        return self.fdata[:, _O_SCAL + _ROW_CM]

    @property
    def lidar_mass(self):
        return self.fdata[:, _O_SCAL + _ROW_LM]

    @property
    def rgb_denom(self):
        return self.fdata[:, _O_SCAL + _ROW_RD]

    @property
    def created_seq(self):
        return self.fdata[:, _O_SCAL + _ROW_CS].astype(jnp.int32)

    @property
    def last_supported(self):
        return self.fdata[:, _O_SCAL + _ROW_LS].astype(jnp.int32)

    @property
    def valid(self):
        return self.fdata[:, _O_SCAL + _ROW_V] > 0.5

    def etas_planes(self, n_lobes: int):
        return jnp.moveaxis(self.fdata[:, _O_ETA:_O_ETA + 3 * n_lobes], 1, 0)


class AtlasMap(NamedTuple("AtlasMapBase", [
        ("tile_keys", jnp.ndarray), ("tile_touch_seq", jnp.ndarray),
        ("fdata", jnp.ndarray), ("prim_ids", jnp.ndarray),
        ("next_prim_id", jnp.ndarray)]), _FieldView):
    """Fixed-pool tile atlas. P = n_tiles_pool, M = m_tile.

    ``tile_keys (P,)`` int64 packed hex keys (-1 = free); ``tile_touch_seq
    (P,)`` int32 last-active scan; ``fdata (P, CF, M)`` fused float fields;
    ``prim_ids (P, M)`` int32 global ids (-1 empty); ``next_prim_id ()``.
    """


class Slabs(NamedTuple("SlabsBase", [
        ("fdata", jnp.ndarray), ("prim_ids", jnp.ndarray),
        ("next_prim_id", jnp.ndarray)]), _FieldView):
    """Active-tile working set: ``fdata (S, CF, M)``, ``prim_ids (S, M)``."""


class MapView(NamedTuple):
    """Stitched fixed-size candidate pool over the active slabs.

    V = n_active_tiles * m_tile_view rows, deterministic order: tile-stencil
    order outer, weight-descending inner (parity: extract_atlas_map_view,
    primitive_map.py:356-450). ``slab_idx`` is the SLAB-flat index
    s * m_tile + m of each candidate (fuse scatters into the slabs).

    ``raw`` keeps the gathered (V, CF) field rows so the whole scatter phase
    (fuse + merge) can run compactly on them and write back with ONE column
    scatter; ``put_idx`` is that scatter's target column per row, with
    duplicate/pad rows pointed out of bounds (mode="drop") so the ``.set``
    write-back never double-writes a slab column.
    """

    positions: jnp.ndarray       # (V, 3) world-frame means
    Lambdas: jnp.ndarray         # (V, 3, 3) accumulated patch precisions
                                 #   (arbitrary scale; eigenstructure = shape)
    directions: jnp.ndarray      # (V, 3) primary vMF directions
    kappas: jnp.ndarray          # (V,)
    weights: jnp.ndarray         # (V,)
    valid: jnp.ndarray           # (V,) bool
    last_supported: jnp.ndarray  # (V,) int32
    prim_ids: jnp.ndarray        # (V,) int32
    slab_idx: jnp.ndarray        # (V,) int32 flat index s*M + m into slabs
    packed: jnp.ndarray          # (V, 19) fused candidate matrix (see
                                 #   slab_extract_view for the column map)
    raw: jnp.ndarray             # (V, CF) gathered field rows (write-back src)
    put_idx: jnp.ndarray         # (V,) int32 write-back column; SM = dropped


def _pair_gather(fd: jnp.ndarray, s_idx: jnp.ndarray, m_idx: jnp.ndarray):
    """(A, CF, M)[(n,) s, :, (n,) m] -> (n, CF): ONE gather of CF-wide rows."""
    return fd[s_idx, :, m_idx]


# ---------------------------------------------------------------------------
# Dense accessors (export / tests; NOT for the per-scan hot path).
# ---------------------------------------------------------------------------

def dense_Lambdas(x):
    """(6, A, M) planes -> (A, M, 3, 3) dense symmetric matrices."""
    return sym6_to_mat33(jnp.moveaxis(x.lam6, 0, -1))


def dense_thetas(x):
    return jnp.moveaxis(x.theta, 0, -1)                      # (A, M, 3)


def dense_etas(x, n_lobes: int):
    e = jnp.moveaxis(x.etas_planes(n_lobes), 0, -1)          # (A, M, B*3)
    return e.reshape(e.shape[:-1] + (e.shape[-1] // 3, 3))   # (A, M, B, 3)


def dense_rgb(x, eps_mass: float = 1e-12):
    """Resolved camera-dominant color, derived from the accumulators."""
    acc = jnp.moveaxis(x.rgb_acc, 0, -1)                     # (A, M, 3)
    den = x.rgb_denom[..., None]
    gray = jnp.asarray(_GRAY, dtype=acc.dtype)
    return jnp.where(x.cam_mass[..., None] > 0,
                     jnp.clip(acc / jnp.maximum(den, eps_mass), 0.0, 1.0),
                     gray)


def empty_atlas(cfg: GCConfig) -> AtlasMap:
    P, M, B = cfg.n_tiles_pool, cfg.m_tile, cfg.vmf_n_lobes
    dt = cfg.jdtype
    cf = _cf_padded(B)
    fdata = jnp.zeros((P, cf, M), dtype=dt)
    fdata = (fdata.at[:, _O_SCAL + _ROW_CS].set(-1.0)
                  .at[:, _O_SCAL + _ROW_LS].set(-1.0))
    return AtlasMap(
        tile_keys=jnp.full((P,), -1, dtype=jnp.int64),
        tile_touch_seq=jnp.full((P,), -1, dtype=jnp.int32),
        fdata=fdata,
        prim_ids=jnp.full((P, M), -1, dtype=jnp.int32),
        next_prim_id=jnp.int32(0),
    )


def gather_slabs(atlas: AtlasMap, slots: jnp.ndarray) -> Slabs:
    """Gather the active tiles' working set as S static dynamic-slices.

    NOT ``fdata[slots]``: XLA's mini-gather rewrite lowers that single
    major-axis gather into chunked slicing of the ENTIRE pool (reads all P
    tiles, profiled 856 us + 77 us for a 64-tile pool); S unrolled
    dynamic-slices read exactly the S active slabs (~40 MB)."""
    S = slots.shape[0]
    fd = jnp.concatenate([
        jax.lax.dynamic_slice_in_dim(atlas.fdata, slots[i], 1, axis=0)
        for i in range(S)], axis=0)
    pid = jnp.concatenate([
        jax.lax.dynamic_slice_in_dim(atlas.prim_ids, slots[i], 1, axis=0)
        for i in range(S)], axis=0)
    return Slabs(fdata=fd, prim_ids=pid, next_prim_id=atlas.next_prim_id)


def scatter_slabs(atlas: AtlasMap, slots: jnp.ndarray, sl: Slabs) -> AtlasMap:
    """Scatter the updated slabs back as S static in-place update-slices
    (a single ``.at[slots].set`` lowers to a serialized while loop that
    cannot alias the donated pool buffer)."""
    fd, pid = atlas.fdata, atlas.prim_ids
    S = slots.shape[0]
    for i in range(S):
        fd = jax.lax.dynamic_update_slice_in_dim(
            fd, sl.fdata[i:i + 1], slots[i], axis=0)
        pid = jax.lax.dynamic_update_slice_in_dim(
            pid, sl.prim_ids[i:i + 1], slots[i], axis=0)
    return atlas._replace(fdata=fd, prim_ids=pid,
                          next_prim_id=sl.next_prim_id)


def gather_slabs_ff(atlas: AtlasMap, slots: jnp.ndarray) -> "SlabsFF":
    """Gather the active working set directly in the col-major resident form
    (the pipeline carry): ``ff (CF, S*M)``, ``prim_ids (S*M,)``."""
    sl = gather_slabs(atlas, slots)
    return slabs_to_ff(sl)


def scatter_slabs_ff(atlas: AtlasMap, slots: jnp.ndarray,
                     sf: "SlabsFF") -> AtlasMap:
    S = slots.shape[0]
    return scatter_slabs(atlas, slots, slabs_from_ff(sf, S))


# ---------------------------------------------------------------------------
# Tile directory: lookup + allocate (replaces dict tiles.get / create_empty).
# ---------------------------------------------------------------------------

def activate_tiles(atlas: AtlasMap, keys: jnp.ndarray,
                   scan_seq) -> Tuple[AtlasMap, jnp.ndarray, jnp.ndarray, dict]:
    """Resolve S active tile keys to pool slots, allocating missing tiles.

    Allocation is deterministic: free slots first (lowest index), then the
    least-recently-active tile (oldest ``tile_touch_seq``, lowest index).
    Touches only the (P,)-sized directory arrays — clearing evicted slab
    CONTENTS is deferred to ``slab_clear_fresh`` on the gathered slabs
    (scattering 3 clear rows into the pool lowered to a 234 us while loop +
    full-pool update-slices; the slab-side clear is a dense elementwise pass).
    Returns (atlas', slots (S,) int32, fresh (S,) bool, certs).
    """
    P = atlas.tile_keys.shape[0]
    dt = atlas.fdata.dtype
    eq = keys[:, None] == atlas.tile_keys[None, :]          # (S, P)
    found = jnp.any(eq, axis=1)
    slot_found = jnp.argmax(eq, axis=1).astype(jnp.int32)

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

    n_evicted = jnp.sum(missing & ~is_free[slots])
    tile_keys = atlas.tile_keys.at[slots].set(keys)
    seq32 = jnp.asarray(scan_seq, dtype=jnp.int32)
    touch = atlas.tile_touch_seq.at[slots].set(seq32)
    atlas = atlas._replace(tile_keys=tile_keys, tile_touch_seq=touch)
    certs = {
        "atlas.tiles_allocated": jnp.sum(missing).astype(dt),
        "atlas.tiles_evicted": n_evicted.astype(dt),
    }
    return atlas, slots, missing, certs


def slab_clear_fresh(sl: Slabs, fresh: jnp.ndarray) -> Slabs:
    """Clear freshly allocated/evicted slabs (weights + validity +
    last_supported suffice: all readers mask). Standalone variant for tests;
    the pipeline folds the clear into ``slab_inflate_and_clear``."""
    fd = sl.fdata
    o = _O_SCAL
    m = fresh[:, None]
    fd = fd.at[:, o + _ROW_W].set(jnp.where(m, 0.0, fd[:, o + _ROW_W]))
    fd = fd.at[:, o + _ROW_LS].set(jnp.where(m, -1.0, fd[:, o + _ROW_LS]))
    fd = fd.at[:, o + _ROW_V].set(jnp.where(m, 0.0, fd[:, o + _ROW_V]))
    return sl._replace(fdata=fd)


# ---------------------------------------------------------------------------
# Recency inflation (parity: primitive_map_recency_inflate, :1400-1484).
# ---------------------------------------------------------------------------

def slab_recency_inflate(sl: Slabs, scan_seq, cfg: GCConfig):
    """Downscale precision of stale primitives (standalone variant; the
    pipeline uses the fused ``ff_inflate_and_clear``)."""
    return slab_inflate_and_clear(
        sl, jnp.zeros((sl.fdata.shape[0],), bool), scan_seq, cfg)


def ff_inflate_and_clear(sf: SlabsFF, fresh: jnp.ndarray, scan_seq,
                         cfg: GCConfig, *, forget_cull: bool = True,
                         gamma_power: int = 1):
    """ONE fused elementwise pass over ``ff`` doing ALL dense per-scan slab
    rewrites (expressed as ``ff * A + B`` with broadcast row/column masks):

      - fresh-slab clear (weights -> 0, last_supported -> -1, valid -> 0);
      - recency inflation of stale valid primitives, mean-preserving
        (parity: primitive_map_recency_inflate, :1400-1484);
      - with ``forget_cull`` (the pipeline path): the per-scan forgetting
        ``w *= gamma`` (primitive_map_forget, :1314-1384) and the
        weight-threshold cull (primitive_map_cull, :1175-1304).

    Deliberate scheduling delta vs the reference: forget/cull run at the
    START of the scan (before view extraction) instead of after insert. A
    uniform ``gamma`` multiply preserves every weight ORDERING the scan uses
    (view selection, eviction retention, merge subsets), so the only visible
    difference is a one-scan deferral of threshold-crossing culls and one
    pending forget at flush time — and it removes two full dense row
    rewrites of the 45 MB field block per scan.
    """
    ff = sf.ff
    dt = ff.dtype
    cf, SM = ff.shape
    S = fresh.shape[0]
    M = SM // S
    o = _O_SCAL
    seqf = jnp.asarray(scan_seq, dtype=dt)
    fresh_c = jnp.repeat(fresh, M)                           # (SM,)
    valid = ff[o + _ROW_V] > 0.5
    vmask = valid & ~fresh_c
    ds = jnp.maximum(seqf - ff[o + _ROW_LS], 0.0)
    decay = jnp.clip(jnp.exp(-cfg.recency_decay_lambda * ds),
                     cfg.recency_min_scale, 1.0)
    decay = jnp.where(vmask, decay, 1.0)

    if forget_cull:
        # gamma_power > 1: the chunked replay applies the last R scans'
        # deferred forgetting in one composite multiply (bounded delta: in-
        # chunk fused additions receive up to R-1 extra gamma, <= 2% at
        # gamma=0.995, R=4; orderings are unaffected by a uniform scale).
        gamma = cfg.forgetting_factor ** gamma_power
        w_new = ff[o + _ROW_W] * gamma
        below = vmask & (w_new < cfg.cull_weight_threshold)
        w_scale = jnp.where(below | fresh_c, 0.0, gamma)
        v_scale = jnp.where(below | fresh_c, 0.0, 1.0)
    else:
        w_new = ff[o + _ROW_W]
        below = jnp.zeros_like(vmask)
        w_scale = jnp.where(fresh_c, 0.0, 1.0)
        v_scale = jnp.where(fresh_c, 0.0, 1.0)

    row = jnp.arange(cf, dtype=jnp.int32)[:, None]           # (CF, 1)
    is_block = row < 9                                       # lam6 + theta
    A = jnp.where(is_block, decay[None, :], 1.0)
    A = jnp.where(row == o + _ROW_W, w_scale[None, :], A)
    A = jnp.where(row == o + _ROW_V, v_scale[None, :], A)
    A = jnp.where((row == o + _ROW_LS) & fresh_c[None, :], 0.0, A)
    B = jnp.where((row == o + _ROW_LS) & fresh_c[None, :],
                  jnp.asarray(-1.0, dt), 0.0)
    sf = sf._replace(ff=ff * A + B)

    n_valid = jnp.maximum(jnp.sum(vmask.astype(dt)), 1.0)
    certs = {
        "map.staleness_downscale_total": jnp.sum((1.0 - decay) * vmask),
        "map.staleness_strength": jnp.sum((1.0 - decay) * vmask) / n_valid,
        "map.culled_count": jnp.sum(below.astype(dt)),
        "map.culled_mass": jnp.sum(w_new * below.astype(dt)),
    }
    return sf, certs


def slab_inflate_and_clear(sl: Slabs, fresh: jnp.ndarray, scan_seq,
                           cfg: GCConfig):
    """ONE fused elementwise pass doing both per-scan dense slab rewrites:
      - fresh-slab clear: weights -> 0, last_supported -> -1, valid -> 0
        (no-op mask on unchanged tile sets);
      - recency inflation: scale lam6+theta rows of stale valid primitives by
        clip(exp(-lambda * staleness), min_scale, 1), mean-preserving
        (parity: primitive_map_recency_inflate, :1400-1484).
    Expressed as ``fd * A + B`` with broadcast row masks: separate row
    updates each lowered to a dynamic-update-slice plus layout copies
    (profiled 4 x ~80 us/scan); the fused form is one ~45 MB read+write.
    """
    fd = sl.fdata
    dt = fd.dtype
    S, cf, M = fd.shape
    o = _O_SCAL
    seqf = jnp.asarray(scan_seq, dtype=dt)
    # Clear-before-inflate order: fresh slabs are invalid by definition.
    vmask = (fd[:, o + _ROW_V] > 0.5) & ~fresh[:, None]      # (S, M)
    ds = jnp.maximum(seqf - fd[:, o + _ROW_LS], 0.0)
    decay = jnp.clip(jnp.exp(-cfg.recency_decay_lambda * ds),
                     cfg.recency_min_scale, 1.0)
    decay = jnp.where(vmask, decay, 1.0)

    row = jnp.arange(cf, dtype=jnp.int32)[None, :, None]     # (1, CF, 1)
    is_block = row < 9                                       # lam6 + theta
    is_clear = ((row == o + _ROW_W) | (row == o + _ROW_LS)
                | (row == o + _ROW_V))
    fr = fresh[:, None, None]                                # (S, 1, 1)
    A = jnp.where(is_block, decay[:, None, :], 1.0)
    A = jnp.where(is_clear & fr, 0.0, A)
    B = jnp.where((row == o + _ROW_LS) & fr, jnp.asarray(-1.0, dt), 0.0)
    sl = sl._replace(fdata=fd * A + B)

    n_valid = jnp.maximum(jnp.sum(vmask.astype(dt)), 1.0)
    certs = {
        "map.staleness_downscale_total": jnp.sum((1.0 - decay) * vmask),
        "map.staleness_strength": jnp.sum((1.0 - decay) * vmask) / n_valid,
    }
    return sl, certs


# ---------------------------------------------------------------------------
# View extraction (parity: extract_atlas_map_view, :356-450).
# ---------------------------------------------------------------------------

def slab_extract_view(sl: Slabs, cfg: GCConfig) -> MapView:
    """Row-major wrapper around ``ff_extract_view`` (tests / standalone)."""
    return ff_extract_view(slabs_to_ff(sl), sl.fdata.shape[0], cfg)


def ff_select_view_cols(sf: SlabsFF, S: int, cfg: GCConfig):
    """View MEMBERSHIP selection: per active slab, half the ``m_tile_view``
    budget goes to the top primitives BY WEIGHT and half to the MOST RECENTLY
    created ones. Returns (slab_cols (V',), dup_f (V',) bool).

    Weight-only selection (the reference policy) starves young primitives
    once a tile holds more than m_tile_view mature ones: fresh geometry never
    becomes matchable, every scan re-inserts duplicates of it, and the map
    bloats until the pose evidence degrades (observed at production budgets:
    ~200 re-insertions/scan and 2-rad rotation residuals). The recency half
    keeps the insertion->associate->fuse loop closed.

    Rows are DEDUPLICATED (a slot in both halves keeps only its weight-half
    copy; the recency copy is invalidated and its ``put_idx`` dropped): the
    scatter phase writes the view columns back with one ``.set`` scatter, so
    every live row must own a unique column.
    """
    ff = sf.ff
    cf, SM = ff.shape
    M = SM // S
    o = _O_SCAL
    V = cfg.m_tile_view
    dt = ff.dtype
    vmask2 = (ff[o + _ROW_V] > 0.5).reshape(S, M)            # (S, M)
    w2 = ff[o + _ROW_W].reshape(S, M)
    cs2 = ff[o + _ROW_CS].reshape(S, M)
    kw = min(V - V // 2, M)
    kr = min(V // 2, M)
    # Invalid slots score a finite sentinel BIASED TOWARD HIGH slot indices:
    # pad rows of sparse tiles then occupy the tile's top slots, disjoint
    # from insert-eviction's choices (retention ties resolve to LOW indices)
    # — required by the chunked replay, where an insert into a resident view
    # column must be dropped (ff_insert evict_exclude) and a low-index
    # overlap would starve map growth on fresh tiles.
    # (bf16 scores were tried here and MEASURED SLOWER: these selections are
    # bound by the bucket sort, and the TPU sorts bf16 keys slower than f32.)
    # step 1e24 >> ulp(1e30) in BOTH f32 (~1e23) and f64; max M*1e24 ~ 5e28
    inv_score = (-1e30 + 1e24 * jnp.arange(M, dtype=dt))[None, :]  # (1, M)
    score_w = jnp.where(vmask2, w2, inv_score)
    score_r = jnp.where(vmask2, cs2, inv_score)
    _, idx_w = top_k_maybe_approx(score_w, kw, cfg.approx_topk)  # (S, kw)
    _, idx_r = top_k_maybe_approx(score_r, kr, cfg.approx_topk)  # (S, kr)
    # Recency rows already selected by the weight half are duplicates.
    dup_r = jnp.any(idx_r[:, :, None] == idx_w[:, None, :], axis=2)  # (S, kr)
    dup = jnp.concatenate(
        [jnp.zeros((S, kw), bool), dup_r], axis=1)           # (S, kw+kr)
    idx = jnp.concatenate([idx_w, idx_r], axis=1)            # (S, kw+kr)
    k = idx.shape[1]
    if k < V:  # tiny-config safety: pad with repeats of slot 0
        idx = jnp.pad(idx, ((0, 0), (0, V - k)))
        dup = jnp.pad(dup, ((0, 0), (0, V - k)), constant_values=True)
    s_idx = jnp.repeat(jnp.arange(S, dtype=jnp.int32), idx.shape[1])
    m_idx = idx.reshape(-1).astype(jnp.int32)
    slab_cols = (s_idx * M + m_idx).astype(jnp.int32)
    return slab_cols, dup.reshape(-1)


def ff_select_view_pages(sf: "SlabsFF", S: int, cfg: GCConfig):
    """PAGED view membership (``cfg.view_page`` > 0): per active slab, the
    ``m_tile_view / P`` view pages split between the top pages by SUM OF
    VALID WEIGHTS (weight half, first — ``compact_merge_reduce`` merges a
    prefix) and the top pages by MAX created_seq (recency half, keeping the
    insertion->associate->fuse loop closed at page granularity; see
    ``ff_select_view_cols`` for why a recency half exists at all).

    Page selection replaces the (S, m_tile) approx_max_k sorts with exact
    (S, m_tile/P) top-k — the payoff is in the GATHER: page-aligned slices
    stream as contiguous DMA instead of ~48 ns/column serialized gathers
    (the round-2 top sink).

    Returns (pages (S, Vp) tile-local page indices, dup (S, Vp) bool —
    recency copies of weight-selected pages, dropped on write-back).
    """
    P = cfg.view_page
    ff = sf.ff
    cf, SM = ff.shape
    M = SM // S
    assert M % P == 0 and cfg.m_tile_view % P == 0, (M, cfg.m_tile_view, P)
    npg = M // P
    Vp = cfg.m_tile_view // P
    o = _O_SCAL
    vmask = (ff[o + _ROW_V] > 0.5).reshape(S, npg, P)
    w = jnp.where(vmask, ff[o + _ROW_W].reshape(S, npg, P), 0.0)
    cs = jnp.where(vmask, ff[o + _ROW_CS].reshape(S, npg, P), -1.0)
    kwp = min(Vp - Vp // 2, npg)
    krp = min(Vp // 2, npg)
    _, pw = jax.lax.top_k(jnp.sum(w, axis=-1), kwp)          # (S, kwp)
    if krp > 0:
        _, pr = jax.lax.top_k(jnp.max(cs, axis=-1), krp)     # (S, krp)
        dup_r = jnp.any(pr[:, :, None] == pw[:, None, :], axis=2)
        pages = jnp.concatenate([pw, pr], axis=1)
        dup = jnp.concatenate([jnp.zeros((S, kwp), bool), dup_r], axis=1)
    else:
        pages, dup = pw, jnp.zeros((S, kwp), bool)
    if pages.shape[1] < Vp:  # tiny-config safety: repeats of page 0, dropped
        pad = Vp - pages.shape[1]
        pages = jnp.pad(pages, ((0, 0), (0, pad)))
        dup = jnp.pad(dup, ((0, 0), (0, pad)), constant_values=True)
    return pages.astype(jnp.int32), dup


def ff_gather_pages(sf: "SlabsFF", pages: jnp.ndarray, dup: jnp.ndarray,
                    S: int, cfg: GCConfig):
    """Gather the selected pages' rows + ids with page-aligned slices.

    Returns (rows (V, CF), slab_cols (V,), dup_f (V,), prim_ids (V,),
    put_pages (S*Vp,) flat page write-back targets — S*npg = drop)."""
    P = cfg.view_page
    cf, SM = sf.ff.shape
    M = SM // S
    npg = M // P
    pflat = (jnp.arange(S, dtype=jnp.int32)[:, None] * npg
             + pages).reshape(-1)                            # (S*Vp,)
    g3 = jnp.take(sf.ff.reshape(cf, S * npg, P), pflat, axis=1)
    rows = g3.reshape(cf, -1).T                              # (V, CF)
    prim_ids = jnp.take(sf.prim_ids.reshape(S * npg, P), pflat,
                        axis=0).reshape(-1)
    base = (jnp.arange(S, dtype=jnp.int32)[:, None] * M
            + pages * P)                                     # (S, Vp)
    slab_cols = (base[..., None]
                 + jnp.arange(P, dtype=jnp.int32)).reshape(-1)
    dup_f = jnp.repeat(dup.reshape(-1), P)
    put_pages = jnp.where(dup.reshape(-1), jnp.int32(S * npg), pflat)
    return rows, slab_cols, dup_f, prim_ids, put_pages


def ff_write_view_pages(sf: "SlabsFF", put_pages: jnp.ndarray,
                        rows: jnp.ndarray, S: int, cfg: GCConfig) -> "SlabsFF":
    """Paged counterpart of ``ff_write_view``: one drop-mode PAGE scatter
    (each page a contiguous (CF, P) block; duplicate pages point out of
    bounds)."""
    P = cfg.view_page
    cf, SM = sf.ff.shape
    npg = SM // S // P
    ff3 = sf.ff.reshape(cf, S * npg, P)
    rows3 = jnp.swapaxes(rows, 0, 1).reshape(cf, -1, P)
    ff3 = ff3.at[:, put_pages, :].set(rows3, mode="drop")
    return sf._replace(ff=ff3.reshape(cf, SM))


def view_from_rows(g: jnp.ndarray, slab_cols: jnp.ndarray,
                   dup_f: jnp.ndarray, prim_ids: jnp.ndarray, SM: int,
                   cfg: GCConfig) -> MapView:
    """Derive the full MapView (positions/dirs/kappas/packed/...) from the
    gathered field rows ``g (V', CF)``. Split out of ``ff_extract_view`` so
    the chunked replay can re-derive a fresh view each scan from the
    RESIDENT rows (which fuse/merge update in place) without re-selecting or
    re-gathering membership."""
    cf = g.shape[1]
    o = _O_SCAL
    dt = g.dtype
    Lam = sym6_to_mat33(g[:, 0:6])                           # (V', 3, 3)
    the = g[:, 6:9]                                          # (V', 3)
    eta0 = g[:, _O_ETA:_O_ETA + 3]                           # (V', 3) lobe 0
    wv = g[:, o + _ROW_W]
    val = (g[:, o + _ROW_V] > 0.5) & ~dup_f
    pos = jnp.einsum("nij,nj->ni", inv3x3(Lam, cfg.eps_lift), the)
    kap = jnp.linalg.norm(eta0, axis=-1)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype=dt), eta0.shape)
    dirs = jnp.where(kap[:, None] > cfg.eps_mass,
                     eta0 / jnp.maximum(kap[:, None], cfg.eps_mass), ez)

    # Normalized shape precision for soft point-to-plane weighting (see
    # visual_evidence): Lambda / tr(Lambda) blended toward I by the floor.
    # Precomputed HERE so candidate consumers read it from the packed matrix.
    lam6 = g[:, 0:6]
    tr = lam6[:, 0] + lam6[:, 3] + lam6[:, 5]
    shape6 = lam6 / jnp.maximum(tr, cfg.eps_lift)[:, None]
    f = cfg.p2p_shape_floor
    eye6 = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], dtype=dt)[None, :]
    has = (tr > cfg.eps_lift)[:, None].astype(dt)
    shape6 = (1.0 - f) * shape6 + f * eye6 * has

    # Packed per-candidate matrix: downstream consumers (association top-K,
    # visual evidence, lidar-IW residuals, fuse targeting) gather candidate
    # rows ONCE from this instead of one row-serialized gather per field
    # (profiled ~100 us per 12288-row gather pass).
    # cols: 0:3 pos | 3:6 dir | 6 kappa | 7:13 shape6 | 13 weight
    #       14 valid | 15 last_supported | 16 slab_idx (exact < 2^24)
    #       17 scalar precision tr(Lambda)/3 (pair-precision cap in the
    #          visual-evidence WLS)
    #       18 created_seq (age gate of the rotation scatter — mature
    #          primitives anchor yaw; see visual_evidence)
    packed = jnp.concatenate([
        pos, dirs, kap[:, None], shape6, wv[:, None],
        val.astype(dt)[:, None], g[:, o + _ROW_LS][:, None],
        slab_cols.astype(dt)[:, None], (tr / 3.0)[:, None],
        g[:, o + _ROW_CS][:, None],
    ], axis=1)                                               # (V', 19)
    return MapView(
        positions=pos, Lambdas=Lam, directions=dirs, kappas=kap, weights=wv,
        valid=val,
        last_supported=g[:, o + _ROW_LS].astype(jnp.int32),
        prim_ids=prim_ids,
        slab_idx=slab_cols,
        packed=packed,
        raw=g,
        put_idx=jnp.where(dup_f, jnp.int32(SM), slab_cols),
    )


def ff_extract_view(sf: SlabsFF, S: int, cfg: GCConfig) -> MapView:
    """Membership selection + ONE row gather + view derivation (see
    ``ff_select_view_cols`` / ``view_from_rows``)."""
    cf, SM = sf.ff.shape
    slab_cols, dup_f = ff_select_view_cols(sf, S, cfg)
    g = sf.ff[:, slab_cols].T                                # (V', CF)
    return view_from_rows(g, slab_cols, dup_f, sf.prim_ids[slab_cols], SM,
                          cfg)


# ---------------------------------------------------------------------------
# Scatter-phase ops (fuse / insert / cull / forget / merge) on the COL-MAJOR
# form ``ff (CF, S*M)``. The three indexed write-backs in this phase all want
# the component axis outer (column-window scatters); running them on the
# row-major (S, CF, M) slabs made XLA materialize a layout-flip copy pair
# around EVERY scatter (profiled ~675 us/scan of (7,32,50176) copies +
# reshapes). The pipeline converts ONCE before fuse and ONCE after merge
# (~50 us each); the dense passes in between (retention scores, cull,
# forget, merge scores) are pure row operations that work in either form.
# ---------------------------------------------------------------------------


class SlabsFF(NamedTuple):
    """Col-major scatter-phase working set: ``ff (CF, S*M)``,
    ``prim_ids (S*M,)`` (s-major flattening)."""

    ff: jnp.ndarray
    prim_ids: jnp.ndarray
    next_prim_id: jnp.ndarray


def slabs_to_ff(sl: Slabs) -> SlabsFF:
    S, cf, M = sl.fdata.shape
    return SlabsFF(ff=jnp.swapaxes(sl.fdata, 0, 1).reshape(cf, S * M),
                   prim_ids=sl.prim_ids.reshape(S * M),
                   next_prim_id=sl.next_prim_id)


def slabs_from_ff(sf: SlabsFF, S: int) -> Slabs:
    cf, SM = sf.ff.shape
    M = SM // S
    return Slabs(fdata=jnp.swapaxes(sf.ff.reshape(cf, S, M), 0, 1),
                 prim_ids=sf.prim_ids.reshape(S, M),
                 next_prim_id=sf.next_prim_id)


def _fuse_base_rows(batch_w: MeasurementBatch, cf: int, dt,
                    marker_row: int | None = None,
                    cam_geom_scale: float = 1.0):
    """Per-measurement (N, CF) additive contribution rows in field order.
    ``marker_row`` (optional) gets a 1.0 support marker — ``ff_fuse`` rides
    it through its scatter on a spare pad row (compact_fuse needs none: it
    tests the weight delta directly). ``cam_geom_scale`` scales camera rows'
    (Lambda, theta) jointly (mean-preserving; see
    GCConfig.camera_fuse_geom_scale) — fuse call sites pass the config
    value; the insert path keeps the default 1.0 (created primitives need
    their full precision)."""
    N = batch_w.weights.shape[0]
    is_cam = (batch_w.sources == 0).astype(dt)
    is_lid = (batch_w.sources == 1).astype(dt)
    w = batch_w.weights
    col = jnp.clip(batch_w.colors, 0.0, 1.0)
    n_pad = cf - _O_ETA - batch_w.etas.shape[1] * 3
    lam6 = mat33_to_sym6(batch_w.Lambdas)
    th = batch_w.thetas
    # clamp to the documented [0, 1] range: gs < 0 flips the sign of the
    # camera rows' (Lambda, theta) contribution (indefinite fused Lambda)
    cam_geom_scale = min(max(cam_geom_scale, 0.0), 1.0)
    if cam_geom_scale != 1.0:
        gs = (1.0 - (1.0 - cam_geom_scale) * is_cam)[:, None]
        lam6 = lam6 * gs
        th = th * gs
    base = jnp.concatenate([
        lam6,                                                # (N, 6)
        th,                                                  # (N, 3)
        (w * is_cam)[:, None] * col,                         # (N, 3) rgb_acc
        w[:, None],                                          # weights
        (w * is_cam)[:, None],                               # cam_mass
        (w * is_lid)[:, None],                               # lidar_mass
        (w * is_cam)[:, None],                               # rgb_denom
        jnp.zeros((N, 1), dtype=dt),                         # created_seq
        jnp.zeros((N, 1), dtype=dt),                         # last_supported
        jnp.zeros((N, 1), dtype=dt),                         # valid
        batch_w.etas.reshape(N, -1),                         # (N, 3B)
        jnp.zeros((N, n_pad), dtype=dt),                     # tile-align pad
    ], axis=1)                                               # (N, CF)
    if marker_row is not None:
        base = base.at[:, marker_row].set(1.0)
    return base


def ff_fuse(sf: SlabsFF, batch_w: MeasurementBatch, resp: jnp.ndarray,
            cand_view_idx: jnp.ndarray, cand_valid: jnp.ndarray,
            view_slab_idx: jnp.ndarray, scan_seq, cfg: GCConfig):
    """PoE fuse (parity: primitive_map_fuse, :992-1163).

    resp: (N, K); cand_view_idx: (N, K) rows into the extracted view;
    cand_valid: (N, K); view_slab_idx: (V,) slab-flat index of each view row.
    Lambda += pi*Lambda_m, theta += pi*theta_m, eta += pi*eta_m,
    weight += pi*w_m; supported slots stamp ``last_supported = scan_seq``.

    Every add-contribution is linear in the responsibility, so the update is
    built as a per-measurement base row (N, CF) broadcast over K. It lands in
    two stages, both single scatter passes: (1) accumulate the N*K candidate
    rows into a COMPACT (V, CF) per-view-row delta with contiguous windows,
    then (2) one column-window scatter of the V delta rows into ff
    (duplicated view rows of the same slot add correctly). The
    last-supported stamp rides the same scatters as a marker row (support
    mass lands in the LS row; a dense pass then rewrites it as
    ``where(mass arrived, seq, previous)``).
    """
    ff = sf.ff
    cf = ff.shape[0]
    o = _O_SCAL
    dt = ff.dtype
    N, K = resp.shape
    V = view_slab_idx.shape[0]
    r = resp * batch_w.valid[:, None].astype(dt) * cand_valid.astype(dt)
    rf = r.reshape(-1)
    w = batch_w.weights

    # Support marker rides a spare PAD row when one exists (vmf_n_lobes=3
    # pads CF 28 -> 32): the old marker-on-the-LS-row trick silently failed
    # to stamp once the responsibility mass fell below the f32 ulp of the
    # stored seq (~seq * 6e-8).
    has_pad = cf > _O_ETA + batch_w.etas.shape[1] * 3
    marker = cf - 1 if has_pad else o + _ROW_LS
    base = _fuse_base_rows(batch_w, cf, dt, marker_row=marker,
                           cam_geom_scale=cfg.camera_fuse_geom_scale)
    vals = (base[:, None, :] * r[:, :, None]).reshape(N * K, cf)

    # Stage 1: compact per-view-row accumulation (contiguous windows).
    delta = jnp.zeros((V, cf), dtype=dt)
    delta = delta.at[cand_view_idx.reshape(-1)].add(vals)
    # Stage 2: ONE column-window scatter (the view's top-k indices are nearly
    # sorted, which the scatter exploits).
    ls_prev = ff[o + _ROW_LS]
    ff = ff.at[:, view_slab_idx.astype(jnp.int32)].add(delta.T)

    # Dense rewrite of the LS row: support mass arrived => stamp scan_seq.
    seqf = jnp.asarray(scan_seq, dtype=dt)
    if has_pad:
        ff = ff.at[o + _ROW_LS].set(
            jnp.where(ff[marker] > 0.0, seqf, ls_prev))
        ff = ff.at[marker].set(jnp.zeros_like(ff[marker]))
    else:
        ls_tmp = ff[o + _ROW_LS]
        ff = ff.at[o + _ROW_LS].set(jnp.where(ls_tmp > ls_prev, seqf, ls_prev))

    certs = {
        "map.fused_mass": jnp.sum(rf * jnp.repeat(w, K)),
        "map.fuse_resp_total": jnp.sum(rf),
    }
    return sf._replace(ff=ff), certs


def compact_fuse(view: MapView, batch_w: MeasurementBatch, resp: jnp.ndarray,
                 cand_view_idx: jnp.ndarray, cand_valid: jnp.ndarray,
                 scan_seq, cfg: GCConfig):
    """PoE fuse on the COMPACT view rows (parity: primitive_map_fuse,
    :992-1163): the N*K responsibility-weighted contributions accumulate into
    a (V, CF) delta with one contiguous-window scatter-add, and the updated
    rows are returned for the single end-of-phase write-back
    (``ff_write_view``) instead of scattering into the slab block here.

    The last-supported stamp tests the WEIGHT-row delta directly
    (``delta_w > 0``), not the float-marker-on-seq trick of the legacy
    ``ff_fuse`` whose stamp silently failed once the responsibility mass fell
    below the f32 ulp of the stored seq.
    """
    raw = view.raw
    V, cf = raw.shape
    o = _O_SCAL
    dt = raw.dtype
    r = resp * batch_w.valid[:, None].astype(dt) * cand_valid.astype(dt)
    rf = r.reshape(-1)
    base = _fuse_base_rows(batch_w, cf, dt,
                           cam_geom_scale=cfg.camera_fuse_geom_scale)
    N, K = r.shape
    vals = (base[:, None, :] * r[:, :, None]).reshape(N * K, cf)

    idx = cand_view_idx.reshape(-1).astype(jnp.int32)
    from fl_slam_tpu.ops import surfel_kernels
    if (cfg.fuse_moment_kernel and V % 128 == 0 and (N * K) % 128 == 0
            and (surfel_kernels.FORCE_INTERPRET
                 or jax.default_backend() == "tpu")):
        # factored one-hot MXU contraction (see GCConfig.fuse_moment_kernel):
        # the same segment-sum as the scatter below, scatter-free
        delta = surfel_kernels.moment_segment_sum(vals.T, idx, V).T
    else:
        delta = jnp.zeros((V, cf), dtype=dt)
        delta = delta.at[idx].add(vals)
    rows = raw + delta
    # LS row: the base rows carry a 1.0 marker there (legacy scatter path);
    # in compact form we overwrite it with the stamp rule directly.
    supported = delta[:, o + _ROW_W] > 0.0
    rows = rows.at[:, o + _ROW_LS].set(
        jnp.where(supported, jnp.asarray(scan_seq, dt), raw[:, o + _ROW_LS]))
    certs = {
        "map.fused_mass": jnp.sum(rf * jnp.repeat(batch_w.weights, K)),
        "map.fuse_resp_total": jnp.sum(rf),
        # ExpectedEffect: mass the OT plan intends to deposit vs the mass the
        # masked scatter actually fused (certificates.py:348-510); divergence
        # = invalid-candidate / invalid-measurement masking.
        "map.effect_predicted": jnp.sum(
            resp * jnp.repeat(batch_w.weights, K).reshape(N, K)),
        "map.effect_realized": jnp.sum(rf * jnp.repeat(batch_w.weights, K)),
    }
    return rows, certs


def compact_merge_reduce(rows: jnp.ndarray, S: int, kw: int, cfg: GCConfig):
    """Merge-reduce on the view's weight-half rows, in place in the compact
    (V, CF) row matrix (parity: primitive_map_merge_reduce, :1501-2031).

    ``kw`` is the per-tile weight-half length from the view extraction. The
    merge subset (top-``merge_max_tile`` by weight per tile) is exactly a
    PREFIX of each tile's weight-half view rows — the view's weight half is
    already weight-sorted — so no extra top-k, gather, or scatter runs at
    all. Deltas vs the reference, both bounded to one scan: the subset order
    is pre-fuse weight order, and primitives inserted THIS scan (not yet in
    the view) first become mergeable next scan.
    """
    if cfg.k_merge_pairs <= 0:
        return rows, {"map.merged_pairs": jnp.zeros((), rows.dtype)}
    V, cf = rows.shape
    Vt = V // S                        # view rows per tile
    Sm = min(cfg.merge_max_tile, max(kw, 1))
    g = rows.reshape(S, Vt, cf)[:, :Sm]                      # (S, Sm, CF)
    outs, n_merged = _merge_tiles(g, cfg)
    rows = rows.reshape(S, Vt, cf).at[:, :Sm].set(outs).reshape(V, cf)
    certs = {"map.merged_pairs": jnp.sum(n_merged).astype(rows.dtype)}
    return rows, certs


def ff_write_view(sf: SlabsFF, view: MapView, rows: jnp.ndarray) -> SlabsFF:
    """ONE column scatter writing the updated compact rows back to their slab
    columns (duplicate/pad rows were pointed out of bounds at extraction).

    (Measured: pre-sorting the columns into ascending order does NOT speed
    this scatter up — the ~48 ns/column serialization is order-independent on
    this TPU — so the rows scatter in view order directly.)"""
    SM = sf.ff.shape[1]
    tgt = jnp.minimum(view.put_idx, jnp.int32(SM))
    return sf._replace(ff=sf.ff.at[:, tgt].set(rows.T, mode="drop"))


# ---------------------------------------------------------------------------
# Novelty insertion (parity: pipeline.py:1329-1410 + insert_masked :807-981).
# ---------------------------------------------------------------------------

def ff_page_stats(sf: SlabsFF, S: int, cfg: GCConfig, scan_seq):
    """Per-page insert-targeting aggregates (paged view mode): invalid-slot
    counts and retention sums, both (S, npg).

    Computed ONCE per chunk from the full slab (right after the dense
    inflate/forget/cull pass) and maintained incrementally by ``ff_insert``:
    within a chunk only inserts touch non-resident pages (fuse/merge operate
    on resident rows, which are excluded from insert targeting), so the only
    drift is the uniform exp(-lambda * (seq - seq0)) staleness decay on the
    chunk-start retention sums — a per-page ORDERING no-op against other old
    mass, bounded by view_refresh_every-1 scans against freshly inserted
    mass. Replaces three full-slab (S*M) passes per scan (~35 us measured).
    """
    ff = sf.ff
    o = _O_SCAL
    dt = ff.dtype
    M = ff.shape[1] // S
    P = cfg.view_page
    npg = M // P
    seqf = jnp.asarray(scan_seq, dtype=dt)
    vmask = ff[o + _ROW_V].reshape(S, M) > 0.5
    stale = jnp.maximum(seqf - ff[o + _ROW_LS].reshape(S, M), 0.0)
    ret = jnp.where(vmask,
                    ff[o + _ROW_W].reshape(S, M)
                    * jnp.exp(-cfg.recency_decay_lambda * stale), 0.0)
    inv_cnt = jnp.sum((~vmask).reshape(S, npg, P), axis=-1).astype(dt)
    ret_pg = jnp.sum(ret.reshape(S, npg, P), axis=-1)
    return inv_cnt, ret_pg


def ff_insert(sf: SlabsFF, batch_w: MeasurementBatch, novelty: jnp.ndarray,
              meas_keys: jnp.ndarray, active_keys: jnp.ndarray, scan_seq,
              cfg: GCConfig, evict_exclude=None, resident_pages=None,
              page_stats=None):
    """Insert top-``k_insert`` novel measurements per active tile.

    novelty: (N,) = max(a - row_mass, 0) from unbalanced OT. Insert weight =
    novelty * meas weight. Eviction per tile: invalid slots first, then lowest
    retention = weight * exp(-lambda * staleness).

    ``resident_pages`` (paged view mode): flat resident page indices
    (s * npg + p). Eviction then targets the K lowest-retention slots WITHIN
    the single lowest-retention NON-RESIDENT page of each tile — inserts
    cluster into one page per tile per scan, so the recency page score
    surfaces them at the next membership refresh, and write-back clobbering
    is impossible by construction (no per-slot exclusion test needed).
    """
    ff = sf.ff
    cf, SM = ff.shape
    S = active_keys.shape[0]
    M = SM // S
    o = _O_SCAL
    dt = ff.dtype
    K = cfg.k_insert
    seqf = jnp.asarray(scan_seq, dtype=dt)

    score = novelty * batch_w.weights
    score = jnp.where(batch_w.valid, score, -1e30)

    in_tile = meas_keys[None, :] == active_keys[:, None]     # (S, N)
    score_t = jnp.where(in_tile, score[None, :], -1e30)
    top_score, ins_idx = jax.lax.top_k(score_t, K)           # (S, K)
    do_insert = jnp.take_along_axis(in_tile, ins_idx, axis=1) & (top_score > -1e20)

    if resident_pages is not None:
        P = cfg.view_page
        npg = M // P
        # Inserts need at least one NON-resident page per tile, or the
        # all-excluded argmin below would silently target a resident page
        # and the end-of-chunk write-back would clobber the inserts.
        assert npg * P > cfg.m_tile_view, (
            "paged view needs m_tile > m_tile_view", M, cfg.m_tile_view)
        if page_stats is None:
            inv_cnt, ret_pg = ff_page_stats(sf, S, cfg, scan_seq)
        else:
            inv_cnt, ret_pg = page_stats
        # Page choice, two regimes in one argmin (no cond):
        #   space exists -> the FULLEST page that still fits K proposals
        #     (free slots >= K). Preferring fullest-first packs pages densely
        #     instead of opening a fresh page per scan — a half-empty page
        #     per scan fragments the tile and the weight-sum view selection
        #     then gathers half-invalid pages (measured: production
        #     translation ATE doubled).
        #   tile full -> the page with the least retention to evict.
        # Resident pages are excluded wholesale.
        fits = inv_cnt >= K
        score = jnp.where(fits, inv_cnt, 1e8 + ret_pg)
        pages_glob = (jnp.arange(S, dtype=jnp.int32)[:, None] * npg
                      + jnp.arange(npg, dtype=jnp.int32)[None, :])
        excl = jnp.any(pages_glob[:, :, None]
                       == resident_pages[None, None, :], axis=-1)
        score = jnp.where(excl, jnp.inf, score)
        tgt_page = jnp.argmin(score, axis=1)                 # (S,)
        # Per-slot retention WITHIN the target page only: ONE column gather of
        # the target pages (all CF rows ride the same ~per-column pass), then
        # row slices — three separate single-row gathers each paid their own
        # column pass (~16 us/scan measured).
        offs = (jnp.arange(S, dtype=jnp.int32) * M
                + tgt_page.astype(jnp.int32) * P)            # (S,) col starts
        cols = offs[:, None] + jnp.arange(P, dtype=jnp.int32)[None, :]
        # contiguous-page gather via the vmap-safe kernel wrapper: the plain
        # column gather is bitcast-free single-instance but forces full-ff
        # layout round-trips under the instance vmap (atlas_kernels note)
        page = atlas_kernels.page_gather_ff(ff, offs, P)     # (CF, S*P)
        w_in = page[o + _ROW_W].reshape(S, P)
        ls_in = page[o + _ROW_LS].reshape(S, P)
        v_in = page[o + _ROW_V].reshape(S, P) > 0.5
        ret_in = jnp.where(
            v_in, w_in * jnp.exp(-cfg.recency_decay_lambda
                                 * jnp.maximum(seqf - ls_in, 0.0)), -1.0)
        assert K <= P, (K, P)  # one page must hold a scan's insert budget
        _, slot_in = jax.lax.top_k(-ret_in, K)               # (S, K)
        evict_slot = tgt_page[:, None] * P + slot_in
    else:
        # Eviction targets: K lowest-retention slots per active tile.
        vmask = ff[o + _ROW_V].reshape(S, M) > 0.5
        stale = jnp.maximum(seqf - ff[o + _ROW_LS].reshape(S, M), 0.0)
        retention = jnp.where(vmask,
                              ff[o + _ROW_W].reshape(S, M) *
                              jnp.exp(-cfg.recency_decay_lambda * stale),
                              -1.0)
        _, evict_slot = top_k_maybe_approx(-retention, K,
                                           cfg.approx_topk)  # (S, K)

    do_f = do_insert.reshape(-1)                             # (S*K,)
    if evict_exclude is not None:
        # Chunked replay: RESIDENT view columns must never be evicted — the
        # end-of-chunk write-back would clobber the inserted primitive with
        # the stale resident row. Membership test on the selected slots
        # ((S*K, V) compare, ~5 us) — building a (S*M,) bool mask costs a
        # 7168-column scatter (~370 us/chunk, measured), defeating the
        # chunking. Colliding proposals are DROPPED (not re-slotted):
        # collisions only occur for invalid/weak view rows, and the dropped
        # novelty re-proposes next scan.
        sel_cols = (jnp.repeat(jnp.arange(S, dtype=jnp.int32), K) * M
                    + evict_slot.reshape(-1).astype(jnp.int32))  # (S*K,)
        hit = jnp.any(sel_cols[:, None] == evict_exclude[None, :], axis=1)
        do_f = do_f & ~hit
    gi = ins_idx.reshape(-1)                                 # (S*K,) meas rows
    w_new = (novelty[gi] * batch_w.weights[gi]).astype(dt)
    # Pre-cull: a proposal whose insert weight is already below the cull
    # threshold would be culled immediately (reference: inserted then culled
    # the same scan); skipping it at insert reaches the same state without
    # burning an eviction slot or a primitive id.
    do_f = do_f & (w_new >= cfg.cull_weight_threshold)
    prefix = jnp.cumsum(do_f.astype(jnp.int32)) - 1
    new_ids = jnp.where(do_f, sf.next_prim_id + prefix, jnp.int32(-1))
    w_new = jnp.where(do_f, w_new, 0.0)
    sub = _fuse_base_rows(
        MeasurementBatch(
            Lambdas=batch_w.Lambdas[gi], thetas=batch_w.thetas[gi],
            etas=batch_w.etas[gi], weights=w_new,
            valid=batch_w.valid[gi], sources=batch_w.sources[gi],
            colors=batch_w.colors[gi]), cf, dt)              # (SK, CF)
    # Rewrite the marker/scalar rows for SET semantics: created = ls = seq,
    # valid = 1 on inserting rows.
    SK = gi.shape[0]
    ones = jnp.ones((SK,), dtype=dt)
    sub = sub.at[:, o + _ROW_CS].set(seqf * ones)
    sub = sub.at[:, o + _ROW_LS].set(seqf * ones)
    sub = sub.at[:, o + _ROW_V].set(ones)

    if resident_pages is not None and cfg.insert_page_dense:
        # Paged mode: every eviction slot lives in the ONE gathered target
        # page per tile, so the write-back is a DENSE page rewrite (merge
        # the SK proposals into the (CF, S, P) page in registers, write the
        # same S*P contiguous-run columns the gather read) instead of an
        # unsorted 448-column drop scatter (~25 us/scan -> ~10 us measured;
        # scattered column stores pay ~2-3x the sorted-run price).
        do_sk_w = do_f.reshape(S, K)
        onek = ((slot_in[:, :, None]
                 == jnp.arange(P, dtype=jnp.int32)[None, None, :])
                & do_sk_w[:, :, None])                       # (S, K, P)
        hit = jnp.any(onek, axis=1)                          # (S, P)
        sub3 = sub.reshape(S, K, cf)
        merged = jnp.einsum("skp,skc->csp", onek.astype(dt), sub3)
        page3 = page.reshape(cf, S, P)
        upd = jnp.where(hit[None, :, :], merged, page3)
        cols_flat = cols.reshape(-1)
        ff = atlas_kernels.page_writeback_ff(ff, offs,
                                             upd.reshape(cf, S * P), P)
        pp = sf.prim_ids[cols_flat].reshape(S, P)
        id_sel = jnp.sum(onek * new_ids.reshape(S, K, 1), axis=1)
        prim_ids = sf.prim_ids.at[cols_flat].set(
            jnp.where(hit, id_sel, pp).reshape(-1).astype(jnp.int32))
    else:
        # Drop-mode column scatter: rows not inserting point out of bounds.
        tgt = (jnp.repeat(jnp.arange(S, dtype=jnp.int32), K) * M
               + evict_slot.reshape(-1).astype(jnp.int32))
        tgt_put = jnp.where(do_f, tgt, jnp.int32(SM))
        ff = ff.at[:, tgt_put].set(sub.T, mode="drop")
        prim_ids = sf.prim_ids.at[tgt_put].set(new_ids, mode="drop")

    sf = sf._replace(
        ff=ff, prim_ids=prim_ids,
        next_prim_id=sf.next_prim_id + jnp.sum(do_f, dtype=jnp.int32),
    )
    ins_mass = jnp.sum(w_new * do_f.astype(dt))
    certs = {
        "map.inserted_count": jnp.sum(do_f.astype(dt)),
        "map.inserted_mass": ins_mass,
        # ExpectedEffect: novel mass the OT left unexplained (the insertion
        # demand) vs mass actually inserted; divergence = the K-per-tile
        # budget, out-of-tile proposals, and the pre-cull threshold.
        "map.insert.effect_predicted": jnp.sum(
            jnp.where(batch_w.valid, novelty * batch_w.weights, 0.0)),
        "map.insert.effect_realized": ins_mass,
    }
    if page_stats is not None:
        # Incremental maintenance (see ff_page_stats): the target page gains
        # the inserted mass, loses the evicted retention, and its invalid
        # count drops by the newly-filled slots.
        do_sk = do_f.reshape(S, K)
        was_invalid = jnp.take_along_axis(~v_in, slot_in, axis=1)
        filled = jnp.sum((do_sk & was_invalid).astype(dt), axis=1)  # (S,)
        ret_ev = jnp.maximum(
            jnp.take_along_axis(ret_in, slot_in, axis=1), 0.0)
        dmass = jnp.sum(jnp.where(do_sk, w_new.reshape(S, K) - ret_ev, 0.0),
                        axis=1)                              # (S,)
        srange = jnp.arange(S, dtype=jnp.int32)
        inv_cnt = inv_cnt.at[srange, tgt_page].add(-filled)
        ret_pg = ret_pg.at[srange, tgt_page].add(dmass)
        return sf, certs, (inv_cnt, ret_pg)
    return sf, certs


# ---------------------------------------------------------------------------
# Cull + forget (parity: primitive_map_cull :1175-1304, _forget :1314-1384).
# ---------------------------------------------------------------------------

def ff_cull(sf: SlabsFF, cfg: GCConfig):
    """Invalidate primitives with weight below threshold."""
    ff = sf.ff
    o = _O_SCAL
    dt = ff.dtype
    w = ff[o + _ROW_W]
    v = ff[o + _ROW_V]
    below = (v > 0.5) & (w < cfg.cull_weight_threshold)
    certs = {
        "map.culled_count": jnp.sum(below.astype(dt)),
        "map.culled_mass": jnp.sum(w * below.astype(dt)),
    }
    ff = ff.at[o + _ROW_V].set(jnp.where(below, 0.0, v))
    ff = ff.at[o + _ROW_W].set(jnp.where(below, 0.0, w))
    return sf._replace(ff=ff), certs


def ff_forget(sf: SlabsFF, cfg: GCConfig) -> SlabsFF:
    """weights *= gamma (continuous forgetting, every scan)."""
    return sf._replace(
        ff=sf.ff.at[_O_SCAL + _ROW_W].multiply(cfg.forgetting_factor))


# ---------------------------------------------------------------------------
# Merge-reduce (parity: primitive_map_merge_reduce, :1501-2031).
# ---------------------------------------------------------------------------

def ff_merge_reduce(sf: SlabsFF, S: int, cfg: GCConfig):
    """Greedy Bhattacharyya merge of up to ``k_merge_pairs`` pairs per tile.

    Runs on the top-``merge_max_tile``-by-weight subset of each active tile
    (the reference instead skips merging entirely when the tile exceeds its
    O(M^2) cap — here the subset keeps merge active at any tile size with
    bounded cost). Distance: Bhattacharyya between position Gaussians.
    Merge: moment matching (mean/cov), natural-param add for vMF, mass add.
    """
    if cfg.k_merge_pairs <= 0:  # static ablation switch
        return sf, {"map.merged_pairs": jnp.zeros((), sf.ff.dtype)}
    ff = sf.ff
    cf, SM = ff.shape
    M = SM // S
    o = _O_SCAL
    Sm = min(cfg.merge_max_tile, M)
    P = cfg.k_merge_pairs
    dt = ff.dtype
    eps_lift = cfg.eps_lift
    eps_psd = cfg.eps_psd
    thr = cfg.merge_threshold
    nB3 = 3 * cfg.vmf_n_lobes

    # Top-Sm-by-weight subset per tile, fetched with ONE column gather.
    w_all = ff[o + _ROW_W].reshape(S, M)
    v_all = ff[o + _ROW_V].reshape(S, M) > 0.5
    sc = jnp.where(v_all, w_all, -jnp.inf)
    _, subs = top_k_maybe_approx(sc, Sm, cfg.approx_topk)    # (S, Sm)
    gidx = (jnp.repeat(jnp.arange(S, dtype=jnp.int32), Sm) * M
            + subs.reshape(-1).astype(jnp.int32))
    g = ff[:, gidx].T.reshape(S, Sm, cf)                     # (S, Sm, CF)

    outs, n_merged = _merge_tiles(g, cfg)

    # ONE column scatter back (disjoint across tiles and within tile).
    ff = ff.at[:, gidx].set(outs.reshape(S * Sm, cf).T)
    certs = {"map.merged_pairs": jnp.sum(n_merged).astype(dt)}
    return sf._replace(ff=ff), certs


def _merge_tiles(g: jnp.ndarray, cfg: GCConfig):
    """Greedy Bhattacharyya pair merge on (S, Sm, CF) tile row blocks.

    Shared body of ``ff_merge_reduce`` (standalone, gathers its own subset)
    and ``compact_merge_reduce`` (runs on the view's weight-half prefix).
    Returns (updated (S, Sm, CF), merged pair counts (S,)).
    """
    S, Sm, cf = g.shape
    o = _O_SCAL
    dt = g.dtype
    eps_lift = cfg.eps_lift
    eps_psd = cfg.eps_psd
    thr = cfg.merge_threshold
    P = cfg.k_merge_pairs
    nB3 = 3 * cfg.vmf_n_lobes

    def one_tile(gt):
        # gt (Sm, CF): one tile's top-by-weight rows.
        Lam = sym6_to_mat33(gt[:, 0:6])                      # (Sm, 3, 3)
        the = gt[:, 6:9]
        eta = gt[:, _O_ETA:_O_ETA + nB3]                     # (Sm, 3B)
        ra = gt[:, 9:12]                                     # (Sm, 3)
        w = gt[:, o + _ROW_W]
        v = gt[:, o + _ROW_V] > 0.5
        cm = gt[:, o + _ROW_CM]
        lm = gt[:, o + _ROW_LM]
        rd = gt[:, o + _ROW_RD]
        cs_k = gt[:, o + _ROW_CS]
        ls_k = gt[:, o + _ROW_LS]

        Sig = inv3x3(Lam, eps_lift)
        mu = jnp.einsum("nij,nj->ni", Sig, the)
        det = jnp.linalg.det(Sig)

        Sbar = 0.5 * (Sig[:, None] + Sig[None, :])           # (Sm, Sm, 3, 3)
        detS = jnp.linalg.det(Sbar)
        dmu = mu[:, None, :] - mu[None, :, :]
        quad = 0.125 * jnp.einsum("abi,abij,abj->ab", dmu,
                                  inv3x3(Sbar, eps_lift), dmu)
        logt = 0.5 * jnp.log(jnp.maximum(detS, 1e-30) /
                             jnp.sqrt(jnp.maximum(det[:, None] * det[None, :],
                                                  0.0) + 1e-24))
        D = quad + logt
        pair_ok = v[:, None] & v[None, :]
        # Static upper-triangle mask: jnp.triu_indices builds 32k/65k-element
        # int64 device cumsums that blow the TPU scoped-vmem budget inside
        # the replay lax.scan; the mask is a compile-time constant.
        mask = jnp.asarray(np.triu(np.ones((Sm, Sm), dtype=bool), 1))
        D = jnp.where(pair_ok & mask, D, jnp.inf)

        # Candidate pool: the 4P closest pairs, selected ONCE. The previous
        # fori_loop re-argmined and rewrote the full (Sm, Sm) D each pick
        # (~155 us/scan in the replay trace); greedy disjoint selection from
        # the 4P-pair pool is identical whenever the true greedy picks fall
        # inside the pool (each pick retires 2 rows, so 4P covers the worst
        # case of P picks sharing endpoints with runners-up).
        PC = min(4 * P, Sm * Sm)
        negd, flat = jax.lax.top_k(-D.reshape(-1), PC)       # ascending dist
        d_c = -negd                                          # (PC,)
        i_c = (flat // Sm).astype(jnp.int32)
        j_c = (flat % Sm).astype(jnp.int32)

        # Unrolled greedy (P is a small static budget): pick the closest
        # remaining candidate, retire every candidate sharing an endpoint.
        sel_i, sel_j, sel_ok = [], [], []
        d_work = d_c
        for _ in range(P):
            b = jnp.argmin(d_work)
            d_b = d_work[b]
            ok = jnp.isfinite(d_b) & (d_b < thr)
            ib, jb = i_c[b], j_c[b]
            sel_i.append(ib)
            sel_j.append(jb)
            sel_ok.append(ok)
            conflict = ((i_c == ib) | (i_c == jb)
                        | (j_c == ib) | (j_c == jb))
            d_work = jnp.where(ok & conflict, jnp.inf,
                               d_work.at[b].set(jnp.inf))
        si = jnp.stack(sel_i)                                # (P,)
        sj = jnp.stack(sel_j)
        ok_p = jnp.stack(sel_ok)                             # (P,) bool

        # Batched moment-matched merge of the selected pairs.
        Sig_i, Sig_j = Sig[si], Sig[sj]                      # (P, 3, 3)
        mu_i, mu_j = mu[si], mu[sj]
        w1, w2 = w[si], w[sj]
        ws = jnp.maximum(w1 + w2, eps_psd)
        mu_m = (w1[:, None] * mu_i + w2[:, None] * mu_j) / ws[:, None]
        d1 = mu_i - mu_m
        d2 = mu_j - mu_m
        Sig_m = (w1[:, None, None] * (Sig_i + d1[:, :, None] * d1[:, None, :])
                 + w2[:, None, None] * (Sig_j + d2[:, :, None] * d2[:, None, :])
                 ) / ws[:, None, None]
        Sig_m = Sig_m + eps_psd * jnp.eye(3, dtype=dt)
        Lam_m = inv3x3(Sig_m)
        the_m = jnp.einsum("pij,pj->pi", Lam_m, mu_m)
        eta_m = (w1[:, None] * eta[si] + w2[:, None] * eta[sj]) / ws[:, None]

        # Survivor (row i) and retired (row j) replacement rows (P, CF);
        # created_seq / last_supported pass through from the original rows.
        n_pad = cf - _O_ETA - nB3
        zcol = jnp.zeros((P, 1), dtype=dt)
        row_i = jnp.concatenate([
            mat33_to_sym6(Lam_m), the_m, ra[si] + ra[sj],
            ws[:, None], (cm[si] + cm[sj])[:, None],
            (lm[si] + lm[sj])[:, None], (rd[si] + rd[sj])[:, None],
            cs_k[si][:, None], ls_k[si][:, None],
            v[si].astype(dt)[:, None], eta_m,
            jnp.zeros((P, n_pad), dtype=dt)], axis=1)
        row_j = jnp.concatenate([
            gt[sj][:, 0:9], jnp.zeros((P, 3), dtype=dt),     # Lam/the; ra=0
            zcol, zcol, zcol, zcol,                          # w, cm, lm, rd
            cs_k[sj][:, None], ls_k[sj][:, None], zcol,      # cs, ls, v=0
            gt[sj][:, _O_ETA:_O_ETA + nB3],
            jnp.zeros((P, n_pad), dtype=dt)], axis=1)

        # Non-selected slots scatter out of bounds (dropped); selected pairs
        # are disjoint by construction so the two scatters never collide.
        ii = jnp.where(ok_p, si, Sm)
        jjj = jnp.where(ok_p, sj, Sm)
        out = gt.at[ii].set(row_i, mode="drop")
        out = out.at[jjj].set(row_j, mode="drop")
        return out, jnp.sum(ok_p.astype(jnp.int32))

    return jax.vmap(one_tile)(g)                             # (S, Sm, CF)


# ---------------------------------------------------------------------------
# Row-major Slabs wrappers around the ff cores (tests / standalone use; the
# pipeline converts once around the whole scatter phase).
# ---------------------------------------------------------------------------

def slab_fuse(sl: Slabs, batch_w, resp, cand_view_idx, cand_valid,
              view_slab_idx, scan_seq, cfg: GCConfig):
    sf, certs = ff_fuse(slabs_to_ff(sl), batch_w, resp, cand_view_idx,
                        cand_valid, view_slab_idx, scan_seq, cfg)
    return slabs_from_ff(sf, sl.fdata.shape[0]), certs


def slab_insert(sl: Slabs, batch_w, novelty, meas_keys, active_keys,
                scan_seq, cfg: GCConfig):
    sf, certs = ff_insert(slabs_to_ff(sl), batch_w, novelty, meas_keys,
                          active_keys, scan_seq, cfg)
    return slabs_from_ff(sf, sl.fdata.shape[0]), certs


def slab_cull(sl: Slabs, cfg: GCConfig):
    sf, certs = ff_cull(slabs_to_ff(sl), cfg)
    return slabs_from_ff(sf, sl.fdata.shape[0]), certs


def slab_forget(sl: Slabs, cfg: GCConfig) -> Slabs:
    return slabs_from_ff(ff_forget(slabs_to_ff(sl), cfg), sl.fdata.shape[0])


def slab_merge_reduce(sl: Slabs, cfg: GCConfig):
    sf, certs = ff_merge_reduce(slabs_to_ff(sl), sl.fdata.shape[0], cfg)
    return slabs_from_ff(sf, sl.fdata.shape[0]), certs


# ---------------------------------------------------------------------------
# Atlas-level wrappers (tests / one-off use; the pipeline uses the slab flow:
# gather_slabs -> slab_* ops -> scatter_slabs).
# ---------------------------------------------------------------------------

def recency_inflate(atlas, slots, scan_seq, cfg):
    sl, certs = slab_recency_inflate(gather_slabs(atlas, slots), scan_seq, cfg)
    return scatter_slabs(atlas, slots, sl), certs


def extract_view(atlas, slots, cfg) -> MapView:
    return slab_extract_view(gather_slabs(atlas, slots), cfg)


def fuse(atlas, batch_w, resp, cand_view_idx, cand_valid, view_slab_idx,
         scan_seq, cfg, slots=None):
    assert slots is not None, "fuse wrapper needs the active slots"
    sl, certs = slab_fuse(gather_slabs(atlas, slots), batch_w, resp,
                          cand_view_idx, cand_valid, view_slab_idx, scan_seq,
                          cfg)
    return scatter_slabs(atlas, slots, sl), certs


def insert(atlas, batch_w, novelty, meas_keys, active_keys, slots, scan_seq,
           cfg):
    sl, certs = slab_insert(gather_slabs(atlas, slots), batch_w, novelty,
                            meas_keys, active_keys, scan_seq, cfg)
    return scatter_slabs(atlas, slots, sl), certs


def cull(atlas, slots, cfg):
    sl, certs = slab_cull(gather_slabs(atlas, slots), cfg)
    return scatter_slabs(atlas, slots, sl), certs


def forget(atlas, slots, cfg):
    sl = slab_forget(gather_slabs(atlas, slots), cfg)
    return scatter_slabs(atlas, slots, sl)


def merge_reduce(atlas, slots, cfg):
    sl, certs = slab_merge_reduce(gather_slabs(atlas, slots), cfg)
    return scatter_slabs(atlas, slots, sl), certs


# ---------------------------------------------------------------------------
# Export helpers (host-side; not in the jitted path).
# ---------------------------------------------------------------------------

def decode_positions(atlas: AtlasMap, eps_lift: float = 1e-9):
    """World positions (P, M, 3) of all primitives (invalid rows undefined)."""
    return jnp.einsum("pmij,pmj->pmi", inv3x3(dense_Lambdas(atlas), eps_lift),
                      dense_thetas(atlas))


def total_count(atlas: AtlasMap):
    return jnp.sum(atlas.valid.astype(jnp.int32))
