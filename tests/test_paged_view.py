"""Paged view membership (GCConfig.view_page > 0): selection, page-aligned
gather/write-back, page-clustered insert, and the paged e2e replay.

The paged mode replaces per-slot view selection + ~V strided column
gathers/scatters with page-granular selection + contiguous page slices
(structures/atlas.py ff_select_view_pages / ff_gather_pages /
ff_write_view_pages; the round-2 top TPU sink). These tests pin the
semantics the redesign must keep: gather equals direct indexing, duplicate
pages are dropped on write-back, inserts land clustered in non-resident
pages and become view-visible at the next refresh, and the paged production
path still beats odometry end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.structures import atlas as A


CFG = GCConfig.small(dtype="float32", view_page=64)
S = CFG.n_active_tiles
M = CFG.m_tile
P = CFG.view_page
NPG = M // P
CF = A._cf_padded(CFG.vmf_n_lobes)
O = A._O_SCAL


def _random_slabs(rng, fill_frac=0.6):
    ff = jnp.asarray(rng.normal(size=(CF, S * M)).astype(np.float32))
    valid = rng.random(S * M) < fill_frac
    w = np.where(valid, rng.random(S * M).astype(np.float32) + 0.01, 0.0)
    cs = np.where(valid, rng.integers(0, 50, S * M), -1).astype(np.float32)
    ls = cs.copy()
    ff = ff.at[O + A._ROW_V].set(jnp.asarray(valid, jnp.float32))
    ff = ff.at[O + A._ROW_W].set(jnp.asarray(w))
    ff = ff.at[O + A._ROW_CS].set(jnp.asarray(cs))
    ff = ff.at[O + A._ROW_LS].set(jnp.asarray(ls))
    pid = jnp.arange(S * M, dtype=jnp.int32)
    return A.SlabsFF(ff=ff, prim_ids=pid,
                     next_prim_id=jnp.int32(S * M))


class TestPagedSelectGather:
    def test_gather_matches_direct_indexing(self):
        sf = _random_slabs(np.random.default_rng(0))
        pages, dup = A.ff_select_view_pages(sf, S, CFG)
        rows, slab_cols, dup_f, pids, put_pages = A.ff_gather_pages(
            sf, pages, dup, S, CFG)
        np.testing.assert_array_equal(
            np.asarray(rows), np.asarray(sf.ff[:, slab_cols].T))
        np.testing.assert_array_equal(
            np.asarray(pids), np.asarray(sf.prim_ids[slab_cols]))
        # page-aligned, contiguous runs of P
        c = np.asarray(slab_cols).reshape(-1, P)
        assert (c[:, 0] % P == 0).all()
        np.testing.assert_array_equal(c, c[:, :1] + np.arange(P))

    def test_weight_half_picks_heaviest_pages(self):
        sf = _random_slabs(np.random.default_rng(1))
        pages, dup = A.ff_select_view_pages(sf, S, CFG)
        vp = CFG.m_tile_view // P
        kwp = vp - vp // 2
        w = np.asarray(jnp.where(sf.ff[O + A._ROW_V] > 0.5,
                                 sf.ff[O + A._ROW_W], 0.0))
        sums = w.reshape(S, NPG, P).sum(-1)
        for s in range(S):
            top = set(np.argsort(-sums[s])[:kwp])
            assert set(np.asarray(pages)[s, :kwp]) == top

    def test_duplicate_pages_flagged_and_dropped(self):
        # Force recency == weight ranking (page-constant scores on a full
        # tile, so sum-rank == max-rank): every recency page duplicates.
        sf = _random_slabs(np.random.default_rng(2), fill_frac=1.0)
        pv = np.random.default_rng(22).permutation(S * NPG).astype(np.float32)
        w = jnp.asarray(np.repeat(pv, P))
        sf = sf._replace(ff=sf.ff.at[O + A._ROW_W].set(w)
                         .at[O + A._ROW_CS].set(w))
        pages, dup = A.ff_select_view_pages(sf, S, CFG)
        vp = CFG.m_tile_view // P
        kwp, krp = vp - vp // 2, vp // 2
        d = np.asarray(dup)
        assert not d[:, :kwp].any()
        if krp:
            assert d[:, kwp:].all()   # every recency page is a weight page
        rows, slab_cols, dup_f, pids, put_pages = A.ff_gather_pages(
            sf, pages, dup, S, CFG)
        marked = rows.at[:, 0].set(12345.0)
        sf2 = A.ff_write_view_pages(sf, put_pages, marked, S, CFG)
        got = np.asarray(sf2.ff[0])
        # non-dup pages written, dup pages wrote nothing anywhere
        nondup_cols = np.asarray(slab_cols)[~np.asarray(dup_f)]
        assert (got[nondup_cols] == 12345.0).all()
        assert (got == 12345.0).sum() == len(set(nondup_cols.tolist()))

    def test_roundtrip_write_preserves_untouched_columns(self):
        sf = _random_slabs(np.random.default_rng(3))
        pages, dup = A.ff_select_view_pages(sf, S, CFG)
        rows, slab_cols, dup_f, pids, put_pages = A.ff_gather_pages(
            sf, pages, dup, S, CFG)
        sf2 = A.ff_write_view_pages(sf, put_pages, rows, S, CFG)
        np.testing.assert_array_equal(np.asarray(sf2.ff), np.asarray(sf.ff))


class TestPagedInsert:
    def _insert(self, sf, resident_pages, seq=60, n=None):
        from fl_slam_tpu.structures.measurement_batch import MeasurementBatch
        n = n or CFG.k_insert
        rng = np.random.default_rng(7)
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        lam = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
        batch = MeasurementBatch(
            Lambdas=jnp.asarray(lam),
            thetas=jnp.asarray(pos),
            etas=jnp.asarray(np.zeros((n, CFG.vmf_n_lobes, 3), np.float32)),
            weights=jnp.ones((n,), jnp.float32),
            valid=jnp.ones((n,), bool),
            sources=jnp.zeros((n,), jnp.float32),
            colors=jnp.full((n, 3), 0.5, jnp.float32))
        keys = jnp.zeros((n,), jnp.int64)  # all in tile 0
        active = jnp.concatenate([jnp.zeros((1,), jnp.int64),
                                  jnp.arange(1, S, dtype=jnp.int64) + 100])
        nov = jnp.ones((n,), jnp.float32)
        return A.ff_insert(sf, batch, nov, keys, active, seq, CFG,
                           resident_pages=resident_pages)

    def test_inserts_land_in_one_nonresident_page(self):
        sf = _random_slabs(np.random.default_rng(4), fill_frac=0.3)
        pages, dup = A.ff_select_view_pages(sf, S, CFG)
        put_pages = jnp.where(dup.reshape(-1), jnp.int32(S * NPG),
                              (jnp.arange(S, dtype=jnp.int32)[:, None] * NPG
                               + pages).reshape(-1))
        before = np.asarray(sf.ff[O + A._ROW_CS])
        sf2, certs = self._insert(sf, put_pages)
        after = np.asarray(sf2.ff[O + A._ROW_CS])
        changed = np.nonzero(after != before)[0]
        assert len(changed) > 0
        touched_pages = set((changed // P).tolist())
        assert len(touched_pages) == 1           # clustered into one page
        resident = set(np.asarray(put_pages).tolist())
        assert touched_pages.isdisjoint(resident)

    def test_full_pages_are_packed_before_opening_new_ones(self):
        # Empty tile 0: first insert opens a page half-full (K=16 < P=64);
        # the second insert must CONTINUE that page, not open a new one.
        sf = _random_slabs(np.random.default_rng(5), fill_frac=0.0)
        resident = jnp.full((S * (CFG.m_tile_view // P),), S * NPG,
                            jnp.int32)  # nothing resident
        sf1, _ = self._insert(sf, resident, seq=10)
        sf2, _ = self._insert(sf1, resident, seq=11)
        valid = np.asarray(sf2.ff[O + A._ROW_V])[:M].reshape(NPG, P)
        pages_used = np.nonzero(valid.any(axis=1))[0]
        assert len(pages_used) == 1              # both scans share one page
        assert valid[pages_used[0]].sum() == 2 * CFG.k_insert

    def test_inserts_become_view_visible_via_recency(self):
        sf = _random_slabs(np.random.default_rng(6), fill_frac=0.3)
        pages, dup = A.ff_select_view_pages(sf, S, CFG)
        put_pages = jnp.where(dup.reshape(-1), jnp.int32(S * NPG),
                              (jnp.arange(S, dtype=jnp.int32)[:, None] * NPG
                               + pages).reshape(-1))
        sf2, _ = self._insert(sf, put_pages, seq=99)
        pages2, dup2 = A.ff_select_view_pages(sf2, S, CFG)
        cs = np.asarray(sf2.ff[O + A._ROW_CS])
        ins_page = int(np.nonzero(cs == 99.0)[0][0] // P)
        assert ins_page // NPG == 0              # insert went to tile 0
        sel = set(np.asarray(pages2)[0].tolist())
        assert (ins_page % NPG) in sel           # tile 0's selection has it


@pytest.mark.slow
def test_paged_e2e_beats_odom():
    from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
    from fl_slam_tpu.pipeline import init_state, replay
    from fl_slam_tpu.eval.metrics import ate
    cfg = GCConfig.small(dtype="float32", view_page=64, view_refresh_every=4)
    ds = simulate(cfg, n_scans=40, seed=3, odom_drift_vel_scale=1.03,
                  odom_drift_yaw_rate=0.01)
    scans = to_scan_inputs(ds, cfg)
    state = init_state(cfg, anchor0=jnp.asarray(ds.gt_poses[0], cfg.jdtype),
                       t0=float(ds.gt_stamps[0]) - 0.1)
    fs, outs = replay(state, scans, cfg)
    m = ate(np.asarray(outs.pose), ds.gt_poses, align="initial")
    mo = ate(np.asarray(ds.scans["odom_pose"]), ds.gt_poses, align="initial")
    assert np.isfinite(np.asarray(outs.pose)).all()
    assert m["trans"]["rmse"] < mo["trans"]["rmse"]
    assert m["rot_deg"]["rmse"] < mo["rot_deg"]["rmse"]


class TestPageStats:
    """Chunk-seeded insert-targeting aggregates: ff_insert fed with
    freshly-computed ff_page_stats must pick the same pages/slots as the
    stats-free path, and the incrementally maintained stats must match a
    recount after the insert (same scan seq)."""

    def test_stats_fed_insert_matches_statless(self):
        rng = np.random.default_rng(9)
        sf = _random_slabs(rng, fill_frac=0.5)
        pages, dup = A.ff_select_view_pages(sf, S, CFG)
        put_pages = jnp.where(dup.reshape(-1), jnp.int32(S * NPG),
                              (jnp.arange(S, dtype=jnp.int32)[:, None] * NPG
                               + pages).reshape(-1))
        n, seq = 48, 60
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        lam = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
        from fl_slam_tpu.structures.measurement_batch import MeasurementBatch
        batch = MeasurementBatch(
            Lambdas=jnp.asarray(lam), thetas=jnp.asarray(pos),
            etas=jnp.zeros((n, CFG.vmf_n_lobes, 3), jnp.float32),
            weights=jnp.asarray(rng.random(n).astype(np.float32) + 0.1),
            valid=jnp.ones((n,), bool),
            sources=jnp.zeros((n,), jnp.float32),
            colors=jnp.full((n, 3), 0.5, jnp.float32))
        keys = jnp.zeros((n,), jnp.int64)
        active = jnp.concatenate([jnp.zeros((1,), jnp.int64),
                                  jnp.arange(1, S, dtype=jnp.int64) + 100])
        nov = jnp.ones((n,), jnp.float32)

        sf_a, certs_a = A.ff_insert(sf, batch, nov, keys, active, seq, CFG,
                                    resident_pages=put_pages)
        stats0 = A.ff_page_stats(sf, S, CFG, seq)
        sf_b, certs_b, stats1 = A.ff_insert(sf, batch, nov, keys, active,
                                            seq, CFG,
                                            resident_pages=put_pages,
                                            page_stats=stats0)
        np.testing.assert_array_equal(np.asarray(sf_a.ff),
                                      np.asarray(sf_b.ff))
        np.testing.assert_array_equal(np.asarray(sf_a.prim_ids),
                                      np.asarray(sf_b.prim_ids))
        # Incremental stats == recount on the post-insert slab at this seq.
        inv2, ret2 = A.ff_page_stats(sf_b, S, CFG, seq)
        np.testing.assert_allclose(np.asarray(stats1[0]), np.asarray(inv2),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(stats1[1]), np.asarray(ret2),
                                   rtol=1e-5, atol=1e-5)
