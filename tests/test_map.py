"""Invariant tests for the atlas map, surfel extraction, OT association and
visual pose evidence (the map path of the 14-step pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.core import se3
from fl_slam_tpu.core.hexgrid import (
    stencil_offsets_3d, stencil_tile_keys, tile_keys_from_xyz,
    xyz_to_tile_axial,
)
from fl_slam_tpu.ops.association import associate, novelty_mass
from fl_slam_tpu.ops.surfels import extract_surfels
from fl_slam_tpu.ops.visual_evidence import visual_pose_evidence
from fl_slam_tpu.core.linalg import sym6_trace
from fl_slam_tpu.structures import atlas as atlas_mod
from fl_slam_tpu.structures import measurement_batch as mb

CFG = GCConfig.small()


def make_plane_points(rng, n=200, normal=(0.0, 0.0, 1.0), center=(0, 0, 0),
                      extent=0.3, noise=1e-3):
    normal = np.asarray(normal, dtype=np.float64)
    normal = normal / np.linalg.norm(normal)
    a = np.array([1.0, 0.0, 0.0])
    if abs(normal[0]) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    e1 = np.cross(normal, a)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(normal, e1)
    uv = rng.uniform(-extent, extent, size=(n, 2))
    pts = (np.asarray(center)[None, :] + uv[:, :1] * e1[None, :]
           + uv[:, 1:2] * e2[None, :]
           + rng.normal(0, noise, size=(n, 1)) * normal[None, :])
    return pts


def surfel_batch_from_points(points, cfg=CFG):
    w = jnp.ones((points.shape[0],), dtype=cfg.jdtype)
    surf, certs = extract_surfels(jnp.asarray(points).T, w, cfg)
    batch = mb.empty_batch(cfg)
    batch = mb.with_lidar_surfels(batch, cfg, Lambdas=surf["Lambdas"],
                                  thetas=surf["thetas"], etas=surf["etas"],
                                  weights=surf["weights"], valid=surf["valid"])
    return batch, surf, certs


class TestSurfels:
    def test_plane_fit_recovers_normal_and_centroid(self, rng):
        pts = make_plane_points(rng, n=400, normal=(0, 0, 1), center=(0.1, 0.05, 0.2))
        batch, surf, _ = surfel_batch_from_points(pts)
        valid = np.asarray(surf["valid"])
        assert valid.any()
        normals = np.asarray(surf["normals"])[valid]
        # Cells lie on one plane: normals ~ +z (boundary cells with few,
        # near-collinear points may be off; require the bulk to agree).
        frac_good = np.mean(np.abs(normals[:, 2]) > 0.99)
        assert frac_good > 0.9
        pos = np.asarray(surf["positions"])[valid]
        assert np.all(np.abs(pos[:, 2] - 0.2) < 0.05)

    def test_fixed_shapes_and_masked_invalids(self, rng):
        pts = make_plane_points(rng, n=50)
        surf, certs = extract_surfels(jnp.asarray(pts).T,
                                      jnp.ones((50,), dtype=CFG.jdtype), CFG)
        assert surf["Lambdas"].shape == (CFG.n_surfel, 3, 3)
        w = np.asarray(surf["weights"])
        v = np.asarray(surf["valid"])
        assert np.all(w[~v] == 0.0)

    def test_sentinel_points_excluded(self, rng):
        pts = make_plane_points(rng, n=100)
        pts_bad = np.concatenate([pts, np.full((20, 3), 1e6)], axis=0)
        w = jnp.ones((120,), dtype=CFG.jdtype)
        surf, certs = extract_surfels(jnp.asarray(pts_bad).T, w, CFG)
        assert np.isfinite(np.asarray(surf["positions"])[np.asarray(surf["valid"])]).all()
        # sentinel mass excluded
        assert float(certs["surfel.point_mass_in"]) <= 100.0 + 1e-6

    def test_theta_consistent_with_position(self, rng):
        pts = make_plane_points(rng, n=300)
        surf, _ = extract_surfels(jnp.asarray(pts).T,
                                  jnp.ones((300,), dtype=CFG.jdtype), CFG)
        v = np.asarray(surf["valid"])
        Lam = np.asarray(surf["Lambdas"])[v]
        th = np.asarray(surf["thetas"])[v]
        pos = np.asarray(surf["positions"])[v]
        mu = np.linalg.solve(Lam, th[..., None])[..., 0]
        assert np.allclose(mu, pos, atol=1e-6)


class TestAtlas:
    def _active(self, atlas, center=(0.0, 0.0, 0.0), seq=0):
        c = jnp.asarray(center, dtype=CFG.jdtype)
        q, r, z = xyz_to_tile_axial(c, CFG.h_tile)
        offs = stencil_offsets_3d(CFG.r_active_xy, CFG.r_active_z)
        keys = stencil_tile_keys(q, r, z, offs)
        return atlas_mod.activate_tiles(atlas, keys, seq) + (keys,)

    def test_activate_allocates_and_finds(self):
        atlas = atlas_mod.empty_atlas(CFG)
        atlas, slots, fresh, certs, keys = self._active(atlas)
        assert int(certs["atlas.tiles_allocated"]) == CFG.n_active_tiles
        assert len(np.unique(np.asarray(slots))) == CFG.n_active_tiles
        # Second activation finds the same slots.
        atlas2, slots2, _, certs2, _ = self._active(atlas, seq=1)
        np.testing.assert_array_equal(np.asarray(slots), np.asarray(slots2))
        assert int(certs2["atlas.tiles_allocated"]) == 0

    def test_insert_then_view_roundtrip(self, rng):
        atlas = atlas_mod.empty_atlas(CFG)
        atlas, slots, _, _, keys = self._active(atlas)
        pts = make_plane_points(rng, n=300, center=(0.2, 0.1, 0.0))
        batch, surf, _ = surfel_batch_from_points(pts)
        novelty = jnp.where(batch.valid, 1.0, 0.0).astype(CFG.jdtype)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        meas_keys = tile_keys_from_xyz(mu, CFG.h_tile)
        atlas, certs = atlas_mod.insert(atlas, batch, novelty, meas_keys,
                                        keys, slots, 0, CFG)
        n_valid_meas = int(jnp.sum(batch.valid))
        n_inserted = int(certs["map.inserted_count"])
        assert n_inserted > 0
        assert n_inserted <= min(n_valid_meas, CFG.k_insert * CFG.n_active_tiles)
        assert int(atlas_mod.total_count(atlas)) == n_inserted
        assert int(atlas.next_prim_id) == n_inserted

        view = atlas_mod.extract_view(atlas, slots, CFG)
        vv = np.asarray(view.valid)
        # The view budget is split between top-weight and most-recent halves;
        # rows may appear in both -> count unique primitives.
        uniq = np.unique(np.asarray(view.prim_ids)[vv])
        assert len(uniq) == n_inserted
        # View positions of valid rows match inserted measurement means.
        vp = np.asarray(view.positions)[vv]
        mu_np = np.asarray(mu)[np.asarray(batch.valid)]
        d = np.linalg.norm(vp[:, None, :] - mu_np[None, :, :], axis=-1).min(axis=1)
        assert np.all(d < 1e-5)

    def test_fuse_adds_information(self, rng):
        atlas = atlas_mod.empty_atlas(CFG)
        atlas, slots, _, _, keys = self._active(atlas)
        pts = make_plane_points(rng, n=300, center=(0.2, 0.1, 0.0))
        batch, _, _ = surfel_batch_from_points(pts)
        novelty = jnp.where(batch.valid, 1.0, 0.0).astype(CFG.jdtype)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        meas_keys = tile_keys_from_xyz(mu, CFG.h_tile)
        atlas, _ = atlas_mod.insert(atlas, batch, novelty, meas_keys, keys,
                                    slots, 0, CFG)
        w_before = float(jnp.sum(atlas.weights))
        tr_before = float(jnp.sum(sym6_trace(atlas.lam6, axis=0)))

        view = atlas_mod.extract_view(atlas, slots, CFG)
        mdir = mb.mean_directions(batch, CFG.eps_mass)
        mkap = mb.kappas(batch)
        assoc, _ = associate(mu, mdir, mkap, batch.valid, view, 1, CFG)
        atlas, fcerts = atlas_mod.fuse(atlas, batch, assoc.responsibilities,
                                       assoc.cand_view_idx, assoc.cand_valid,
                                       view.slab_idx, 1, CFG, slots=slots)
        assert float(jnp.sum(atlas.weights)) > w_before
        assert float(jnp.sum(sym6_trace(atlas.lam6, axis=0))) > tr_before
        assert float(fcerts["map.fused_mass"]) > 0.0
        # Supported primitives got stamped with the new scan seq.
        assert int(jnp.max(atlas.last_supported)) == 1

    def test_camera_fuse_geom_scale(self, rng):
        """camera_fuse_geom_scale=0: camera-source rows fuse weight/color/
        appearance mass but contribute NO Gaussian geometry (Lambda/theta);
        lidar rows are unaffected (GCConfig.camera_fuse_geom_scale)."""
        cfg0 = GCConfig.small(camera_fuse_geom_scale=0.0)

        def run(cfg):
            atlas = atlas_mod.empty_atlas(CFG)
            atlas, slots, _, _, keys = self._active(atlas)
            pts = make_plane_points(rng, n=300, center=(0.2, 0.1, 0.0))
            batch, _, _ = surfel_batch_from_points(pts)
            novelty = jnp.where(batch.valid, 1.0, 0.0).astype(CFG.jdtype)
            mu = mb.mean_positions(batch, CFG.eps_lift)
            meas_keys = tile_keys_from_xyz(mu, CFG.h_tile)
            atlas, _ = atlas_mod.insert(atlas, batch, novelty, meas_keys,
                                        keys, slots, 0, CFG)
            # Re-fuse the same batch relabeled as CAMERA-source rows.
            cam = batch._replace(
                sources=jnp.zeros_like(batch.sources))  # SOURCE_CAMERA
            view = atlas_mod.extract_view(atlas, slots, CFG)
            mdir = mb.mean_directions(cam, CFG.eps_mass)
            assoc, _ = associate(mu, mdir, mb.kappas(cam), cam.valid, view,
                                 1, CFG)
            atlas2, _ = atlas_mod.fuse(atlas, cam, assoc.responsibilities,
                                       assoc.cand_view_idx, assoc.cand_valid,
                                       view.slab_idx, 1, cfg, slots=slots)
            return atlas, atlas2

        rng_state = rng.bit_generator.state
        before, after = run(CFG)
        assert float(jnp.sum(sym6_trace(after.lam6, axis=0))) > \
            float(jnp.sum(sym6_trace(before.lam6, axis=0)))
        rng.bit_generator.state = rng_state   # identical points both runs
        before0, after0 = run(cfg0)
        np.testing.assert_allclose(np.asarray(after0.lam6),
                                   np.asarray(before0.lam6), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(after0.theta),
                                   np.asarray(before0.theta), rtol=0, atol=0)
        assert float(jnp.sum(after0.weights)) > float(jnp.sum(before0.weights))

    def test_forget_cull_recency(self, rng):
        atlas = atlas_mod.empty_atlas(CFG)
        atlas, slots, _, _, keys = self._active(atlas)
        pts = make_plane_points(rng, n=300)
        batch, _, _ = surfel_batch_from_points(pts)
        novelty = jnp.where(batch.valid, 1.0, 0.0).astype(CFG.jdtype)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        meas_keys = tile_keys_from_xyz(mu, CFG.h_tile)
        atlas, _ = atlas_mod.insert(atlas, batch, novelty, meas_keys, keys,
                                    slots, 0, CFG)
        w0 = float(jnp.sum(atlas.weights))
        atlas = atlas_mod.forget(atlas, slots, CFG)
        assert float(jnp.sum(atlas.weights)) == pytest.approx(
            w0 * CFG.forgetting_factor, rel=1e-6)

        # Recency inflate at a much later scan downscales precision.
        tr0 = float(jnp.sum(sym6_trace(atlas.lam6, axis=0)))
        atlas, rcerts = atlas_mod.recency_inflate(atlas, slots, 200, CFG)
        tr1 = float(jnp.sum(sym6_trace(atlas.lam6, axis=0)))
        assert tr1 < tr0
        assert float(rcerts["map.staleness_strength"]) > 0.0

        # Cull with a huge threshold removes everything.
        big = CFG.replace(cull_weight_threshold=1e9)
        atlas, ccerts = atlas_mod.cull(atlas, slots, big)
        assert int(atlas_mod.total_count(atlas)) == 0
        assert float(ccerts["map.culled_mass"]) > 0.0

    def test_merge_reduce_merges_duplicates(self, rng):
        atlas = atlas_mod.empty_atlas(CFG)
        atlas, slots, _, _, keys = self._active(atlas)
        # Two nearly identical primitives in the center tile.
        batch = mb.empty_batch(CFG)
        Lam = jnp.stack([jnp.eye(3, dtype=CFG.jdtype) * 100.0] * 2)
        pos = jnp.asarray([[0.1, 0.0, 0.0], [0.1001, 0.0, 0.0]], dtype=CFG.jdtype)
        th = jnp.einsum("nij,nj->ni", Lam, pos)
        etas = jnp.zeros((2, CFG.vmf_n_lobes, 3), dtype=CFG.jdtype)
        etas = etas.at[:, 0, 2].set(5.0)
        pad = CFG.n_surfel - 2
        batch = mb.with_lidar_surfels(
            batch, CFG,
            Lambdas=jnp.concatenate([Lam, jnp.zeros((pad, 3, 3), CFG.jdtype)]),
            thetas=jnp.concatenate([th, jnp.zeros((pad, 3), CFG.jdtype)]),
            etas=jnp.concatenate([etas, jnp.zeros((pad, CFG.vmf_n_lobes, 3), CFG.jdtype)]),
            weights=jnp.concatenate([jnp.ones((2,), CFG.jdtype),
                                     jnp.zeros((pad,), CFG.jdtype)]),
            valid=jnp.concatenate([jnp.ones((2,), bool), jnp.zeros((pad,), bool)]))
        novelty = jnp.where(batch.valid, 1.0, 0.0).astype(CFG.jdtype)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        meas_keys = tile_keys_from_xyz(mu, CFG.h_tile)
        atlas, _ = atlas_mod.insert(atlas, batch, novelty, meas_keys, keys,
                                    slots, 0, CFG)
        assert int(atlas_mod.total_count(atlas)) == 2
        w_total = float(jnp.sum(atlas.weights))
        atlas, mcerts = atlas_mod.merge_reduce(atlas, slots, CFG)
        assert int(mcerts["map.merged_pairs"]) == 1
        assert int(atlas_mod.total_count(atlas)) == 1
        # Mass conserved by moment-matched merge.
        assert float(jnp.sum(atlas.weights)) == pytest.approx(w_total, rel=1e-6)

    def test_eviction_when_pool_full(self):
        cfg = CFG.replace(n_tiles_pool=8)  # 7 active + 1 spare
        atlas = atlas_mod.empty_atlas(cfg)
        c = jnp.zeros((3,), dtype=cfg.jdtype)
        q, r, z = xyz_to_tile_axial(c, cfg.h_tile)
        offs = stencil_offsets_3d(cfg.r_active_xy, cfg.r_active_z)
        keys0 = stencil_tile_keys(q, r, z, offs)
        atlas, slots0, _, _ = atlas_mod.activate_tiles(atlas, keys0, 0)
        # Move far away: all-new keys force eviction of the oldest tiles.
        c2 = jnp.asarray([100.0, 100.0, 0.0], dtype=cfg.jdtype)
        q2, r2, z2 = xyz_to_tile_axial(c2, cfg.h_tile)
        keys1 = stencil_tile_keys(q2, r2, z2, offs)
        atlas, slots1, _, certs = atlas_mod.activate_tiles(atlas, keys1, 5)
        assert int(certs["atlas.tiles_allocated"]) == cfg.n_active_tiles
        assert int(certs["atlas.tiles_evicted"]) >= cfg.n_active_tiles - 1
        assert len(np.unique(np.asarray(slots1))) == cfg.n_active_tiles


class TestAssociation:
    def _map_with_points(self, rng, center=(0.2, 0.1, 0.0)):
        atlas = atlas_mod.empty_atlas(CFG)
        c = jnp.asarray(center, dtype=CFG.jdtype)
        q, r, z = xyz_to_tile_axial(c, CFG.h_tile)
        offs = stencil_offsets_3d(CFG.r_active_xy, CFG.r_active_z)
        keys = stencil_tile_keys(q, r, z, offs)
        atlas, slots, _, _ = atlas_mod.activate_tiles(atlas, keys, 0)
        pts = make_plane_points(rng, n=300, center=center)
        batch, _, _ = surfel_batch_from_points(pts)
        novelty = jnp.where(batch.valid, 1.0, 0.0).astype(CFG.jdtype)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        meas_keys = tile_keys_from_xyz(mu, CFG.h_tile)
        atlas, _ = atlas_mod.insert(atlas, batch, novelty, meas_keys, keys,
                                    slots, 0, CFG)
        return atlas, slots, keys, batch, pts

    def test_self_association_prefers_self(self, rng):
        atlas, slots, keys, batch, pts = self._map_with_points(rng)
        view = atlas_mod.extract_view(atlas, slots, CFG)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        mdir = mb.mean_directions(batch, CFG.eps_mass)
        mkap = mb.kappas(batch)
        assoc, certs = associate(mu, mdir, mkap, batch.valid, view, 1, CFG)
        v = np.asarray(batch.valid)
        pi = np.asarray(assoc.responsibilities)
        # Valid rows transport positive mass, best candidate is the nearest one.
        assert np.all(pi[v].sum(axis=1) > 0)
        best = np.asarray(assoc.cand_view_idx)[v, np.argmax(pi[v], axis=1)]
        best_pos = np.asarray(view.positions)[best]
        mu_np = np.asarray(mu)[v]
        assert np.all(np.linalg.norm(best_pos - mu_np, axis=1) < 0.2)
        # Invalid rows transport nothing.
        assert np.all(pi[~v].sum(axis=1) == 0)
        # Novelty for well-explained measurements is much lower than the
        # uniform row budget.
        nov = np.asarray(novelty_mass(assoc, batch.valid, CFG.eps_mass))
        assert nov[v].mean() < 1.0 / max(v.sum(), 1)

    def test_empty_map_yields_full_novelty(self, rng):
        atlas = atlas_mod.empty_atlas(CFG)
        c = jnp.zeros((3,), dtype=CFG.jdtype)
        q, r, z = xyz_to_tile_axial(c, CFG.h_tile)
        offs = stencil_offsets_3d(CFG.r_active_xy, CFG.r_active_z)
        keys = stencil_tile_keys(q, r, z, offs)
        atlas, slots, _, _ = atlas_mod.activate_tiles(atlas, keys, 0)
        view = atlas_mod.extract_view(atlas, slots, CFG)
        pts = make_plane_points(rng, n=200)
        batch, _, _ = surfel_batch_from_points(pts)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        assoc, _ = associate(mu, mb.mean_directions(batch, CFG.eps_mass),
                             mb.kappas(batch), batch.valid, view, 0, CFG)
        assert float(jnp.sum(assoc.responsibilities)) == 0.0
        nov = novelty_mass(assoc, batch.valid, CFG.eps_mass)
        a = np.asarray(batch.valid, dtype=float)
        a = a / a.sum()
        np.testing.assert_allclose(np.asarray(nov), a, atol=1e-12)

    def _three_plane_map(self, rng):
        """Map with three plane orientations: translation fully observable."""
        atlas = atlas_mod.empty_atlas(CFG)
        c = jnp.zeros((3,), dtype=CFG.jdtype)
        q, r, z = xyz_to_tile_axial(c, CFG.h_tile)
        offs = stencil_offsets_3d(CFG.r_active_xy, CFG.r_active_z)
        keys = stencil_tile_keys(q, r, z, offs)
        atlas, slots, _, _ = atlas_mod.activate_tiles(atlas, keys, 0)
        # Planes must span several surfel cells (0.5 m) so the map has enough
        # primitives that k_assoc candidates are mostly same-surface, and must
        # NOT pass through the sensor origin (a sensor inside an observed
        # plane makes the facing-sign of that plane's normal unobservable).
        p1 = make_plane_points(rng, n=400, normal=(0, 0, 1),
                               center=(0.3, 0, -0.5), extent=1.2)
        p2 = make_plane_points(rng, n=400, normal=(0, 1, 0.2),
                               center=(0, 1.3, 0.6), extent=1.2)
        p3 = make_plane_points(rng, n=400, normal=(1, 0, 0.3),
                               center=(-1.3, 0.1, 0.7), extent=1.2)
        pts = np.concatenate([p1, p2, p3])
        batch, _, _ = surfel_batch_from_points(pts)
        novelty = jnp.where(batch.valid, 1.0, 0.0).astype(CFG.jdtype)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        meas_keys = tile_keys_from_xyz(mu, CFG.h_tile)
        atlas, _ = atlas_mod.insert(atlas, batch, novelty, meas_keys, keys,
                                    slots, 0, CFG)
        return atlas, slots, batch

    def test_visual_evidence_pulls_toward_map(self, rng):
        """Offset the scan; evidence mean increment should point back."""
        atlas, slots, batch = self._three_plane_map(rng)
        view = atlas_mod.extract_view(atlas, slots, CFG)

        offset = jnp.asarray([0.05, -0.03, 0.02], dtype=CFG.jdtype)
        z_lin = jnp.zeros((6,), dtype=CFG.jdtype)
        mu = mb.mean_positions(batch, CFG.eps_lift) + offset
        mdir = mb.mean_directions(batch, CFG.eps_mass)
        mkap = mb.kappas(batch)
        assoc, _ = associate(mu, mdir, mkap, batch.valid, view, 1, CFG)
        Lam_w = batch.Lambdas
        L, h, certs = visual_pose_evidence(mu, Lam_w, mdir, mkap, batch.valid,
                                           assoc, view, z_lin, CFG)
        # Solve the pose increment suggested by evidence alone.
        dz = np.linalg.solve(np.asarray(L) + 1e-9 * np.eye(22), np.asarray(h))
        # Translation increment points against the offset with meaningful
        # magnitude (soft association discounts it; full recovery would need
        # iteration, which the per-scan filter provides across scans).
        off = np.asarray(offset)
        cos = float(dz[:3] @ (-off) / (np.linalg.norm(dz[:3])
                                       * np.linalg.norm(off) + 1e-12))
        assert cos > 0.6, (dz[:3], -off)
        assert np.linalg.norm(dz[:3]) > 0.3 * np.linalg.norm(off)
        # A pure translation offset induces some apparent rotation through
        # soft cross-plane association; it must stay small (and in the full
        # pipeline it is outvoted by gyro/gravity/odom rotation evidence at
        # ~100x this precision).
        assert np.linalg.norm(dz[3:6]) < 0.15

    def test_visual_evidence_rotation(self, rng):
        atlas, slots, batch = self._three_plane_map(rng)
        view = atlas_mod.extract_view(atlas, slots, CFG)
        mu = mb.mean_positions(batch, CFG.eps_lift)

        # Rotate the scan by a small yaw; directions and positions rotate.
        rv = jnp.asarray([0.0, 0.0, 0.04], dtype=CFG.jdtype)
        R = se3.so3_exp(rv)
        mu_rot = mu @ R.T
        mdir = mb.mean_directions(batch, CFG.eps_mass) @ R.T
        mkap = mb.kappas(batch)
        z_lin = jnp.zeros((6,), dtype=CFG.jdtype)
        assoc, _ = associate(mu_rot, mdir, mkap, batch.valid, view, 1, CFG)
        Lam_w = jnp.einsum("ij,njk,lk->nil", R, batch.Lambdas, R)
        L, h, _ = visual_pose_evidence(mu_rot, Lam_w, mdir, mkap, batch.valid,
                                       assoc, view, z_lin, CFG)
        dz = np.linalg.solve(np.asarray(L) + 1e-9 * np.eye(22), np.asarray(h))
        # Rotation increment should cancel the applied yaw.
        np.testing.assert_allclose(dz[5], -0.04, atol=0.015)

    def test_association_jits_with_fixed_shapes(self, rng):
        atlas, slots, keys, batch, _ = self._map_with_points(rng)
        view = atlas_mod.extract_view(atlas, slots, CFG)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        mdir = mb.mean_directions(batch, CFG.eps_mass)
        mkap = mb.kappas(batch)

        @jax.jit
        def run(mu, mdir, mkap, valid, view):
            assoc, _ = associate(mu, mdir, mkap, valid, view, 1, CFG)
            return assoc.responsibilities

        pi1 = run(mu, mdir, mkap, batch.valid, view)
        assoc2, _ = associate(mu, mdir, mkap, batch.valid, view, 1, CFG)
        np.testing.assert_allclose(np.asarray(pi1),
                                   np.asarray(assoc2.responsibilities),
                                   rtol=1e-6, atol=1e-9)


class TestSinkhornKernel:
    """ops/assoc_kernels.sinkhorn_piT (interpret mode, CPU-runnable) must
    reproduce the pure-JAX log-domain Sinkhorn in ops/association.py."""

    def test_kernel_matches_xla_path(self):
        import math
        from fl_slam_tpu.ops import assoc_kernels

        rng = np.random.default_rng(7)
        N, K, n_iter = 96, 4, 17
        eps, tau_a, tau_b = 0.1, 0.5, 0.5
        C = jnp.asarray(rng.uniform(0.0, 5.0, size=(N, K)), jnp.float32)
        a = rng.uniform(0.0, 2.0, size=N).astype(np.float32)
        a[rng.permutation(N)[:10]] = 0.0                 # invalid rows
        a = jnp.asarray(a / a.sum())
        log_a = jnp.where(a > 0, jnp.log(jnp.maximum(a, 1e-300)), -jnp.inf)
        ua = tau_a / (tau_a + eps)
        vb = tau_b / (tau_b + eps)
        logKT = (-C / eps).T

        # XLA reference path (association.py fallback, inlined).
        def one_iter(fg, _):
            log_u, log_v = fg
            lse_v = jax.nn.logsumexp(logKT + log_v[:, None], axis=0)
            log_u = ua * (log_a - jnp.maximum(lse_v, -1e30))
            log_u = jnp.where(jnp.isfinite(log_a), log_u, -jnp.inf)
            lse_u = jax.nn.logsumexp(logKT + log_u[None, :], axis=1)
            log_v = vb * (-math.log(K) - jnp.maximum(lse_u, -1e30))
            return (log_u, log_v), None

        (log_u, log_v), _ = jax.lax.scan(
            one_iter, (jnp.zeros((N,), jnp.float32),
                       jnp.zeros((K,), jnp.float32)), None, length=n_iter)
        log_pi = log_u[:, None] + logKT.T + log_v[None, :]
        pi_ref = np.asarray(
            jnp.where(jnp.isfinite(log_pi), jnp.exp(log_pi), 0.0))

        piT = assoc_kernels.sinkhorn_piT(
            logKT, log_a, n_iter=n_iter, ua=float(ua), vb=float(vb),
            log_b=-math.log(K), interpret=True)
        np.testing.assert_allclose(np.asarray(piT).T, pi_ref,
                                   rtol=2e-5, atol=1e-9)
        assert np.asarray(piT).T[np.asarray(a) == 0].max() == 0.0


class TestFusedSelection:
    def test_bf16_fused_matmul_matches_exact_candidates(self, rng):
        """The select_bf16 path folds position cross-term, cosine direction
        proxy and the dir_ok gate into ONE (N, 8) @ (8, V) matmul; up to the
        cosine-vs-Bhattacharyya proxy and bf16 rounding it must select the
        same candidate sets as the exact path on well-separated data."""
        cfg = CFG
        atlas = atlas_mod.empty_atlas(cfg)
        c = jnp.zeros((3,), dtype=cfg.jdtype)
        q, r, z = xyz_to_tile_axial(c, cfg.h_tile)
        offs = stencil_offsets_3d(cfg.r_active_xy, cfg.r_active_z)
        keys = stencil_tile_keys(q, r, z, offs)
        atlas, slots, _, _ = atlas_mod.activate_tiles(atlas, keys, 0)
        pts = make_plane_points(rng, n=300)
        batch, _, _ = surfel_batch_from_points(pts)
        novelty = jnp.where(batch.valid, 1.0, 0.0).astype(cfg.jdtype)
        mu = mb.mean_positions(batch, cfg.eps_lift)
        meas_keys = tile_keys_from_xyz(mu, cfg.h_tile)
        atlas, _ = atlas_mod.insert(atlas, batch, novelty, meas_keys, keys,
                                    slots, 0, cfg)
        view = atlas_mod.extract_view(atlas, slots, cfg)
        mdir = mb.mean_directions(batch, cfg.eps_mass)
        mkap = mb.kappas(batch)
        a_ex, _ = associate(mu, mdir, mkap, batch.valid, view, 3, cfg)
        a_bf, _ = associate(mu, mdir, mkap, batch.valid, view, 3,
                            cfg.replace(select_bf16=True))
        v = np.asarray(batch.valid)
        # Top-1 candidate must agree on every valid row (positions dominate
        # the cost on this data; bf16 noise only reorders near-ties).
        b_ex = np.asarray(a_ex.cand_view_idx)[v, 0]
        b_bf = np.asarray(a_bf.cand_view_idx)[v, 0]
        assert (b_ex == b_bf).mean() > 0.95
        # Exact re-score: transported mass of the shared top candidate agrees.
        r_ex = np.asarray(a_ex.responsibilities)[v, 0]
        r_bf = np.asarray(a_bf.responsibilities)[v, 0]
        same = b_ex == b_bf
        np.testing.assert_allclose(r_ex[same], r_bf[same], rtol=0.2, atol=5e-3)


def test_moment_kernel_interpret_matches_segment_sum():
    """surfel_kernels.moment_segment_sum (interpret mode, CPU-runnable) must
    reproduce jax.ops.segment_sum on cell-local-scaled payloads to bf16x2
    accuracy (~1.5e-5 relative)."""
    import jax
    from fl_slam_tpu.ops import surfel_kernels as sk

    rng = np.random.default_rng(0)
    F, N, C = 11, 1024, 256
    payload = jnp.asarray(rng.normal(size=(F, N)).astype(np.float32)) * 0.2
    cell = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    got = sk.moment_segment_sum(payload, cell, C, interpret=True)
    want = jax.ops.segment_sum(np.asarray(payload).T, cell,
                               num_segments=C).T
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() < 5e-5 * scale, err.max() / scale


def test_fuse_moment_kernel_interpret_matches_scatter():
    """compact_fuse via the factored one-hot MXU contraction
    (cfg.fuse_moment_kernel, interpret mode) == the XLA scatter-add path
    through a real scan (CPU twin of the device A/B; bf16x2 split is
    ~1e-5-relative on the fused deltas)."""
    import jax
    import fl_slam_tpu.ops.surfel_kernels as sk
    from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
    from fl_slam_tpu.pipeline import init_state, replay

    # kernel-eligible shapes: V = 7 * 128 = 896, NK = (0 + 128) * 8 = 1024
    base = dict(dtype="float32", n_feat=0, n_surfel=128, m_tile=256,
                m_tile_view=128, n_tiles_pool=16, k_insert=8)
    outs = {}
    try:
        sk.FORCE_INTERPRET = True
        for mode in (False, True):
            cfg = GCConfig.small(**base, fuse_moment_kernel=mode,
                                 surfel_moment_kernel=False)
            V = cfg.n_active_tiles * cfg.m_tile_view
            NK = cfg.n_meas * cfg.k_assoc
            assert V % 128 == 0 and NK % 128 == 0, (V, NK)
            ds = simulate(cfg, n_scans=4, seed=6)
            scans = to_scan_inputs(ds, cfg)
            st = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
            jax.clear_caches()
            _, o = replay(st, scans, cfg)
            outs[mode] = np.asarray(o.pose)
    finally:
        sk.FORCE_INTERPRET = False
    d = np.abs(outs[True] - outs[False]).max()
    assert np.isfinite(outs[True]).all()
    assert d < 1e-3, d
