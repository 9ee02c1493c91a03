"""Render/output layer tests: splat rasterizer, BEV pushforward, exports."""

import os

import jax.numpy as jnp
import numpy as np

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.render.bev import (bev15_projections, bev_projection_matrix,
                                    pushforward_gaussians, pushforward_vmf)
from fl_slam_tpu.render.splat import Camera, render, vmf_shade

CFG = GCConfig.small()


def _simple_scene(dtype):
    # one red blob left of center, one blue right, blue farther away
    pos = jnp.asarray([[-0.5, 0.0, 3.0], [0.7, 0.0, 6.0]], dtype)
    Lam = jnp.stack([jnp.eye(3, dtype=dtype) * 60.0] * 2)
    etas = jnp.zeros((2, 3, 3), dtype)
    etas = etas.at[:, 0, 2].set(-8.0)        # lobes face the camera (-z)
    col = jnp.asarray([[1.0, 0.1, 0.1], [0.1, 0.1, 1.0]], dtype)
    w = jnp.asarray([3.0, 3.0], dtype)
    val = jnp.asarray([True, True])
    return pos, Lam, etas, col, w, val


def _camera(dtype):
    return Camera(pose_wc=jnp.zeros(6, dtype), fx=120.0, fy=120.0,
                  cx=64.0, cy=48.0, width=128, height=96)


class TestSplatRender:
    def test_renders_colors_at_projected_positions(self):
        d = CFG.jdtype
        pos, Lam, etas, col, w, val = _simple_scene(d)
        cam = _camera(d)
        img, depth = render(pos, Lam, etas, col, w, val, cam)
        img = np.asarray(img)
        assert img.shape == (96, 128, 3)
        assert np.isfinite(img).all()
        # red blob projects to u = 120*(-0.5)/3 + 64 = 44, v = 48
        red = img[48, 44]
        assert red[0] > red[2] + 0.2, red
        # blue blob: u = 120*0.7/6 + 64 = 78
        blue = img[48, 78]
        assert blue[2] > blue[0] + 0.2, blue
        # background stays near white
        assert img[5, 5].min() > 0.9
        # depth at the red blob ~ 3 m
        assert abs(float(np.asarray(depth)[48, 44]) - 3.0) < 0.2

    def test_occlusion_front_wins(self):
        d = CFG.jdtype
        # two blobs on the same ray, red at 3 m, blue at 6 m
        pos = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 6.0]], d)
        Lam = jnp.stack([jnp.eye(3, dtype=d) * 60.0] * 2)
        etas = jnp.zeros((2, 3, 3), d).at[:, 0, 2].set(-8.0)
        col = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], d)
        w = jnp.asarray([50.0, 50.0], d)   # fully opaque
        val = jnp.asarray([True, True])
        cam = _camera(d)
        img, _ = render(pos, Lam, etas, col, w, val, cam)
        center = np.asarray(img)[48, 64]
        assert center[0] > 0.5 and center[2] < 0.4, center

    def test_invalid_masked(self):
        d = CFG.jdtype
        pos, Lam, etas, col, w, val = _simple_scene(d)
        val = jnp.asarray([True, False])
        cam = _camera(d)
        img, _ = render(pos, Lam, etas, col, w, val, cam)
        blue = np.asarray(img)[48, 78]
        assert blue.min() > 0.9  # background where the masked blob was

    def test_vmf_shade_geometry(self):
        d = CFG.jdtype
        etas = jnp.zeros((2, 3, 3), d)
        etas = etas.at[0, 0, 2].set(10.0)    # lobe along +z
        etas = etas.at[1, 0, 0].set(10.0)    # lobe along +x
        view = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], d)
        s = np.asarray(vmf_shade(etas, view))
        assert s[0] > 0.95        # aligned
        assert s[1] < 0.1         # orthogonal


class TestBEV:
    def test_topdown_projection_drops_z(self, rng):
        P = bev_projection_matrix(0.0)
        mus = jnp.asarray(rng.normal(0, 1, (10, 3)))
        Sig = jnp.stack([jnp.eye(3)] * 10) * 0.1
        mu2, S2 = pushforward_gaussians(P, mus, Sig)
        # top-down: (x, y) preserved up to in-plane basis (orthonormal rows)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(mu2), axis=1),
                                   np.linalg.norm(np.asarray(mus)[:, :2],
                                                  axis=1), atol=1e-9)
        np.testing.assert_allclose(np.asarray(S2)[0], np.eye(2) * 0.1,
                                   atol=1e-9)

    def test_bev15_shapes_and_orthonormal(self):
        Ps = bev15_projections()
        assert Ps.shape == (15, 2, 3)
        for P in Ps:
            np.testing.assert_allclose(P @ P.T, np.eye(2), atol=1e-9)

    def test_vmf_pushforward_rotates(self):
        import fl_slam_tpu.core.se3 as se3
        R = se3.so3_exp(jnp.asarray([0.0, 0.0, np.pi / 2]))
        etas = jnp.zeros((1, 2, 3)).at[0, 0, 0].set(5.0)
        out = np.asarray(pushforward_vmf(R, etas))
        np.testing.assert_allclose(out[0, 0], [0.0, 5.0, 0.0], atol=1e-9)


class TestExport:
    def test_splat_export_and_manifest(self, tmp_path, rng):
        from fl_slam_tpu.render.export import (save_diagnostics,
                                               save_runtime_manifest,
                                               save_splat_export)
        from fl_slam_tpu.structures import atlas as A
        from fl_slam_tpu.structures import measurement_batch as mb
        from fl_slam_tpu.core.hexgrid import (stencil_offsets_3d,
                                              stencil_tile_keys,
                                              tile_keys_from_xyz,
                                              xyz_to_tile_axial)
        from fl_slam_tpu.ops.surfels import extract_surfels
        import tests.test_map as T

        atlas = A.empty_atlas(CFG)
        q, r, z = xyz_to_tile_axial(jnp.zeros(3, CFG.jdtype), CFG.h_tile)
        offs = stencil_offsets_3d(CFG.r_active_xy, CFG.r_active_z)
        keys = stencil_tile_keys(q, r, z, offs)
        atlas, slots, _, _ = A.activate_tiles(atlas, keys, 0)
        pts = T.make_plane_points(rng, n=300, extent=1.0)
        batch, _, _ = T.surfel_batch_from_points(pts)
        nov = jnp.where(batch.valid, 1.0, 0.0).astype(CFG.jdtype)
        mu = mb.mean_positions(batch, CFG.eps_lift)
        atlas, _ = A.insert(atlas, batch, nov,
                            tile_keys_from_xyz(mu, CFG.h_tile), keys, slots,
                            0, CFG)

        p = os.path.join(tmp_path, "splat_export.npz")
        arrays = save_splat_export(p, atlas, CFG,
                                   poses=np.zeros((3, 6)),
                                   stamps=np.arange(3.0))
        data = np.load(p)
        assert data["positions"].shape == arrays["positions"].shape
        assert data["positions"].shape[0] > 0
        assert np.isfinite(data["positions"]).all()

        mpath = os.path.join(tmp_path, "manifest.json")
        m = save_runtime_manifest(mpath, CFG)
        assert m["d_z"] == 22 and os.path.exists(mpath)

        dpath = os.path.join(tmp_path, "diag.npz")
        save_diagnostics(dpath, {"a.b": np.arange(5.0)},
                         stamps=np.arange(5.0))
        assert np.load(dpath)["a.b"].shape == (5,)


class TestSplatPallas:
    def test_interpret_matches_scene_semantics(self):
        """Pallas kernel (interpret mode on CPU) reproduces the scene checks
        of the XLA rasterizer (different tiling => not bit-equal)."""
        from fl_slam_tpu.render.splat_pallas import render_pallas
        d = jnp.float32
        pos, Lam, etas, col, w, val = _simple_scene(d)
        cam = _camera(d)
        img, depth = render_pallas(pos, Lam, etas, col, w, val, cam,
                                   interpret=True)
        img = np.asarray(img)
        assert img.shape == (96, 128, 3) and np.isfinite(img).all()
        red = img[48, 44]
        blue = img[48, 78]
        assert red[0] > red[2] + 0.2, red
        assert blue[2] > blue[0] + 0.2, blue
        assert img[5, 5].min() > 0.9
        assert abs(float(np.asarray(depth)[48, 44]) - 3.0) < 0.2

    def test_occlusion(self):
        from fl_slam_tpu.render.splat_pallas import render_pallas
        d = jnp.float32
        pos = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 6.0]], d)
        Lam = jnp.stack([jnp.eye(3, dtype=d) * 60.0] * 2)
        etas = jnp.zeros((2, 3, 3), d).at[:, 0, 2].set(-8.0)
        col = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], d)
        w = jnp.asarray([50.0, 50.0], d)
        val = jnp.asarray([True, True])
        cam = _camera(d)
        img, _ = render_pallas(pos, Lam, etas, col, w, val, cam,
                               interpret=True)
        center = np.asarray(img)[48, 64]
        assert center[0] > 0.5 and center[2] < 0.4, center
