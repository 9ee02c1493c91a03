"""Map/state export (parity: reference shutdown exports
``backend_node.py:2334-2461`` — splat_export.npz, diagnostics npz, TUM — and
``rerun_visualizer.py`` .rrd logging, gated on the rerun SDK being present).
"""

from __future__ import annotations

import json
import os

import numpy as np

from fl_slam_tpu.core.linalg import inv3x3


def atlas_to_arrays(atlas, cfg):
    """Compact valid primitives to numpy arrays for export."""
    import jax.numpy as jnp
    from fl_slam_tpu.structures.atlas import (
        dense_Lambdas, dense_etas, dense_rgb, dense_thetas)
    valid = np.asarray(atlas.valid)
    flat = lambda a: np.asarray(a).reshape((-1,) + np.asarray(a).shape[2:])
    v = valid.reshape(-1)
    Lam = flat(dense_Lambdas(atlas))[v]
    the = flat(dense_thetas(atlas))[v]
    Sig = np.asarray(inv3x3(jnp.asarray(Lam), cfg.eps_lift))
    mu = np.einsum("nij,nj->ni", Sig, the)
    etas = flat(dense_etas(atlas, cfg.vmf_n_lobes))[v]
    return {
        "positions": mu,
        "covariances": Sig,
        "Lambdas": Lam,
        "etas": etas,
        "weights": flat(atlas.weights)[v],
        "rgb": flat(dense_rgb(atlas, cfg.eps_mass))[v],
        "cam_mass": flat(atlas.cam_mass)[v],
        "lidar_mass": flat(atlas.lidar_mass)[v],
        "created_seq": flat(atlas.created_seq)[v],
        "last_supported": flat(atlas.last_supported)[v],
        "prim_ids": flat(atlas.prim_ids)[v],
    }


def save_splat_export(path, atlas, cfg, poses=None, stamps=None):
    """splat_export.npz (parity: backend_node shutdown export)."""
    arrays = atlas_to_arrays(atlas, cfg)
    if poses is not None:
        arrays["trajectory"] = np.asarray(poses)
    if stamps is not None:
        arrays["stamps"] = np.asarray(stamps)
    np.savez_compressed(path, **arrays)
    return arrays


def save_diagnostics(path, certs: dict, stamps=None):
    """Diagnostics tape npz: one array per cert key over scans (parity:
    MinimalScanTape/DiagnosticsLog.save_npz)."""
    arrays = {k.replace("/", "_"): np.asarray(v) for k, v in certs.items()}
    if stamps is not None:
        arrays["stamps"] = np.asarray(stamps)
    np.savez_compressed(path, **arrays)


def save_runtime_manifest(path, cfg, extra: dict | None = None):
    """Runtime manifest JSON: the resolved budget/backend configuration
    (parity: RuntimeManifest, pipeline.py:1629-1793)."""
    import dataclasses
    import jax
    manifest = {
        "config": dataclasses.asdict(cfg),
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "chart_id": "GC-RIGHT-01",
        "d_z": 22,
    }
    if extra:
        manifest.update(extra)
    with open(path, "w") as fh:
        json.dump(manifest, fh, indent=2, default=str)
    return manifest


def log_rerun(atlas, cfg, poses=None, rrd_path=None, app_id="fl_slam_tpu",
              lidar_points=None, max_ellipsoids: int = 2000,
              max_arrows: int = 2000):
    """Log the map (points + covariance ellipsoids + vMF arrows), the
    trajectory, and optionally the last scan's lidar points to rerun when
    the SDK is installed; returns True when logged.
    (Parity: rerun_visualizer.py:34-172 — map Points3D, trajectory
    LineStrips3D, LiDAR points, ellipsoid/vMF glyphs; optional dependency.)"""
    try:
        import rerun as rr  # type: ignore
    except Exception:
        return False
    arrays = atlas_to_arrays(atlas, cfg)
    rr.init(app_id)
    if rrd_path:
        rr.save(rrd_path)
    rgb8 = np.clip(arrays["rgb"] * 255.0, 0, 255).astype(np.uint8)
    rr.log("map/points", rr.Points3D(arrays["positions"], colors=rgb8,
                                     radii=0.02 + 0.0 * arrays["weights"]))
    w = arrays["weights"]
    keep = np.argsort(-w)[:max_ellipsoids]
    if keep.size:
        vals, vecs = np.linalg.eigh(arrays["covariances"][keep])
        half = np.sqrt(np.maximum(vals, 1e-12))
        det = np.linalg.det(vecs)
        vecs = vecs * np.sign(det)[:, None, None]
        # rotation matrix -> xyzw quaternion (w-pivot; fine for glyphs)
        t = np.trace(vecs, axis1=1, axis2=2)
        s = np.sqrt(np.maximum(t + 1.0, 1e-12)) * 2.0
        quat = np.stack([(vecs[:, 2, 1] - vecs[:, 1, 2]) / s,
                         (vecs[:, 0, 2] - vecs[:, 2, 0]) / s,
                         (vecs[:, 1, 0] - vecs[:, 0, 1]) / s,
                         0.25 * s], axis=1)
        quat /= np.maximum(np.linalg.norm(quat, axis=1, keepdims=True),
                           1e-12)
        rr.log("map/ellipsoids", rr.Ellipsoids3D(
            centers=arrays["positions"][keep], half_sizes=half,
            quaternions=quat, colors=rgb8[keep]))
    eta0 = arrays["etas"][:, 0, :] if arrays["etas"].ndim == 3 \
        else arrays["etas"][:, 0:3]
    kap = np.linalg.norm(eta0, axis=-1)
    akeep = np.argsort(-kap)[:max_arrows]
    if akeep.size:
        k = np.maximum(kap[akeep], 1e-9)
        vec = eta0[akeep] / k[:, None] * (0.05 + 0.05 * np.log1p(k))[:, None]
        rr.log("map/vmf", rr.Arrows3D(origins=arrays["positions"][akeep],
                                      vectors=vec, colors=rgb8[akeep]))
    if lidar_points is not None:
        pts = np.asarray(lidar_points)
        pts = pts[np.isfinite(pts).all(axis=1)]
        rr.log("scan/lidar", rr.Points3D(pts, radii=0.01))
    if poses is not None:
        poses = np.asarray(poses)
        rr.log("trajectory", rr.LineStrips3D([poses[:, :3]]))
    return True
