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


def log_rerun(atlas, cfg, poses=None, rrd_path=None, app_id="fl_slam_tpu"):
    """Log the map + trajectory to rerun if the SDK is installed; returns
    True when logged. (Parity: rerun_visualizer.py; optional dependency.)"""
    try:
        import rerun as rr  # type: ignore
    except Exception:
        return False
    arrays = atlas_to_arrays(atlas, cfg)
    rr.init(app_id)
    if rrd_path:
        rr.save(rrd_path)
    rr.log("map/points", rr.Points3D(arrays["positions"],
                                     colors=arrays["rgb"],
                                     radii=0.02 + 0.0 * arrays["weights"]))
    if poses is not None:
        poses = np.asarray(poses)
        rr.log("trajectory", rr.LineStrips3D([poses[:, :3]]))
    return True
