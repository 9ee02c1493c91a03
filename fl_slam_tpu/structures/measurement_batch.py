"""Fixed-size measurement-primitive batch (parity: reference
``backend/structures/measurement_batch.py``).

A batch holds ``n_feat + n_surfel`` primitive slots: the camera slice
``[0, n_feat)`` and the LiDAR slice ``[n_feat, n_total)``. Each primitive is a
3D Gaussian in information form ``(Lambda, theta)`` (body frame) plus a
multi-lobe vMF appearance/normal model in natural parameters
``eta[b] = kappa_b * mu_b``. Padded slots carry ``valid=False`` and zero
weight; every downstream operator is masked, never gated.

Unlike the reference (Python dataclass with host-side builders), this is a
NamedTuple pytree built entirely on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.core.linalg import inv3x3

SOURCE_CAMERA = 0
SOURCE_LIDAR = 1


class MeasurementBatch(NamedTuple):
    """SoA batch of measurement primitives. Leading dim = n_feat + n_surfel."""

    Lambdas: jnp.ndarray   # (N, 3, 3) position precision (body frame)
    thetas: jnp.ndarray    # (N, 3) information vector (Lambda @ mu)
    etas: jnp.ndarray      # (N, B, 3) vMF natural params (lobe 0 = normal)
    weights: jnp.ndarray   # (N,) evidence mass
    valid: jnp.ndarray     # (N,) bool
    colors: jnp.ndarray    # (N, 3) RGB in [0, 1]
    sources: jnp.ndarray   # (N,) int32: 0=camera, 1=lidar


def empty_batch(cfg: GCConfig) -> MeasurementBatch:
    n = cfg.n_meas
    dt = cfg.jdtype
    return MeasurementBatch(
        Lambdas=jnp.zeros((n, 3, 3), dtype=dt),
        thetas=jnp.zeros((n, 3), dtype=dt),
        etas=jnp.zeros((n, cfg.vmf_n_lobes, 3), dtype=dt),
        weights=jnp.zeros((n,), dtype=dt),
        valid=jnp.zeros((n,), dtype=bool),
        sources=jnp.full((n,), SOURCE_LIDAR, dtype=jnp.int32),
        colors=jnp.full((n, 3), 0.5, dtype=dt),
    )


def with_lidar_surfels(batch: MeasurementBatch, cfg: GCConfig, *,
                       Lambdas, thetas, etas, weights, valid,
                       colors=None) -> MeasurementBatch:
    """Fill the LiDAR slice ``[n_feat, n_total)`` with fixed-size surfel arrays
    (parity: ``measurement_batch_add_lidar_surfels``)."""
    s = slice(cfg.n_feat, cfg.n_feat + cfg.n_surfel)
    if colors is None:
        colors = jnp.full((cfg.n_surfel, 3), 0.5, dtype=cfg.jdtype)
    return batch._replace(
        Lambdas=batch.Lambdas.at[s].set(Lambdas),
        thetas=batch.thetas.at[s].set(thetas),
        etas=batch.etas.at[s].set(etas),
        weights=batch.weights.at[s].set(weights),
        valid=batch.valid.at[s].set(valid),
        sources=batch.sources.at[s].set(SOURCE_LIDAR),
        colors=batch.colors.at[s].set(colors),
    )


def with_camera_features(batch: MeasurementBatch, cfg: GCConfig, *,
                         Lambdas, thetas, etas, weights, valid,
                         colors) -> MeasurementBatch:
    """Fill the camera slice ``[0, n_feat)`` (parity:
    ``measurement_batch_from_camera_splats``).

    (Normal-PROJECTING the camera precisions here was tried against the
    round-3 camera accuracy issue and REJECTED: worse at small budgets
    — in-plane corner information is real geometry — and NaN at f32
    production scale from the near-singular plane-form Lambdas. The
    resolved mechanism was the evidence-side pair precision instead; see
    ops/visual_evidence.py and docs/PERF_NOTES.md.)
    """
    s = slice(0, cfg.n_feat)
    return batch._replace(
        Lambdas=batch.Lambdas.at[s].set(Lambdas),
        thetas=batch.thetas.at[s].set(thetas),
        etas=batch.etas.at[s].set(etas),
        weights=batch.weights.at[s].set(weights),
        valid=batch.valid.at[s].set(valid),
        sources=batch.sources.at[s].set(SOURCE_CAMERA),
        colors=batch.colors.at[s].set(colors),
    )


# ---------------------------------------------------------------------------
# Accessors (parity: measurement_batch_mean_positions/_directions/_kappas).
# ---------------------------------------------------------------------------

def mean_positions(batch: MeasurementBatch, eps_lift: float) -> jnp.ndarray:
    """mu = (Lambda + eps I)^{-1} theta, closed form, (N, 3)."""
    return jnp.einsum("nij,nj->ni", inv3x3(batch.Lambdas, eps_lift), batch.thetas)


def mean_directions(batch: MeasurementBatch, eps_mass: float) -> jnp.ndarray:
    """Primary-lobe unit direction (N, 3); zero-kappa rows give e_z."""
    eta0 = batch.etas[:, 0, :]
    n = jnp.linalg.norm(eta0, axis=-1, keepdims=True)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype=eta0.dtype), eta0.shape)
    return jnp.where(n > eps_mass, eta0 / jnp.maximum(n, eps_mass), ez)


def kappas(batch: MeasurementBatch) -> jnp.ndarray:
    """Primary-lobe concentration |eta_0| (N,)."""
    return jnp.linalg.norm(batch.etas[:, 0, :], axis=-1)


def transform_to_world(batch: MeasurementBatch, pose_wb, *,
                       eps_lift: float, R=None) -> MeasurementBatch:
    """Push the batch from body frame to world frame at pose ``[t, rotvec]``
    (6-vector) or ``[t, quat wxyz]`` (7-vector, the anchor form).

    Gaussian pushforward (parity: pipeline.py transform_gaussian_to_world):
      Lambda_w = R Lambda R^T, mu_w = R mu + t, theta_w = Lambda_w mu_w;
    vMF lobes rotate: eta_w = R eta.

    ``R`` may be threaded in (e.g. emitted by the belief kernels) to skip
    the scalar quaternion->matrix chain, whose per-op issue stalls cost
    more than the math on TPU.
    """
    from fl_slam_tpu.core import se3
    if R is None:
        if pose_wb.shape[-1] == 7:
            R = se3.quat_to_R(pose_wb[3:7])
        else:
            R = se3.so3_exp(pose_wb[3:6])
    t = pose_wb[:3]
    Lambda_w = jnp.einsum("ij,njk,lk->nil", R, batch.Lambdas, R)
    mu_b = jnp.einsum("nij,nj->ni", inv3x3(batch.Lambdas, eps_lift), batch.thetas)
    mu_w = mu_b @ R.T + t
    theta_w = jnp.einsum("nij,nj->ni", Lambda_w, mu_w)
    eta_w = jnp.einsum("ij,nbj->nbi", R, batch.etas)
    return batch._replace(Lambdas=Lambda_w, thetas=theta_w, etas=eta_w)
