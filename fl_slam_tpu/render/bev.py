"""BEV pushforwards (parity: reference ``common/bev_pushforward.py:30-103``).

3D->2D Gaussian pushforward mu' = P mu, Sigma' = P Sigma P^T; BEV15 = 15
oblique projections with view axes swept along a geodesic from top-down to
side-on; vMF rotation pushforward eta' = R eta. Batched JAX (the reference is
per-splat numpy).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fl_slam_tpu.core.linalg import inv3x3


def bev_projection_matrix(tilt_rad: float, yaw_rad: float = 0.0) -> np.ndarray:
    """(2, 3) orthographic projection onto the plane normal to the tilted
    view axis (tilt 0 = top-down)."""
    ct, st = np.cos(tilt_rad), np.sin(tilt_rad)
    cy, sy = np.cos(yaw_rad), np.sin(yaw_rad)
    view = np.array([st * cy, st * sy, -ct])       # looking down when tilt=0
    ex = np.array([-sy, cy, 0.0])
    ey = np.cross(view, ex)
    ey /= max(np.linalg.norm(ey), 1e-12)
    return np.stack([ex, ey], axis=0)


def bev15_projections(max_tilt_rad: float = np.pi / 3) -> np.ndarray:
    """(15, 2, 3) projection sweep along the tilt geodesic (reference BEV15)."""
    tilts = np.linspace(0.0, max_tilt_rad, 15)
    return np.stack([bev_projection_matrix(t) for t in tilts])


def pushforward_gaussians(P, mus, Sigmas):
    """mu' = P mu (..., 2); Sigma' = P Sigma P^T (..., 2, 2)."""
    P = jnp.asarray(P, dtype=mus.dtype)
    mu2 = jnp.einsum("ij,...j->...i", P, mus)
    S2 = jnp.einsum("ij,...jk,lk->...il", P, Sigmas, P)
    return mu2, S2


def pushforward_vmf(R, etas):
    """eta' = R eta for (..., B, 3) natural parameters."""
    return jnp.einsum("ij,...bj->...bi", jnp.asarray(R, dtype=etas.dtype),
                      etas)


def atlas_bev(atlas, cfg, proj, max_prims: int = 16384):
    """Project the atlas's top primitives into one BEV plane.

    Returns (mu2 (K, 2), Sigma2 (K, 2, 2), weights (K,), rgb (K, 3))."""
    import jax
    P_, M = atlas.weights.shape
    w = jnp.where(atlas.valid, atlas.weights, -jnp.inf).reshape(-1)
    k = min(max_prims, P_ * M)
    _, idx = jax.lax.top_k(w, k)
    from fl_slam_tpu.structures.atlas import dense_Lambdas, dense_rgb, dense_thetas
    flat = lambda a: a.reshape((P_ * M,) + a.shape[2:])
    Lam = flat(dense_Lambdas(atlas))[idx]
    Sig = inv3x3(Lam, cfg.eps_lift)
    mu = jnp.einsum("nij,nj->ni", Sig, flat(dense_thetas(atlas))[idx])
    mu2, S2 = pushforward_gaussians(proj, mu, Sig)
    return mu2, S2, flat(atlas.weights)[idx], flat(dense_rgb(atlas, cfg.eps_mass))[idx]
