"""Device-side Gaussian-splat renderer with vMF shading (parity: reference
``backend/rendering.py:28-355``, which is host-side numpy; here the rasterizer
is JAX on device — jit/vmap-friendly, batched over pixels and tiles).

Model per primitive (from the atlas): 3D Gaussian (Lambda, mu) + multi-lobe
vMF appearance (etas), RGB color, weight (mass). Rendering:
  - perspective pinhole camera, EWA projection: Sigma2 = J W Sigma W^T J^T
    (+ screen-space dilation), log-domain clipped Gaussian weights;
  - fixed-budget tile binning: image tiles of TILE px, per tile the top
    MAX_SPLATS_PER_TILE primitives by projected contribution at tile center
    (parity: the reference's 32x32 tiles with a 64-splat cap);
  - front-to-back alpha compositing ordered by depth;
  - shading: energy-normalized multi-lobe vMF radiance
    sum_b pi_b exp(kappa_b (mu_b . v - 1)) toward the view ray, opacity with
    a soft floor (parity: rendering.py vMF shading).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fl_slam_tpu.core import se3
from fl_slam_tpu.core.linalg import inv3x3

TILE = 16
MAX_SPLATS_PER_TILE = 64
ALPHA_FLOOR = 0.02          # opacity soft floor (rendering.py)
LOG_W_CLIP = -12.0          # log-domain EWA clipping


class Camera(NamedTuple):
    pose_wc: jnp.ndarray    # (6,) camera-to-world [t, rotvec]
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int


def _project(points_w, cam: Camera):
    """World points -> (uv (N,2), depth (N,), in_front (N,))."""
    R = se3.so3_exp(cam.pose_wc[3:6])
    t = cam.pose_wc[:3]
    p_c = (points_w - t) @ R            # R^T (p - t)
    z = p_c[:, 2]
    zs = jnp.maximum(z, 1e-6)
    u = cam.fx * p_c[:, 0] / zs + cam.cx
    v = cam.fy * p_c[:, 1] / zs + cam.cy
    return jnp.stack([u, v], axis=1), z, z > 0.05, p_c


def splat_cov2d(Sigma_w, p_c, R, cam: Camera):
    """EWA: Sigma_2D = J R^T Sigma_w R J^T with the perspective Jacobian."""
    z = jnp.maximum(p_c[:, 2], 1e-6)
    x, y = p_c[:, 0], p_c[:, 1]
    J = jnp.zeros((p_c.shape[0], 2, 3), dtype=Sigma_w.dtype)
    J = J.at[:, 0, 0].set(cam.fx / z)
    J = J.at[:, 0, 2].set(-cam.fx * x / (z * z))
    J = J.at[:, 1, 1].set(cam.fy / z)
    J = J.at[:, 1, 2].set(-cam.fy * y / (z * z))
    Sigma_c = jnp.einsum("ji,njk,kl->nil", R, Sigma_w, R)
    S2 = jnp.einsum("nij,njk,nlk->nil", J, Sigma_c, J)
    # screen-space dilation (antialias, parity: EWA +0.3 px)
    return S2 + 0.3 * jnp.eye(2, dtype=Sigma_w.dtype)


def vmf_shade(etas, view_dir, eps: float = 1e-9):
    """Energy-normalized multi-lobe vMF radiance toward the view direction.

    etas (N, B, 3); view_dir (N, 3) unit, pointing from surface to camera.
    radiance = sum_b pi_b exp(kappa_b (mu_b . v - 1)), pi_b = kappa_b / sum
    (parity: rendering.py multi-lobe shading, energy normalized).
    """
    kap = jnp.linalg.norm(etas, axis=-1)                     # (N, B)
    mu = etas / jnp.maximum(kap[..., None], eps)
    # Two-sided: surfaces shade by |cos| against the lobe axis.
    dots = jnp.abs(jnp.einsum("nbi,ni->nb", mu, view_dir))
    pi_b = kap / jnp.maximum(jnp.sum(kap, axis=-1, keepdims=True), eps)
    rad = jnp.sum(pi_b * jnp.exp(jnp.minimum(kap, 20.0) * (dots - 1.0)),
                  axis=-1)
    return jnp.clip(rad, 0.0, 1.0)


def render(positions, Lambdas, etas, colors, weights, valid, cam: Camera,
           *, eps_lift: float = 1e-9, bg=(1.0, 1.0, 1.0)):
    """Rasterize primitives -> (H, W, 3) float image + (H, W) depth.

    All inputs are the compacted valid primitives (N, ...) (e.g. the gathered
    valid rows of the atlas). Fixed budgets: per image tile the top
    MAX_SPLATS_PER_TILE primitives by center contribution.
    """
    dt = positions.dtype
    N = positions.shape[0]
    H, W = cam.height, cam.width
    n_ty = -(-H // TILE)
    n_tx = -(-W // TILE)

    R = se3.so3_exp(cam.pose_wc[3:6])
    Sigma_w = inv3x3(Lambdas, eps_lift)
    uv, depth, front, p_c = _project(positions, cam)
    S2 = splat_cov2d(Sigma_w, p_c, R, cam)
    S2inv = _inv2x2(S2)
    det2 = S2[:, 0, 0] * S2[:, 1, 1] - S2[:, 0, 1] * S2[:, 1, 0]

    alpha0 = 1.0 - jnp.exp(-jnp.maximum(weights, 0.0))       # mass -> opacity
    alpha0 = ALPHA_FLOOR + (1.0 - ALPHA_FLOOR) * alpha0
    view_dir = -(p_c @ R.T)                                   # world, surf->cam
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-9)
    shade = vmf_shade(etas, view_dir)
    rgb = colors * (0.25 + 0.75 * shade[:, None])
    ok = valid & front & (weights > 0)

    # ---- tile binning: top-K by contribution at tile center ------------------
    ty = jnp.arange(n_ty)
    tx = jnp.arange(n_tx)
    cy = (ty * TILE + TILE / 2.0).astype(dt)
    cx = (tx * TILE + TILE / 2.0).astype(dt)
    centers = jnp.stack(jnp.meshgrid(cx, cy, indexing="xy"),
                        axis=-1).reshape(-1, 2)               # (T, 2)

    d = centers[:, None, :] - uv[None, :, :]                  # (T, N, 2)
    maha = (S2inv[None, :, 0, 0] * d[..., 0] ** 2
            + 2.0 * S2inv[None, :, 0, 1] * d[..., 0] * d[..., 1]
            + S2inv[None, :, 1, 1] * d[..., 1] ** 2)
    # Effective footprint must reach the tile: inflate by tile radius.
    sig_px = jnp.sqrt(jnp.maximum(jnp.maximum(S2[:, 0, 0], S2[:, 1, 1]),
                                  1e-6))
    reach = (jnp.linalg.norm(d, axis=-1)
             < (3.0 * sig_px + TILE)[None, :])
    score = jnp.where(ok[None, :] & reach, -0.5 * maha, -jnp.inf)
    k = min(MAX_SPLATS_PER_TILE, N)
    _, tile_idx = jax.lax.top_k(score, k)                     # (T, k)

    # ---- per-tile rasterization ------------------------------------------------
    px = jnp.arange(TILE, dtype=dt)
    pyx = jnp.stack(jnp.meshgrid(px, px, indexing="xy"), axis=-1)  # (T,T,2) xy

    def draw_tile(t_flat, idx):
        tyx = t_flat // n_tx
        txx = t_flat % n_tx
        origin = jnp.stack([txx * TILE, tyx * TILE]).astype(dt)
        pix = pyx + origin[None, None, :]                     # (TILE, TILE, 2)

        g_uv = uv[idx]
        g_inv = S2inv[idx]
        g_rgb = rgb[idx]
        g_a = jnp.where(ok[idx], alpha0[idx], 0.0)
        g_z = depth[idx]
        order = jnp.argsort(g_z)                              # front-to-back
        g_uv, g_inv = g_uv[order], g_inv[order]
        g_rgb, g_a, g_z = g_rgb[order], g_a[order], g_z[order]

        dd = pix[None, :, :, :] - g_uv[:, None, None, :]      # (k, T, T, 2)
        logw = -0.5 * (g_inv[:, None, None, 0, 0] * dd[..., 0] ** 2
                       + 2 * g_inv[:, None, None, 0, 1] * dd[..., 0] * dd[..., 1]
                       + g_inv[:, None, None, 1, 1] * dd[..., 1] ** 2)
        w_pix = jnp.where(logw > LOG_W_CLIP, jnp.exp(logw), 0.0)
        a = jnp.clip(g_a[:, None, None] * w_pix, 0.0, 0.995)  # (k, T, T)

        # front-to-back compositing: transmittance = cumprod(1 - a) exclusive
        trans = jnp.cumprod(1.0 - a, axis=0)
        trans_excl = jnp.concatenate(
            [jnp.ones_like(trans[:1]), trans[:-1]], axis=0)
        contrib = a * trans_excl                               # (k, T, T)
        col = jnp.einsum("kxy,kc->xyc", contrib, g_rgb)
        col = col + trans[-1][..., None] * jnp.asarray(bg, dtype=dt)
        zbuf = jnp.sum(contrib * g_z[:, None, None], axis=0) / jnp.maximum(
            jnp.sum(contrib, axis=0), 1e-9)
        return col, zbuf

    t_ids = jnp.arange(n_ty * n_tx)
    cols, zbufs = jax.vmap(draw_tile)(t_ids, tile_idx)        # (T, TILE, TILE, ...)
    img = cols.reshape(n_ty, n_tx, TILE, TILE, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(n_ty * TILE, n_tx * TILE, 3)[:H, :W]
    zb = zbufs.reshape(n_ty, n_tx, TILE, TILE).transpose(0, 2, 1, 3)
    zb = zb.reshape(n_ty * TILE, n_tx * TILE)[:H, :W]
    return img, zb


def _inv2x2(S):
    det = S[:, 0, 0] * S[:, 1, 1] - S[:, 0, 1] * S[:, 1, 0]
    inv_det = 1.0 / jnp.maximum(det, 1e-12)
    out = jnp.stack([
        jnp.stack([S[:, 1, 1], -S[:, 0, 1]], axis=-1),
        jnp.stack([-S[:, 1, 0], S[:, 0, 0]], axis=-1),
    ], axis=-2)
    return out * inv_det[:, None, None]


def render_atlas(atlas, cam: Camera, cfg, max_prims: int = 16384):
    """Render the atlas map: compact the top valid primitives by weight into
    a fixed budget, then rasterize."""
    P, M = atlas.weights.shape
    w = jnp.where(atlas.valid, atlas.weights, -jnp.inf).reshape(-1)
    k = min(max_prims, P * M)
    _, idx = jax.lax.top_k(w, k)
    from fl_slam_tpu.structures.atlas import (
        dense_Lambdas, dense_etas, dense_rgb, dense_thetas)
    flat = lambda a: a.reshape((P * M,) + a.shape[2:])
    Lam = flat(dense_Lambdas(atlas))[idx]
    the = flat(dense_thetas(atlas))[idx]
    pos = jnp.einsum("nij,nj->ni", inv3x3(Lam, cfg.eps_lift), the)
    return render(pos, Lam, flat(dense_etas(atlas, cfg.vmf_n_lobes))[idx], flat(dense_rgb(atlas, cfg.eps_mass))[idx],
                  flat(atlas.weights)[idx], flat(atlas.valid)[idx], cam,
                  eps_lift=cfg.eps_lift)
