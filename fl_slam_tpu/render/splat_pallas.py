"""Pallas TPU kernel for the Gaussian-splat tile rasterizer.

The XLA rasterizer in ``splat.py`` materializes a (k, TILE, TILE) weight
tensor per tile plus cumprod transmittance — fine for offline renders, but
the compositing loop is exactly the kind of fused streaming compute Pallas
does better: one grid program per 8x128-pixel image tile (the native f32
VPU tile), front-to-back alpha compositing over the tile's top-K splats held
in VMEM, no intermediate materialization.

Split of labor:
  - XLA (host of the kernel): projection, EWA 2D covariances, per-tile top-K
    splat selection and depth sort (top_k/argsort are already excellent in
    XLA), producing gathered per-tile splat parameter blocks (T, K, 8):
    [u, v, inv_a, inv_b, inv_c, alpha, r, g, b is folded: see PARAMS layout]
  - Pallas: per-tile compositing loop (K sequential blend steps over an
    (8, 128) pixel block).

PARAMS layout per splat row (padded to 16 lanes):
  0:u  1:v  2:Sinv00  3:Sinv01  4:Sinv11  5:alpha  6:r  7:g  8:b  9:z
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_slam_tpu.core import se3
from fl_slam_tpu.core.linalg import inv3x3
from fl_slam_tpu.render.splat import (ALPHA_FLOOR, LOG_W_CLIP, Camera,
                                      _inv2x2, _project, splat_cov2d,
                                      vmf_shade)

TILE_H = 8
TILE_W = 128
N_PARAM = 16  # padded row width (lane-friendly)


def _make_kernel(n_tx: int):
    def _composite_kernel(params_ref, out_r, out_g, out_b, out_z):
        """One program = one 8x128 pixel tile; params_ref: (K, N_PARAM)."""
        t = pl.program_id(0)
        n_tx_c = jnp.int32(n_tx)
        ty = jax.lax.div(t, n_tx_c)
        tx = jax.lax.rem(t, n_tx_c)
        K = params_ref.shape[0]

        # iota must be integer-typed on TPU; cast after.
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) \
            .astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) \
            .astype(jnp.float32)
        py = row + ty.astype(jnp.float32) * TILE_H
        px = col + tx.astype(jnp.float32) * TILE_W

        def blend(k, carry):
            r, g, b, zacc, zw, trans = carry
            u = params_ref[k, 0]
            v = params_ref[k, 1]
            ia = params_ref[k, 2]
            ib = params_ref[k, 3]
            ic = params_ref[k, 4]
            al = params_ref[k, 5]
            cr = params_ref[k, 6]
            cg = params_ref[k, 7]
            cb = params_ref[k, 8]
            z = params_ref[k, 9]
            # NOTE: all constants must be explicit f32 — under global x64
            # weak Python floats materialize f64 ops Mosaic cannot legalize.
            f = jnp.float32
            du = px - u
            dv = py - v
            logw = f(-0.5) * (ia * du * du + f(2.0) * ib * du * dv
                              + ic * dv * dv)
            w = jnp.where(logw > f(LOG_W_CLIP), jnp.exp(logw), f(0.0))
            a = jnp.clip(al * w, f(0.0), f(0.995))
            contrib = a * trans
            return (r + contrib * cr, g + contrib * cg, b + contrib * cb,
                    zacc + contrib * z, zw + contrib, trans * (f(1.0) - a))

        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        init = (zero, zero, zero, zero, zero,
                jnp.ones((TILE_H, TILE_W), jnp.float32))
        r, g, b, zacc, zw, trans = jax.lax.fori_loop(0, K, blend, init)
        # white background through residual transmittance
        out_r[:] = r + trans
        out_g[:] = g + trans
        out_b[:] = b + trans
        out_z[:] = zacc / jnp.maximum(zw, jnp.float32(1e-9))

    return _composite_kernel


def render_pallas(positions, Lambdas, etas, colors, weights, valid,
                  cam: Camera, *, max_splats_per_tile: int = 64,
                  eps_lift: float = 1e-9, interpret: bool = False):
    """Drop-in sibling of splat.render using the Pallas compositing kernel.

    Returns (image (H, W, 3) f32, depth (H, W) f32).
    """
    f32 = jnp.float32
    N = positions.shape[0]
    H, W = cam.height, cam.width
    n_ty = -(-H // TILE_H)
    n_tx = -(-W // TILE_W)
    T = n_ty * n_tx

    R = se3.so3_exp(cam.pose_wc[3:6])
    Sigma_w = inv3x3(Lambdas.astype(f32), eps_lift)
    uv, depth, front, p_c = _project(positions.astype(f32), cam)
    S2 = splat_cov2d(Sigma_w, p_c, R.astype(f32), cam)
    S2inv = _inv2x2(S2)

    alpha0 = 1.0 - jnp.exp(-jnp.maximum(weights.astype(f32), 0.0))
    alpha0 = ALPHA_FLOOR + (1.0 - ALPHA_FLOOR) * alpha0
    view_dir = -(p_c @ R.T.astype(f32))
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-9)
    shade = vmf_shade(etas.astype(f32), view_dir)
    rgb = colors.astype(f32) * (0.25 + 0.75 * shade[:, None])
    ok = valid & front & (weights > 0)

    # Per-tile top-K by center score, depth-sorted (XLA side).
    ty = jnp.arange(n_ty, dtype=f32)
    tx = jnp.arange(n_tx, dtype=f32)
    cy = ty * TILE_H + TILE_H / 2.0
    cx = tx * TILE_W + TILE_W / 2.0
    centers = jnp.stack(
        [jnp.tile(cx, n_ty), jnp.repeat(cy, n_tx)], axis=1)      # (T, 2) xy
    d = centers[:, None, :] - uv[None, :, :]
    maha = (S2inv[None, :, 0, 0] * d[..., 0] ** 2
            + 2.0 * S2inv[None, :, 0, 1] * d[..., 0] * d[..., 1]
            + S2inv[None, :, 1, 1] * d[..., 1] ** 2)
    sig_px = jnp.sqrt(jnp.maximum(jnp.maximum(S2[:, 0, 0], S2[:, 1, 1]),
                                  1e-6))
    reach = jnp.linalg.norm(d, axis=-1) < (3.0 * sig_px
                                           + float(TILE_W))[None, :]
    score = jnp.where(ok[None, :] & reach, -0.5 * maha, -jnp.inf)
    # Pallas TPU blocks need the sublane dim divisible by 8: pad K up.
    k = min(max_splats_per_tile, N)
    k = max(8, -(-k // 8) * 8)
    k = min(k, max(N, 8))
    top_score, tile_idx = jax.lax.top_k(score, min(k, N))        # (T, <=k)
    if top_score.shape[1] < k:
        pad = k - top_score.shape[1]
        top_score = jnp.pad(top_score, ((0, 0), (0, pad)),
                            constant_values=-jnp.inf)
        tile_idx = jnp.pad(tile_idx, ((0, 0), (0, pad)))
    sel_ok = jnp.isfinite(top_score)

    g_z = jnp.where(sel_ok, depth[tile_idx], jnp.inf)
    order = jnp.argsort(g_z, axis=1)
    tile_idx = jnp.take_along_axis(tile_idx, order, axis=1)
    sel_ok = jnp.take_along_axis(sel_ok, order, axis=1)

    params = jnp.zeros((T, k, N_PARAM), dtype=f32)
    okf = sel_ok.astype(f32)
    params = params.at[:, :, 0].set(uv[tile_idx, 0])
    params = params.at[:, :, 1].set(uv[tile_idx, 1])
    params = params.at[:, :, 2].set(S2inv[tile_idx, 0, 0])
    params = params.at[:, :, 3].set(S2inv[tile_idx, 0, 1])
    params = params.at[:, :, 4].set(S2inv[tile_idx, 1, 1])
    params = params.at[:, :, 5].set(alpha0[tile_idx] * okf)
    params = params.at[:, :, 6].set(rgb[tile_idx, 0])
    params = params.at[:, :, 7].set(rgb[tile_idx, 1])
    params = params.at[:, :, 8].set(rgb[tile_idx, 2])
    params = params.at[:, :, 9].set(jnp.where(sel_ok, depth[tile_idx], 0.0))
    params = params.reshape(T * k, N_PARAM)

    # Tile-major outputs (T*8, 128): no arithmetic in any index_map (integer
    # // and % on traced indices recurse in jnp promotion); the (ty, tx)
    # split happens inside the kernel with lax integer ops, and the image is
    # assembled by reshape/transpose outside.
    out_shape = tuple(jax.ShapeDtypeStruct((T * TILE_H, TILE_W), f32)
                      for _ in range(4))
    # index_map literals must match the index dtype: under global x64 a
    # bare Python 0 becomes i64 and Mosaic rejects the mixed-type return.
    zero = lambda t: (t, jnp.int32(0))
    out_spec = pl.BlockSpec((TILE_H, TILE_W), zero,
                            memory_space=pltpu.VMEM)
    r, g, b, z = pl.pallas_call(
        _make_kernel(n_tx),
        grid=(T,),
        in_specs=[pl.BlockSpec((k, N_PARAM), zero,
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(params)

    def assemble(a):
        a = a.reshape(n_ty, n_tx, TILE_H, TILE_W)
        return a.transpose(0, 2, 1, 3).reshape(n_ty * TILE_H, n_tx * TILE_W)

    img = jnp.stack([assemble(r), assemble(g), assemble(b)], axis=-1)[:H, :W]
    return img, assemble(z)[:H, :W]
