"""Hex tiling and MA-Hex 3D binning (parity: ``common/tiling.py``,
``common/ma_hex_web.py``).

Two uses in the system:
  1. Atlas tile addressing: world (x, y, z) -> hex axial (q, r) at scale
     ``h_tile`` plus a z-slab index, packed into one int32/int64 tile key;
     fixed hex-disk stencils give the active/candidate tile sets.
  2. Surfel binning: per-point 3D cell ids on a modulo-wrapped hex lattice
     (``surfel_cells_1 x surfel_cells_2 x surfel_cells_z`` cells) feeding a
     segment-sum moment accumulation — a TPU-first redesign of the reference's
     occupant-capped gather (``ma_hex_web.py:243``): moment accumulation by
     ``segment_sum`` is exact for any occupancy and needs no caps.

Everything is branch-free and batched.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SQRT3 = 1.7320508075688772


def xy_to_axial_frac(x, y, size):
    """Pointy-top hex axial coordinates (fractional) from world xy."""
    q = (SQRT3 / 3.0 * x - y / 3.0) / size
    r = (2.0 / 3.0 * y) / size
    return q, r


def axial_round(qf, rf):
    """Cube-rounding of fractional axial coords -> integer axial (branch-free)."""
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = jnp.round(xf)
    ry = jnp.round(yf)
    rz = jnp.round(zf)
    dx = jnp.abs(rx - xf)
    dy = jnp.abs(ry - yf)
    dz = jnp.abs(rz - zf)
    # fix the axis with the largest rounding error so x+y+z = 0
    fix_x = (dx > dy) & (dx > dz)
    fix_y = (~fix_x) & (dy > dz)
    rx = jnp.where(fix_x, -ry - rz, rx)
    ry = jnp.where(fix_y, -rx - rz, ry)
    rz = -rx - ry
    return rx.astype(jnp.int32), rz.astype(jnp.int32)


def xyz_to_tile_axial(p, h_tile: float, h_z: float | None = None):
    """(..., 3) points -> integer (q, r, z_slab)."""
    if h_z is None:
        h_z = h_tile
    qf, rf = xy_to_axial_frac(p[..., 0], p[..., 1], h_tile)
    q, r = axial_round(qf, rf)
    # z slabs are CENTERED on their index (slab 0 covers [-h/2, h/2)): a
    # ground robot at z~0 must have the ground plane below it in ITS slab,
    # not in the neighbour below.
    zi = jnp.floor(p[..., 2] / h_z + 0.5).astype(jnp.int32)
    return q, r, zi


# Packing: tile key = ((q + B) << 42) | ((r + B) << 21) | (z + B) with B = 2^20.
# Fits comfortably in int64; collision-free for |q|,|r|,|z| < 2^20 (~2000 km at
# 2 m tiles). Parity: ``common/tiling.py:71`` PackedTileIdSpec.
_BIAS = 1 << 20
_SHIFT_Q = 42
_SHIFT_R = 21


def pack_tile_key(q, r, z):
    q64 = (q.astype(jnp.int64) + _BIAS)
    r64 = (r.astype(jnp.int64) + _BIAS)
    z64 = (z.astype(jnp.int64) + _BIAS)
    return (q64 << _SHIFT_Q) | (r64 << _SHIFT_R) | z64


def unpack_tile_key(key):
    z = (key & ((1 << _SHIFT_R) - 1)) - _BIAS
    r = ((key >> _SHIFT_R) & ((1 << _SHIFT_R) - 1)) - _BIAS
    q = (key >> _SHIFT_Q) - _BIAS
    return q.astype(jnp.int32), r.astype(jnp.int32), z.astype(jnp.int32)


def tile_keys_from_xyz(p, h_tile: float, h_z: float | None = None):
    q, r, z = xyz_to_tile_axial(p, h_tile, h_z)
    return pack_tile_key(q, r, z)


def hex_disk_offsets(radius: int) -> np.ndarray:
    """Static (N, 2) integer axial offsets of a hex disk, deterministic order
    (ring by ring, each ring in fixed angular order; parity: tiling.py:171)."""
    offs = [(0, 0)]
    for rad in range(1, radius + 1):
        q, r = rad, 0
        dirs = [(-1, 1), (-1, 0), (0, -1), (1, -1), (1, 0), (0, 1)]
        for dq, dr in dirs:
            for _ in range(rad):
                offs.append((q, r))
                q += dq
                r += dr
    return np.asarray(offs, dtype=np.int32)


def stencil_offsets_3d(r_xy: int, r_z: int) -> np.ndarray:
    """Static (N, 3) offsets: hex disk x z-range, deterministic order."""
    disk = hex_disk_offsets(r_xy)
    out = []
    for dz in range(-r_z, r_z + 1):
        for dq, dr in disk:
            out.append((dq, dr, dz))
    return np.asarray(out, dtype=np.int32)


def stencil_tile_keys(center_q, center_r, center_z, offsets):
    """Tile keys for a static stencil around integer axial centers.

    center_*: (...,) int32; offsets: (S, 3) static -> (..., S) int64 keys.
    """
    off = jnp.asarray(offsets)
    q = center_q[..., None] + off[:, 0]
    r = center_r[..., None] + off[:, 1]
    z = center_z[..., None] + off[:, 2]
    return pack_tile_key(q, r, z)


# ---------------------------------------------------------------------------
# MA-Hex 3D surfel binning (modulo-wrapped fixed cell grid).
# ---------------------------------------------------------------------------

def bin_cell_ids(p, cell_size: float, c1: int, c2: int, cz: int,
                 z_size: float | None = None):
    """Per-point flat cell id on the wrapped hex lattice; (...,) int32 in
    [0, c1*c2*cz). Invalid/sentinel points still get a valid id; mask them
    downstream with their weights."""
    if z_size is None:
        z_size = cell_size
    q, r, zi = xyz_to_tile_axial(p, cell_size, z_size)
    qm = jnp.mod(q, c1)
    rm = jnp.mod(r, c2)
    zm = jnp.mod(zi, cz)
    return (qm * c2 + rm) * cz + zm


def bin_cell_ids_local(x, y, z, cell_size: float, c1: int, c2: int, cz: int,
                       z_size: float | None = None):
    """Bounded local hex grid around the (pre-centered) scan: axial coords are
    offset to the grid center and CLIPPED, not modulo-wrapped.

    The reference wraps (``ma_hex_web.py:243``), which makes points
    ``wrap_extent`` apart collide in one cell — with a 3.2 m wrap against a
    >10 m lidar this mixes far-apart geometry into one plane fit. Clipping
    instead keeps every in-grid cell exact and returns ``in_grid`` so
    out-of-coverage points can be masked (coverage loss is logged, never
    silent corruption).

    Returns (flat ids int32 in [0, c1*c2*cz), in_grid bool).
    """
    if z_size is None:
        z_size = cell_size
    qf, rf = xy_to_axial_frac(x, y, cell_size)
    q, r = axial_round(qf, rf)
    zi = jnp.floor(z / z_size + 0.5).astype(jnp.int32)
    qo = q + c1 // 2
    ro = r + c2 // 2
    zo = zi + cz // 2
    in_grid = ((qo >= 0) & (qo < c1) & (ro >= 0) & (ro < c2)
               & (zo >= 0) & (zo < cz))
    qc = jnp.clip(qo, 0, c1 - 1)
    rc = jnp.clip(ro, 0, c2 - 1)
    zc = jnp.clip(zo, 0, cz - 1)
    return (qc * c2 + rc) * cz + zc, in_grid


def cell_centers_from_ids(cell, cell_size: float, c1: int, c2: int, cz: int,
                          z_size: float | None = None, dtype=None):
    """Per-id cell center coordinates (cx, cy, czc), inverse of
    ``bin_cell_ids_local``'s flattening: id = (qo*c2 + ro)*cz + zo, axial
    pointy-top x = s*sqrt(3)*(q + r/2), y = 1.5*s*r (inverse of
    ``xy_to_axial_frac``).

    Centering surfel moments per cell removes the E[pp'] - cen cen'
    cancellation (coordinates bounded by the cell radius instead of the
    whole-scan extent) — required for the bf16x2 moment kernel and improves
    the f32 path's conditioning too.
    """
    if z_size is None:
        z_size = cell_size
    cell = cell.astype(jnp.int32)
    dt = dtype if dtype is not None else jnp.float32
    qo = cell // (c2 * cz)
    ro = (cell // cz) % c2
    zo = cell % cz
    q = (qo - c1 // 2).astype(dt)
    r = (ro - c2 // 2).astype(dt)
    zi = (zo - cz // 2).astype(dt)
    cx = cell_size * SQRT3 * (q + 0.5 * r)
    cy = cell_size * 1.5 * r
    czc = zi * z_size
    return cx, cy, czc
