"""LiDAR surfel extraction via MA-Hex-3D binning (parity: reference
``operators/lidar_surfel_extraction.py:84-431``).

TPU-first redesign: the reference gathers up to ``max_occupants`` point
indices per cell and vmaps a per-cell fit. Here the per-cell weighted moments
(sum w, sum w*p, sum w*p p^T) are accumulated with ONE packed ``segment_sum``
over ALL points — exact for any occupancy (the reference's occupant cap is an
approximation it logs), one scatter pass, no gather tables. The per-cell
plane fit is closed-form (analytic symmetric-3x3 eigensolver), so the whole
operator is elementwise + segment_sum: no LAPACK, no data-dependent shapes.

Layout discipline: points arrive as COMPONENT PLANES ``(3, N)`` and every
per-point / per-cell intermediate is a plane ``(k, N)`` / ``(k, C)`` (see
core/linalg sym6p note: (C, 3, 3) arrays tile at ~42x padded bandwidth; the
pre-plane implementation spent ~370 us/scan on five such passes). Only the
final selected budget (S = n_surfel, 1024) is densified to (S, 3, 3) for the
measurement batch boundary.

Per cell (math identical to the reference ``_fit_one_cell``):
  centroid  = sum(w p)/sum(w)
  cov       = sum(w p p^T)/sum(w) - centroid centroid^T  (+ eig_min I)
  normal    = eigenvector of smallest eigenvalue, sign-fixed to face sensor
  Sigma     = cov + sensor_var I     (in-plane spread + perpendicular residual)
  Lambda    = Sigma^{-1} + (nu/psi) I   (Wishart regularization in precision)
  theta     = Lambda_reg @ centroid
  kappa     = kappa_scale / sqrt(max(lambda_min, eig_min)), clipped
  valid     = count >= min_points and mass > 0

Cell selection into the fixed ``n_surfel`` budget is deterministic:
valid-first, then ascending cell id (reference ordering).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.core.hexgrid import bin_cell_ids_local, cell_centers_from_ids
from fl_slam_tpu.ops import surfel_kernels
from fl_slam_tpu.core.linalg import (
    sym6_to_mat33, sym6p_eigvals, sym6p_eigvec, sym6p_inv, sym6p_matvec)

# Reference SurfelExtractionConfig defaults (lidar_surfel_extraction.py:44-62),
# except the cell size comes from cfg.surfel_cell_size: the reference's 0.1 m
# cells on a 32x32x8 wrapped grid alias geometry >3.2 m apart; here the grid is
# clipped-local (see bin_cell_ids_local) and sized to cover the lidar range.
MIN_POINTS_PER_CELL = 3
# Per-axis sensor noise floor (m^2). The reference uses 1e-6 (sigma = 1 mm),
# which lets a 3-point near-coplanar cell claim millimeter plane precision
# (Lambda ~ 1e6) and dominate the pose WLS; 1e-4 matches a real lidar's ~1 cm.
SENSOR_VAR = 1e-4
WISHART_NU = 5.0
WISHART_PSI = 0.1
KAPPA_SCALE = 10.0
KAPPA_MIN = 0.1
KAPPA_MAX = 100.0
EIG_MIN = 1e-12


def extract_surfels(points_p, weights, cfg: GCConfig, *,
                    voxel_size: float | None = None):
    """points_p (3, N) component planes, weights (N,) -> fixed-size surfel
    arrays + certs.

    Returns dict with Lambdas (S,3,3), thetas (S,3), etas (S,B,3),
    weights (S,), valid (S,), positions (S,3), normals (S,3), kappas (S,),
    and a certs dict. S = cfg.n_surfel.
    """
    dt = cfg.jdtype
    if voxel_size is None:
        voxel_size = cfg.surfel_cell_size
    points_p = points_p.astype(dt)
    weights = weights.astype(dt)
    n_cells = cfg.surfel_cells_1 * cfg.surfel_cells_2 * cfg.surfel_cells_z

    # Mask non-finite sentinels; center the scan so the bounded local grid
    # covers the sweep (translation does not affect covariances; parity:
    # _extract_surfels_mahex3d_jax_jit).
    finite = jnp.all(jnp.abs(points_p) < 0.1 * cfg.nonfinite_sentinel, axis=0)
    w_fin = weights * finite.astype(dt)
    w_tot_fin = jnp.sum(w_fin) + EIG_MIN
    center = jnp.sum(points_p * w_fin[None, :], axis=1) / w_tot_fin  # (3,)
    px = points_p[0] - center[0]
    py = points_p[1] - center[1]
    pz = points_p[2] - center[2]

    # ADAPTIVE coverage (traced scalar; shapes stay static): the fixed-count
    # grid at the configured cell size covers only +-0.91 * (c1/2) * size
    # ~ 8.8 m of axial radius at the 0.5 m default — on the Kimera-layout
    # fixture (walls 8-28 m out) 89% of the point MASS fell out of grid and
    # the rotation evidence saw floor-only geometry. Scale the cell size per
    # scan so the p95 xy radius fits the axial bound (the clipped-local
    # design keeps exact cells; only the >p95 tail can clip). The configured
    # size is the FLOOR, so small scenes keep their resolution and existing
    # small-config behavior is unchanged.
    if getattr(cfg, "surfel_adaptive_cells", True):
        # weight-aware: zero-weight pad points carry no geometry (and the
        # deskew maps their sentinel stamps far away — see ops/deskew.py)
        carry = finite & (weights > 1e-9)
        r_xy = jnp.where(carry, jnp.maximum(jnp.abs(px), jnp.abs(py)), 0.0)
        r95 = jnp.percentile(r_xy.astype(jnp.float32), 95.0).astype(dt)
        cover = 0.45 * min(cfg.surfel_cells_1, cfg.surfel_cells_2)
        # Cap at the lidar's range envelope: a diverging twist estimate can
        # fling DESKEWED points arbitrarily far; without the cap the cell
        # size follows (observed 42 m cells -> 1-surfel scans -> map death
        # spiral). Points beyond the sensor's own max range are never
        # legitimate geometry, so the cap loses nothing real.
        voxel_size = jnp.clip(r95 / cover, voxel_size,
                              1.2 * cfg.range_weight_max_r / cover)
    else:
        r95 = jnp.zeros((), dt)

    cell, in_grid = bin_cell_ids_local(
        px, py, pz, voxel_size, cfg.surfel_cells_1, cfg.surfel_cells_2,
        cfg.surfel_cells_z)
    usable = finite & in_grid
    w_eff = weights * usable.astype(dt)
    w_tot = jnp.sum(w_eff) + EIG_MIN

    # CELL-LOCAL coordinates: moments accumulate relative to each point's own
    # cell center (bounded by the cell radius), so the covariance
    # E[pp'] - cen cen' carries no scan-extent cancellation — numerically
    # better in f32 and a requirement for the bf16x2 moment kernel.
    ccx, ccy, ccz = cell_centers_from_ids(
        cell, voxel_size, cfg.surfel_cells_1, cfg.surfel_cells_2,
        cfg.surfel_cells_z, dtype=dt)
    lx, ly, lz = px - ccx, py - ccy, pz - ccz

    # ONE packed moment sum: [cnt, w, w*p (3), w*p p^T sym6 (6)] = 11 rows.
    payload = jnp.stack([
        usable.astype(dt), w_eff,
        w_eff * lx, w_eff * ly, w_eff * lz,
        w_eff * lx * lx, w_eff * lx * ly, w_eff * lx * lz,
        w_eff * ly * ly, w_eff * ly * lz, w_eff * lz * lz,
    ], axis=-1)                                              # (N, 11)
    if surfel_kernels.use_moment_kernel(cfg):
        mom = surfel_kernels.moment_segment_sum(payload.T, cell, n_cells)
    else:
        mom = jax.ops.segment_sum(payload, cell,
                                  num_segments=n_cells).T    # (11, C)
    cnt = mom[0]
    sw = mom[1]
    swp = mom[2:5]                                           # (3, C)
    swpp = mom[5:11]                                         # (6, C) sym6

    swn = jnp.maximum(sw, EIG_MIN)
    # Centroid back in scan-centered coordinates: local mean + cell center.
    cc_all = jnp.stack(cell_centers_from_ids(
        jnp.arange(n_cells, dtype=jnp.int32), voxel_size,
        cfg.surfel_cells_1, cfg.surfel_cells_2, cfg.surfel_cells_z,
        dtype=dt))                                           # (3, C)
    cenl = swp / swn[None]                                   # (3, C) cell-local
    cen = cenl + cc_all                                      # (3, C) centroid
    # Covariance from the LOCAL moments (shift-invariant; local form avoids
    # the scan-extent cancellation).
    cov = swpp / swn[None] - jnp.stack([
        cenl[0] * cenl[0], cenl[0] * cenl[1], cenl[0] * cenl[2],
        cenl[1] * cenl[1], cenl[1] * cenl[2], cenl[2] * cenl[2]], axis=0)
    eye6 = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], dtype=dt)[:, None]
    cov = cov + EIG_MIN * eye6

    lam = sym6p_eigvals(cov)                                 # (3, C) ascending
    normal = sym6p_eigvec(cov, lam[0])                       # (3, C)
    # Deterministic sign: face the SENSOR (normal . ray_from_sensor < 0). The
    # reference fixes sign to +z (lidar_surfel_extraction.py:130), which is
    # degenerate for vertical surfaces (walls flip scan to scan and corrupt
    # the vMF scatter); sensor-facing is stable for any surface the lidar
    # actually saw. Sensor origin in centered coords is -center.
    cen_body = cen + center[:, None]
    facing = jnp.sum(normal * cen_body, axis=0)
    normal = normal * jnp.where(facing > 0.0, -1.0, 1.0)[None]

    Sigma = cov + SENSOR_VAR * eye6
    Lam6 = sym6p_inv(Sigma, EIG_MIN)
    Lam6_reg = Lam6 + (WISHART_NU / WISHART_PSI) * eye6

    sigma_perp_sq = jnp.maximum(lam[0], EIG_MIN)
    kappa = jnp.clip(cfg.kappa_scale * KAPPA_SCALE
                     / jnp.sqrt(sigma_perp_sq), KAPPA_MIN, KAPPA_MAX)
    valid_cell = (cnt >= MIN_POINTS_PER_CELL) & (sw > 0.0)

    # Continuous planarity weighting (no gate): surface-like cells have
    # lam_min << lam_mid ~ lam_max. Mixed-surface cells (corners) and sparse
    # blobs get their mass smoothly suppressed — off-surface centroids from
    # such cells are the main source of map corruption.
    planarity = jnp.clip((lam[1] - lam[0]) / (lam[2] + EIG_MIN), 0.0, 1.0)
    sw = sw * planarity

    # Deterministic budget selection: valid cells first, ascending cell id.
    cell_ids = jnp.arange(n_cells, dtype=jnp.int32)
    key = cell_ids + (1 - valid_cell.astype(jnp.int32)) * n_cells
    S = cfg.n_surfel
    order = jnp.argsort(key)[:S]
    pad = S - min(S, n_cells)
    if pad > 0:
        order = jnp.pad(order, (0, pad))

    # Boundary densification at budget size only (S = 1024): ONE gather of
    # ALL per-cell output planes packed as rows (cen 3 | Lam6 6 | normal 3 |
    # kappa | sw | valid = 15 rows). Separate per-field gathers each cost
    # their own ~8 ns/column pass + op-sequencing slot (measured ~28 us/scan
    # across five gathers); the packed form is one pass.
    allp = jnp.concatenate([
        cen, Lam6_reg, normal, kappa[None], sw[None],
        valid_cell.astype(dt)[None]], axis=0)                # (15, C)
    g = allp[:, order]                                       # (15, S)
    pos_sel = (g[0:3] + center[:, None]).T                   # (S, 3) body frame
    Lam_sel = sym6_to_mat33(g[3:9].T)                        # (S, 3, 3)
    # theta in the BODY frame (position with the scan center restored).
    theta_sel = jnp.einsum("sij,sj->si", Lam_sel, pos_sel)
    nrm_sel = g[9:12].T
    kap_sel = g[12]
    w_sel = g[13]
    val_sel = g[14] > 0.5
    if pad > 0:
        row = jnp.arange(S) < (S - pad)
        val_sel = val_sel & row

    etas = jnp.zeros((S, cfg.vmf_n_lobes, 3), dtype=dt)
    etas = etas.at[:, 0, :].set(kap_sel[:, None] * nrm_sel)
    w_sel = jnp.where(val_sel, w_sel, 0.0)

    certs = {
        "surfel.n_valid": jnp.sum(val_sel.astype(dt)),
        "surfel.mass_total": jnp.sum(w_sel),
        "surfel.point_mass_in": w_tot,
        "surfel.mass_out_of_grid": w_tot_fin - w_tot,
        "surfel.cell_size_eff": jnp.asarray(voxel_size, dt),
        "surfel.r95_xy": jnp.asarray(r95, dt),
        "surfel.budget_overflow": jnp.maximum(
            jnp.sum(valid_cell.astype(dt)) - float(S), 0.0),
        # ExpectedEffect: predicted = point mass entering the grid (what a
        # lossless extraction would carry into surfels); realized = mass of
        # the surfels actually emitted. Divergence = mass dropped by cell
        # validity (min-occupancy/planarity) + the fixed S budget.
        "surfel.effect_predicted": w_tot,
        "surfel.effect_realized": jnp.sum(w_sel),
    }
    return {
        "Lambdas": Lam_sel,
        "thetas": theta_sel,
        "etas": etas,
        "weights": w_sel,
        "valid": val_sel,
        "positions": pos_sel,
        "normals": nrm_sel,
        "kappas": kap_sel,
    }, certs
