"""Inverse-Wishart adaptive noise: process Q and per-sensor measurement Sigma.

Parity: ``backend/structures/inverse_wishart_jax.py``,
``backend/structures/measurement_noise_iw_jax.py``,
``backend/operators/inverse_wishart_jax.py``,
``backend/operators/measurement_noise_iw_jax.py``.

State layout: process noise is 7 padded 6x6 IW blocks over the 22D tangent
([trans, rot, vel, bg, ba, dt(1), ex(6)]); measurement noise is 3 3x3 blocks
([gyro PSD, accel PSD, lidar discrete m^2]). Updates are commutative suffstat
accumulations applied once per scan with per-block retention rho.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fl_slam_tpu.config import (
    GCConfig,
    IDX_BA,
    IDX_BG,
    IDX_DT,
    IDX_EX,
    IDX_ROT,
    IDX_TRANS,
    IDX_VEL,
    D_Z,
)
from fl_slam_tpu.core.linalg import (project_psd, project_psd3, psd_guard,
                                     spd_inverse_lifted, spd_solve_lifted)

_BLOCK_DIMS = (3, 3, 3, 3, 3, 1, 6)
_BLOCK_STARTS = (0, 3, 6, 9, 12, 15, 16)
_BLOCK_SLICES = (IDX_TRANS, IDX_ROT, IDX_VEL, IDX_BG, IDX_BA, IDX_DT, IDX_EX)


def _block_masks(dtype):
    rows = jnp.arange(6)[None, :] < jnp.asarray(_BLOCK_DIMS)[:, None]
    return (rows[:, :, None] & rows[:, None, :]).astype(dtype)


class ProcessNoiseIW(NamedTuple):
    nu: jnp.ndarray          # (7,)
    psi: jnp.ndarray         # (7, 6, 6) padded


class MeasurementNoiseIW(NamedTuple):
    nu: jnp.ndarray          # (3,)
    psi: jnp.ndarray         # (3, 3, 3)


def init_process_noise(cfg: GCConfig) -> ProcessNoiseIW:
    """nu = p + 1 + nu_extra; Psi = Sigma_prior * nu_extra (datasheet priors)."""
    dtype = cfg.jdtype
    dims = jnp.asarray(_BLOCK_DIMS, dtype)
    nu_extra = cfg.iw_nu_weak_add
    nu = dims + 1.0 + nu_extra
    diag = (cfg.q_trans, cfg.q_rot, cfg.q_vel, cfg.q_bg, cfg.q_ba, cfg.q_dt,
            cfg.q_ex)
    psi = jnp.zeros((7, 6, 6), dtype)
    for i, (d, s) in enumerate(zip(_BLOCK_DIMS, diag)):
        psi = psi.at[i, :d, :d].set(jnp.eye(d, dtype=dtype) * s * nu_extra)
    return ProcessNoiseIW(nu=nu, psi=psi)


def init_measurement_noise(cfg: GCConfig) -> MeasurementNoiseIW:
    dtype = cfg.jdtype
    nu_extra = cfg.iw_nu_weak_add
    nu = jnp.asarray([3.0, 3.0, 3.0], dtype) + 1.0 + nu_extra
    psi = jnp.stack([
        cfg.imu_gyro_noise_density * jnp.eye(3, dtype=dtype) * nu_extra,
        cfg.imu_accel_noise_density * jnp.eye(3, dtype=dtype) * nu_extra,
        cfg.lidar_sigma_meas * jnp.eye(3, dtype=dtype) * nu_extra,
    ])
    return MeasurementNoiseIW(nu=nu, psi=psi)


def _softplus_positive(x, eps: float = 1e-12, beta: float = 50.0):
    return jax.nn.softplus(beta * x) / beta + eps


def process_noise_to_Q(state: ProcessNoiseIW, eps_psd: float,
                       cfg: GCConfig | None = None):
    """Q = blockdiag of E[Sigma_i] = Psi_i / softplus(nu_i - p_i - 1), PSD,
    with per-block PHYSICAL CEILINGS when cfg is given: the IW adaptation is
    a positive-feedback loop and must not exceed the platform envelope (a
    continuous scale-down of the whole block preserves its shape)."""
    dtype = state.psi.dtype
    dims = jnp.asarray(_BLOCK_DIMS, dtype)
    denom = _softplus_positive(state.nu - dims - 1.0)
    blocks = state.psi / denom[:, None, None] * _block_masks(dtype)
    if cfg is not None:
        qmax = jnp.asarray([cfg.q_max_trans, cfg.q_max_rot, cfg.q_max_vel,
                            cfg.q_max_bg, cfg.q_max_ba, cfg.q_max_dt,
                            cfg.q_max_ex], dtype)
        eye6 = jnp.eye(6, dtype=dtype)
        lam_max = jnp.max(jnp.abs(blocks) * eye6, axis=(-2, -1)) \
            + jnp.sum(jnp.abs(blocks) * (1.0 - eye6), axis=(-2, -1)) / 2.0
        scale = jnp.minimum(1.0, qmax / jnp.maximum(lam_max, 1e-30))
        blocks = blocks * scale[:, None, None]
    Q = jnp.zeros((D_Z, D_Z), dtype)
    for i, (d, start) in enumerate(zip(_BLOCK_DIMS, _BLOCK_STARTS)):
        Q = Q.at[start:start + d, start:start + d].set(blocks[i, :d, :d])
    Q_psd, _ = psd_guard(Q, eps_psd)
    return Q_psd


def measurement_noise_mean(state: MeasurementNoiseIW, idx: int, eps_psd: float):
    """Operational covariance: IW mode Sigma = Psi / (nu + p + 1), always defined."""
    denom = state.nu[idx] + 3.0 + 1.0
    S, _ = psd_guard(state.psi[idx] / denom, eps_psd)
    return S


def process_suffstats(L_pred, h_pred, L_post, h_post, eps_lift: float,
                      mu_pred=None, mu_post=None):
    """dPsi = blocks of (r r^T + Sigma_post), r = mu_post - mu_pred; dnu = 1.

    Commutative across hypotheses (weighted sums accumulate). ``mu_pred`` /
    ``mu_post`` may be passed by callers that already solved them (the
    pipeline hands in the mechanized prediction mean and the recompose
    increment — two fewer serial 22x22 solves per scan).
    """
    dtype = L_pred.dtype
    if mu_pred is None:
        mu_pred, _ = spd_solve_lifted(L_pred, h_pred, eps_lift)
    if mu_post is None:
        mu_post, _ = spd_solve_lifted(L_post, h_post, eps_lift)
    Sigma_post, _ = spd_inverse_lifted(L_post, eps_lift)
    r = mu_post - mu_pred

    dpsi = jnp.zeros((7, 6, 6), dtype)
    for i, (d, sl) in enumerate(zip(_BLOCK_DIMS, _BLOCK_SLICES)):
        ri = r[sl]
        Si = Sigma_post[sl, sl]
        dpsi = dpsi.at[i, :d, :d].set(jnp.outer(ri, ri) + Si)
    dnu = jnp.ones((7,), dtype)
    return dpsi, dnu


def _smooth_nu_clip(nu_raw, nu_min, nu_max: float):
    """Smooth projection of nu into [nu_min, nu_max] (no kink)."""
    nu_floor = nu_min + jax.nn.softplus(nu_raw - nu_min)
    return nu_max - jax.nn.softplus(nu_max - nu_floor)


def process_apply_suffstats(state: ProcessNoiseIW, dpsi, dnu, cfg: GCConfig,
                            nu_max: float = 1000.0):
    """Psi <- rho Psi + dPsi (PSD per block); nu <- rho nu + dnu (smooth-clipped)."""
    dtype = state.psi.dtype
    rho = jnp.asarray([cfg.iw_rho_trans, cfg.iw_rho_rot, cfg.iw_rho_vel,
                       cfg.iw_rho_bg, cfg.iw_rho_ba, cfg.iw_rho_dt,
                       cfg.iw_rho_ex], dtype)
    psi_raw = (rho[:, None, None] * state.psi + dpsi) * _block_masks(dtype)
    psi_psd, proj = psd_guard(psi_raw, cfg.eps_psd)

    dims = jnp.asarray(_BLOCK_DIMS, dtype)
    nu_min = dims + 1.0 + cfg.iw_nu_weak_add
    nu = _smooth_nu_clip(rho * state.nu + dnu, nu_min, nu_max)
    certs = {"iw_process.psd_projection": jnp.sum(proj),
             # ExpectedEffect: scale-matrix mass the suffstats propose vs the
             # mass retained after block masking + PSD guard.
             "iw_process.effect_predicted": jnp.sum(
                 jnp.trace(dpsi, axis1=-2, axis2=-1)),
             "iw_process.effect_realized": jnp.sum(
                 jnp.trace(psi_psd - rho[:, None, None] * state.psi,
                           axis1=-2, axis2=-1))}
    return ProcessNoiseIW(nu=nu, psi=psi_psd), certs


def measurement_apply_suffstats(state: MeasurementNoiseIW, dpsi, dnu,
                                cfg: GCConfig, nu_max: float = 1000.0):
    """Same retention pattern for the (gyro, accel, lidar) blocks."""
    dtype = state.psi.dtype
    rho = jnp.asarray([cfg.iw_rho_meas_gyro, cfg.iw_rho_meas_accel,
                       cfg.iw_rho_meas_lidar], dtype)
    psi_raw = rho[:, None, None] * state.psi + dpsi
    psi_psd, proj = psd_guard(psi_raw, cfg.eps_psd)

    nu_min = jnp.asarray([3.0, 3.0, 3.0], dtype) + 1.0 + cfg.iw_nu_weak_add
    nu = _smooth_nu_clip(rho * state.nu + dnu, nu_min, nu_max)
    certs = {"iw_meas.psd_projection": jnp.sum(proj),
             # ExpectedEffect (parity with iw_process above): feed trace vs
             # the trace retained after the PSD guard.
             "iw_meas.effect_predicted": jnp.sum(
                 jnp.trace(dpsi, axis1=-2, axis2=-1)),
             "iw_meas.effect_realized": jnp.sum(
                 jnp.trace(psi_psd - rho[:, None, None] * state.psi,
                           axis1=-2, axis2=-1))}
    return MeasurementNoiseIW(nu=nu, psi=psi_psd), certs


def lidar_iw_suffstats(residuals, weights, eps_mass: float, eps_psd: float):
    """LiDAR translation suffstats: weighted average outer product (3,3)."""
    w = weights / (jnp.sum(weights) + eps_mass)
    rrT = jnp.einsum("b,bi,bj->ij", w, residuals, residuals)
    rrT, _ = psd_guard(rrT, eps_psd)
    return rrT
