"""Planar ground-robot soft priors (parity: ``operators/planar_prior.py``)."""

from __future__ import annotations

from fl_slam_tpu.config import IDX_TRANS, IDX_VEL
from fl_slam_tpu.ops.embed import evidence_from_scalar


def planar_z_prior(z_pred, z_ref: float, sigma_z: float, dtype):
    """Soft z = z_ref, precision 1/sigma_z^2 at trans z (index 2)."""
    precision = 1.0 / (sigma_z * sigma_z)
    r_z = z_ref - z_pred
    L, h = evidence_from_scalar(IDX_TRANS.start + 2, precision, r_z, dtype)
    return L, h, {"planar_z.nll_proxy": 0.5 * r_z * r_z * precision}


def velocity_z_prior(vz_pred, sigma_vz: float, dtype):
    """Soft v_z = 0, precision 1/sigma_vz^2 at vel z (index 8)."""
    precision = 1.0 / (sigma_vz * sigma_vz)
    r_vz = -vz_pred
    L, h = evidence_from_scalar(IDX_VEL.start + 2, precision, r_vz, dtype)
    return L, h, {"planar_vz.nll_proxy": 0.5 * r_vz * r_vz * precision}
