"""Evidence tempering, excitation scaling, trust alpha, and additive fusion.

Parity: ``operators/fusion.py``, ``operators/excitation.py``, and the power
tempering control law inlined at ``pipeline.py:1038-1148``.
"""

from __future__ import annotations

import jax.numpy as jnp

from fl_slam_tpu.config import IDX_DT, IDX_EX, IDX_POSE, IDX_VEL
from fl_slam_tpu.core.belief import Belief
from fl_slam_tpu.core.linalg import project_psd, psd_guard


def power_tempering_beta(L_evidence_raw, ess_total, exc_total, *,
                         power_beta_min: float, power_beta_z_c: float,
                         power_beta_exc_c: float, eps_mass: float):
    """Closed-form tempering beta in [beta_min, 1] from observability sentinels.

    Sentinels from the *raw* evidence (no fixed point): dt asymmetry between the
    dt<->pose and dt<->vel couplings, z/xy information ratio, ESS-to-excitation
    (pipeline.py:1069-1117).
    """
    eps = eps_mass
    dt_pose = (jnp.linalg.norm(L_evidence_raw[IDX_DT, IDX_POSE])
               + jnp.linalg.norm(L_evidence_raw[IDX_POSE, IDX_DT]))
    dt_vel = (jnp.linalg.norm(L_evidence_raw[IDX_DT, IDX_VEL])
              + jnp.linalg.norm(L_evidence_raw[IDX_VEL, IDX_DT]))
    dt_asym = jnp.clip(jnp.abs(dt_vel - dt_pose) / (dt_vel + dt_pose + eps), 0.0, 1.0)

    L_xx = jnp.abs(L_evidence_raw[0, 0])
    L_yy = jnp.abs(L_evidence_raw[1, 1])
    L_zz = jnp.abs(L_evidence_raw[2, 2])
    z_to_xy = L_zz / (0.5 * (L_xx + L_yy) + eps)

    ess_to_exc = ess_total / (exc_total + eps)
    s_dt = dt_asym
    s_z = z_to_xy / (z_to_xy + power_beta_z_c)
    s_exc = 1.0 / (1.0 + ess_to_exc / power_beta_exc_c)
    s = jnp.clip(s_dt * s_z * s_exc, 0.0, 1.0)
    beta = jnp.clip(power_beta_min + (1.0 - power_beta_min) * s,
                    power_beta_min, 1.0)
    certs = {"temper.beta": beta, "temper.dt_asymmetry": dt_asym,
             "temper.z_to_xy": z_to_xy}
    return beta, certs


def excitation_scales(L_evidence, L_prior, eps: float):
    """s = e / (e + pi + eps) for the dt scalar and extrinsic trace
    (excitation.py:14-35)."""
    e_dt = L_evidence[IDX_DT.start, IDX_DT.start]
    e_ex = jnp.trace(L_evidence[IDX_EX, IDX_EX])
    pi_dt = L_prior[IDX_DT.start, IDX_DT.start]
    pi_ex = jnp.trace(L_prior[IDX_EX, IDX_EX])
    s_dt = e_dt / (e_dt + pi_dt + eps)
    s_ex = e_ex / (e_ex + pi_ex + eps)
    return s_dt, s_ex


def apply_excitation_prior_scaling(L_prior, h_prior, s_dt, s_ex):
    """Scale dt/extrinsic rows+cols of the prior by (1 - s) (excitation.py:37-64)."""
    a_dt = 1.0 - s_dt
    a_ex = 1.0 - s_ex
    L = L_prior
    h = h_prior
    L = L.at[IDX_DT, :].set(a_dt * L[IDX_DT, :])
    L = L.at[:, IDX_DT].set(a_dt * L[:, IDX_DT])
    h = h.at[IDX_DT].set(a_dt * h[IDX_DT])
    L = L.at[IDX_EX, :].set(a_ex * L[IDX_EX, :])
    L = L.at[:, IDX_EX].set(a_ex * L[:, IDX_EX])
    h = h.at[IDX_EX].set(a_ex * h[IDX_EX])
    return L, h


def fusion_alpha(cond_pose6, ess_total, nll_per_ess, dt_asym, z_to_xy,
                 exc_total, power_beta, *, alpha_min: float, alpha_max: float,
                 c0_cond: float, eps_mass: float):
    """Continuous trust alpha from quality signals (fusion.py:46-142).

    With the reference's alpha_min = alpha_max = 1.0 this is constant 1.0; the
    full control law is kept so the knob is real.
    """
    cond_q = c0_cond / (cond_pose6 + c0_cond)
    support_q = ess_total / (ess_total + 1.0)
    mismatch_q = jnp.exp(-nll_per_ess)
    dt_q = jnp.clip(dt_asym, 0.0, 1.0)
    z_q = jnp.clip(z_to_xy / (z_to_xy + 1.0), 0.0, 1.0)
    exc_q = jnp.clip(exc_total / (exc_total + 1.0), 0.0, 1.0)
    quality = (jnp.sqrt(cond_q * support_q) * mismatch_q * dt_q * z_q * exc_q
               * jnp.clip(power_beta, 0.0, 1.0))
    alpha = jnp.clip(alpha_min + (alpha_max - alpha_min) * quality,
                     alpha_min, alpha_max)
    return alpha


def info_fusion_additive(belief_pred: Belief, L_evidence, h_evidence, alpha, *,
                         eps_psd: float):
    """L_post = L_pred + alpha L_ev (PSD-projected); h likewise (fusion.py:150-230)."""
    L_post, proj = psd_guard(belief_pred.L + alpha * L_evidence, eps_psd)
    h_post = belief_pred.h + alpha * h_evidence
    trace_inc = jnp.trace(L_post) - jnp.trace(belief_pred.L)
    certs = {
        "fusion.alpha": alpha * jnp.ones((), L_post.dtype),
        "fusion.psd_projection": proj,
        "fusion.trace_increase": trace_inc,
        # ExpectedEffect: predicted information gain tr(alpha L_ev) vs the
        # gain realized after PSD projection (certificates.py:348-510);
        # divergence = the projection's bite.
        "fusion.effect_predicted": alpha * jnp.trace(L_evidence),
        "fusion.effect_realized": trace_inc,
    }
    return belief_pred._replace(L=L_post, h=h_post), certs


def pose6_conditioning(L_evidence, eps_cond: float):
    """Exact pose-block conditioning for trust alpha (pipeline.py:1156-1180)."""
    Lp = 0.5 * (L_evidence[IDX_POSE, IDX_POSE]
                + L_evidence[IDX_POSE, IDX_POSE].T)
    Lp = jnp.nan_to_num(Lp, nan=0.0, posinf=0.0, neginf=0.0)
    lam = jnp.linalg.eigvalsh(Lp)
    lam = jnp.maximum(jnp.nan_to_num(lam, nan=eps_cond), eps_cond)
    return lam[-1] / lam[0]
