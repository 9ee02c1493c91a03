"""Pose recompose with Frobenius-blended BCH3 correction, chart shift, and
continuous anchor drift (parity: ``operators/recompose.py``,
``operators/anchor_drift.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from fl_slam_tpu.config import D_Z, IDX_POSE
from fl_slam_tpu.core import se3
from fl_slam_tpu.core.belief import Belief
from fl_slam_tpu.core.linalg import spd_solve_lifted


def bch3_correction(xi1, xi2):
    """0.5 [xi1, xi2] for se(3) twists in [v, omega] ordering."""
    v1, w1 = xi1[..., 0:3], xi1[..., 3:6]
    v2, w2 = xi2[..., 0:3], xi2[..., 3:6]
    w_cross = jnp.cross(w1, w2)
    v_cross = jnp.cross(w1, v2) + jnp.cross(v1, w2)
    return 0.5 * jnp.concatenate([v_cross, w_cross], axis=-1)


def frobenius_recompose(belief_post: Belief, z_lin, total_trigger_magnitude, *,
                        c_frob: float, eps_lift: float):
    """delta_z* = (L+eps)^{-1} h; s = mag/(mag+c); BCH3 vs the in-chart
    linearization offset; X_new = X_anchor o Exp(delta_corrected); then a chart
    shift h' = h - L shift preserving non-pose components.

    Returns (belief_new, z_lin_new, delta_pose_corrected, dz_new, certs) —
    ``dz_new`` is the post-shift mean increment solve(L, h_new) = dz - shift
    (exact up to the O(eps_lift) lift), handed to ``anchor_drift_update`` so
    the drift step does not repeat the 22x22 solve.
    """
    dz, _ = spd_solve_lifted(belief_post.L, belief_post.h, eps_lift)
    delta_pose = dz[IDX_POSE]
    strength = total_trigger_magnitude / (total_trigger_magnitude + c_frob)
    corr = bch3_correction(z_lin[IDX_POSE], delta_pose)
    delta_corr = delta_pose + strength * corr

    X_new = se3.pose7_plus(belief_post.anchor, delta_corr)

    shift = jnp.zeros((D_Z,), dtype=dz.dtype).at[IDX_POSE].set(delta_corr)
    z_lin_new = z_lin - shift
    dz_new = dz - shift
    h_new = belief_post.h - belief_post.L @ shift

    belief_new = Belief(L=belief_post.L, h=h_new, anchor=X_new)
    certs = {
        "recompose.frobenius_strength": strength,
        "recompose.bch_norm": jnp.linalg.norm(corr),
        "recompose.pose_increment_norm": jnp.linalg.norm(delta_corr),
        # ExpectedEffect: pose shift the solve requested vs the shift applied
        # after the Frobenius-blended BCH correction (certificates.py:348-510).
        "recompose.effect_predicted": jnp.linalg.norm(delta_pose),
        "recompose.effect_realized": jnp.linalg.norm(delta_corr),
    }
    return belief_new, z_lin_new, delta_corr, dz_new, certs


def anchor_drift_update(belief: Belief, z_lin, *, m0: float, r0: float,
                        eps_lift: float, dz=None):
    """Continuous re-anchoring: rho = clip(max(|dt|/M0, |dtheta|/R0), 0, 1);
    anchor absorbs rho of the pose increment; z_lin scales by (1 - rho);
    h re-derived so mean is preserved (anchor_drift.py:64-191).

    ``dz`` may be passed in when the caller already knows the mean increment
    (the recompose step returns it); otherwise it is solved here.

    Returns (belief_new, z_lin_new, certs).
    """
    if dz is None:
        dz, _ = spd_solve_lifted(belief.L, belief.h, eps_lift)
    delta_pose = dz[IDX_POSE]
    drift_m = jnp.linalg.norm(delta_pose[0:3])
    drift_r = jnp.linalg.norm(delta_pose[3:6])
    rho = jnp.clip(jnp.maximum(drift_m / m0, drift_r / r0), 0.0, 1.0)

    X_new = se3.pose7_plus(belief.anchor, rho * delta_pose)
    z_lin_new = (1.0 - rho) * dz
    h_new = belief.L @ z_lin_new

    belief_new = Belief(L=belief.L, h=h_new, anchor=X_new)
    certs = {"anchor.rho": rho, "anchor.drift_m": drift_m,
             "anchor.drift_r": drift_r,
             # ExpectedEffect: in-chart increment the drift absorbs vs the
             # SE(3) displacement the anchor actually made; divergence =
             # exp-map curvature over the absorbed increment.
             "anchor.effect_predicted": rho * jnp.linalg.norm(delta_pose),
             "anchor.effect_realized": jnp.linalg.norm(
                 se3.pose7_minus(X_new, belief.anchor))}
    return belief_new, z_lin_new, certs
