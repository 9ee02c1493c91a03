"""22D information-form belief over chart GC-RIGHT-01, as a JAX pytree.

Parity target: reference ``common/belief.py`` (``BeliefGaussianInfo``,
``HypothesisSet``). Differences by design:
  - a plain NamedTuple pytree (no chart-id string checks at runtime; the chart
    is a type-level convention here, asserted in tests, not per call),
  - all methods are free functions usable under jit/vmap/scan,
  - the hypothesis axis is a leading vmap axis, not a Python list.

State layout: [trans(0:3), rot(3:6), vel(6:9), bg(9:12), ba(12:15), dt(15),
ex(16:22)]; pose tangent is the first 6, updated on the right:
``world_pose = X_anchor ∘ Exp(delta_xi_pose)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fl_slam_tpu.config import D_Z, IDX_POSE
from fl_slam_tpu.core import se3
from fl_slam_tpu.core.linalg import spd_solve_lifted


class Belief(NamedTuple):
    """Information-form Gaussian: N^{-1}(h, L) over the 22D tangent at anchor.

    Fields:
      L: (..., 22, 22) information matrix.
      h: (..., 22) information vector.
      anchor: (..., 7) SE(3) anchor pose [t, quat wxyz] (world frame).
        Quaternion, NOT rotvec: the anchor compounds scan over scan, and the
        rotvec chart's per-scan exp/log round trip is ill-conditioned at the
        accumulated O(pi) rotation — it needed software-emulated f64 on TPU
        (see se3.py pose7 block). 6-vector [t, rotvec] forms are derived at
        the consumers (evidence residuals, published poses).
    """

    L: jnp.ndarray
    h: jnp.ndarray
    anchor: jnp.ndarray


def identity_belief(dtype=jnp.float64, prior_info: float = 1e-6,
                    anchor=None) -> Belief:
    """Weak identity prior at a given anchor (default: origin). ``anchor``
    accepts a 6-vector [t, rotvec] (converted) or a 7-vector [t, quat]."""
    L = jnp.eye(D_Z, dtype=dtype) * prior_info
    h = jnp.zeros((D_Z,), dtype=dtype)
    if anchor is None:
        anchor = jnp.zeros((3,), dtype=dtype)
    anchor = jnp.asarray(anchor, dtype=dtype)
    if anchor.shape[-1] == 3:
        anchor = jnp.concatenate([anchor, jnp.zeros((3,), dtype=dtype)])
    if anchor.shape[-1] == 6:
        anchor = se3.pose7_from_pose6(anchor)
    return Belief(L=L, h=h, anchor=anchor)


def mean_increment(b: Belief, eps_lift: float = 1e-9) -> jnp.ndarray:
    """delta_z* = (L + eps I)^{-1} h (total; parity: belief.py mean_increment)."""
    x, _ = spd_solve_lifted(b.L, b.h, eps_lift)
    return x


def world_pose7(b: Belief, eps_lift: float = 1e-9) -> jnp.ndarray:
    """X_anchor ∘ Exp(delta_xi_pose) as a 7-vector [t, quat] pose."""
    dz = mean_increment(b, eps_lift)
    return se3.pose7_plus(b.anchor, dz[..., IDX_POSE])


def world_pose(b: Belief, eps_lift: float = 1e-9) -> jnp.ndarray:
    """X_anchor ∘ Exp(delta_xi_pose) as a 6-vector [t, rotvec] pose
    (output/evidence form; the rotvec log runs once here, outside the
    state-compounding loop)."""
    return se3.pose6_from_pose7(world_pose7(b, eps_lift))


def world_pose7_from_increment(b: Belief, dz: jnp.ndarray) -> jnp.ndarray:
    return se3.pose7_plus(b.anchor, dz[..., IDX_POSE])


def world_pose_from_increment(b: Belief, dz: jnp.ndarray) -> jnp.ndarray:
    return se3.pose6_from_pose7(world_pose7_from_increment(b, dz))


def shift_chart(b: Belief, shift: jnp.ndarray) -> Belief:
    """Move the linearization point by ``shift`` (22D) without changing the
    distribution to first order: h' = h - L @ shift.

    Used by recompose after folding the pose increment into the anchor
    (parity: ``operators/recompose.py`` chart-shift step).
    """
    h_new = b.h - jnp.einsum("...ij,...j->...i", b.L, shift)
    return b._replace(h=h_new)


class HypothesisSet(NamedTuple):
    """K-hypothesis bank: beliefs stacked on a leading axis + weights.

    Parity: ``common/belief.py:468-529`` (weight floor, renormalization).
    """

    belief: Belief          # leaves have leading axis K
    weights: jnp.ndarray    # (K,)


def floor_and_normalize_weights(w: jnp.ndarray, floor: float) -> jnp.ndarray:
    w = jnp.maximum(w, floor)
    return w / jnp.sum(w, axis=-1, keepdims=True)
