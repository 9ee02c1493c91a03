"""Deterministic mass-preserving point budget resample
(parity: ``operators/point_budget.py:50-221``).

Static-shape contract: input length and cap are compile-time constants, so the
stride and selected count are Python ints and the op is a pure gather + pad.
"""

from __future__ import annotations

import jax.numpy as jnp


def point_budget_resample(points, timestamps, weights, n_cap: int,
                          eps_mass: float = 1e-12):
    """Stride-subsample to <= n_cap points, rescale weights to preserve mass,
    zero-pad to exactly n_cap. Returns (points, timestamps, weights, certs)."""
    n_in = points.shape[0]
    stride = max(1, -(-n_in // n_cap))  # ceil
    idx = jnp.arange(0, n_in, stride)
    n_sel = idx.shape[0]

    total_in = jnp.sum(weights)
    w_sel = weights[idx]
    mass_scale = total_in / (jnp.sum(w_sel) + eps_mass)

    p_out = jnp.zeros((n_cap, 3), dtype=points.dtype).at[:n_sel].set(points[idx])
    t_out = jnp.zeros((n_cap,), dtype=timestamps.dtype).at[:n_sel].set(timestamps[idx])
    w_out = jnp.zeros((n_cap,), dtype=weights.dtype).at[:n_sel].set(w_sel * mass_scale)

    w_norm = w_out / (total_in + eps_mass)
    ess = 1.0 / jnp.sum(w_norm * w_norm + eps_mass)
    certs = {
        "point_budget.n_selected": jnp.asarray(n_sel, jnp.float32),
        "point_budget.total_mass": total_in,
        "point_budget.ess": ess,
    }
    return p_out, t_out, w_out, certs
