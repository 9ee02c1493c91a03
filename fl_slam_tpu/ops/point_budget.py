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
    # PHASED stride: idx = s*k + (k mod s), not s*k. The plain stride
    # aliases with the VLP-16 wire interleave (az-major, 16 lasers per
    # azimuth block): 28.8k -> 8192 is stride 4, which keeps rings
    # {0,4,8,12} = the four DOWNWARD beams (-15..-3 deg) and discards the
    # entire upper half of the scan — vertical constraints degenerate
    # (measured 0.70 m ATE on the dense Kimera fixture). The k mod s phase
    # walks all residues, so consecutive selections cycle every ring while
    # staying deterministic, in-order, fixed-shape and mass-preserving
    # (idx = s*k + (k mod s) <= s*(k+1) - 1 < n_in). s=1 is unchanged.
    # (idx <= s*(k+1)-1 < n_in when s divides n_in; ragged tails clip to
    # the last point — a duplicate selection the mass rescale absorbs)
    k = jnp.arange(-(-n_in // stride))[:n_cap]
    idx = jnp.minimum(stride * k + (k % stride), n_in - 1)
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
