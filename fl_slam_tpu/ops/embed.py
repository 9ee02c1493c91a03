"""Helpers to embed small-block Gaussian factors into the 22D chart."""

from __future__ import annotations

import jax.numpy as jnp

from fl_slam_tpu.config import D_Z


def evidence_from_block(block: slice, L_small, h_small, dtype):
    """Return (L22, h22) with one diagonal block factor installed."""
    L = jnp.zeros((D_Z, D_Z), dtype=dtype).at[block, block].set(L_small)
    h = jnp.zeros((D_Z,), dtype=dtype).at[block].set(h_small)
    return L, h


def evidence_from_scalar(idx: int, precision, residual, dtype):
    L = jnp.zeros((D_Z, D_Z), dtype=dtype).at[idx, idx].set(precision)
    h = jnp.zeros((D_Z,), dtype=dtype).at[idx].set(precision * residual)
    return L, h
