"""Checkpoint / resume for the full pipeline state.

The reference has NO belief-state checkpointing (SURVEY.md section 5:
"Checkpoint/resume: none"; only post-hoc artifacts). Here the whole
``PipelineState`` — hypothesis bank, IW noise states, the atlas map pool,
scan clock — is a pytree of arrays, so checkpointing is a flatten + npz and
resume reproduces the exact replay continuation (tested bit-exact).
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_state(path: str, state) -> None:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like):
    """Load into the structure of ``like`` (an example PipelineState, e.g.
    from ``init_state`` with the same config)."""
    import jax.numpy as jnp
    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        ref = leaves_like[i]
        leaves.append(jnp.asarray(arr, dtype=ref.dtype))
        if arr.shape != tuple(ref.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected "
                f"{tuple(ref.shape)} (config mismatch?)")
    return jax.tree.unflatten(treedef, leaves)
