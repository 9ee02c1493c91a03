"""Checkpoint / resume for the full pipeline state.

The reference has NO belief-state checkpointing (SURVEY.md section 5:
"Checkpoint/resume: none"; only post-hoc artifacts). Here the whole
``PipelineState`` — hypothesis bank, IW noise states, the atlas map pool,
scan clock — is a pytree of arrays, so checkpointing is a flatten + npz and
resume reproduces the exact replay continuation (tested bit-exact).

The checkpoint embeds the producing ``GCConfig`` (every budget is a shape
fact) and ``load_state`` validates it against the resuming config field by
field — a restore under a different config fails with the exact mismatch
list, not by shape accident.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np


def _config_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), sort_keys=True)


def save_state(path: str, state, cfg=None) -> None:
    """Save a PipelineState (and the config that shaped it, when given)."""
    leaves, _ = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if cfg is not None:
        arrays["__config__"] = np.frombuffer(
            _config_json(cfg).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like, cfg=None):
    """Load into the structure of ``like`` (an example PipelineState, e.g.
    from ``init_state`` with the same config).

    When both the checkpoint and the caller carry a config, they must match
    exactly (budgets are compile-time shape contracts; a silent mismatch
    would at best recompile and at worst mis-slice the restored arrays).
    """
    import jax.numpy as jnp
    data = np.load(path)
    if cfg is not None and "__config__" in data:
        saved = json.loads(bytes(data["__config__"]).decode())
        current = json.loads(_config_json(cfg))
        diff = {k: (saved.get(k), current.get(k))
                for k in set(saved) | set(current)
                if saved.get(k) != current.get(k)}
        if diff:
            raise ValueError(
                f"checkpoint config mismatch (saved vs current): {diff}")
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        ref = leaves_like[i]
        if arr.shape != tuple(ref.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected "
                f"{tuple(ref.shape)} (config mismatch?)")
        leaves.append(jnp.asarray(arr, dtype=ref.dtype))
    return jax.tree.unflatten(treedef, leaves)
