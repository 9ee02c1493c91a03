"""Multi-chip batched replay: N independent SLAM instances over a device mesh.

This is the v5e-8 "batched replay" configuration from BASELINE.json: instances
(different bags / noise seeds / hypothesis banks) are data-parallel with NO
cross-instance communication, so the sharding is a pure leading-axis split
over a 1-D mesh and XLA compiles the whole thing without collectives (the
only collective in practice is the end-of-run gather of per-instance metrics,
which happens implicitly when the host reads the outputs).

The reference has no distributed execution at all (single process + ROS
threads, SURVEY.md section 2.6); this module is the TPU-native replacement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.pipeline import PipelineState, ScanInput, init_state, process_scan


def make_mesh(devices=None, axis: str = "inst") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis,))


def init_states_batched(cfg: GCConfig, n_instances: int,
                        anchors0=None, t0: float = 0.0,
                        n_devices: int = 1,
                        staged_bytes: int = 0) -> PipelineState:
    """Stacked PipelineState with a leading instance axis.

    Fails fast with a sized message when ``n_instances / n_devices``
    instances cannot fit one device's HBM (certs.assert_memory_envelope —
    the measured v5e density limit is 8 instances/chip at the production
    config; PERF_NOTES round 3)."""
    from fl_slam_tpu.certs import assert_memory_envelope
    per_dev = -(-n_instances // max(1, n_devices))   # ceil
    assert_memory_envelope(cfg, per_dev,
                           staged_bytes=staged_bytes // max(1, n_devices))

    def one(i):
        anchor = None if anchors0 is None else anchors0[i]
        return init_state(cfg, anchor0=anchor, t0=t0)
    states = [one(i) for i in range(n_instances)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def batched_step(cfg: GCConfig, mesh: Mesh, axis: str = "inst",
                 donate: bool = True):
    """One vmapped scan step, instance axis sharded over the mesh.

    Returns a jitted fn(states, scans) -> (states', outputs) where every leaf
    of states/scans carries a leading instance axis laid out on the mesh.

    NOTE: like the single-instance carry, the returned states' ``atlas`` pool
    is STALE for the active tiles (the truth is in the resident slabs). Any
    reader of ``states.atlas`` (export, metrics) must first reconcile with
    ``flush_states_batched`` — ``batched_replay`` does it for you.
    """
    # Kernels stay ON under the instance vmap (round-3 fix): the round-2
    # "failed to legalize 'func.return'" Mosaic failure was the DEFAULT
    # BlockSpec index maps tracing i64 literals under x64 when jax's
    # batching rule composes them — every kernel now carries explicit i32
    # index maps (and the slab-DMA kernel a custom_vmap instance rule), so
    # the batched programs lower natively.

    def step(states, scans):
        return jax.vmap(lambda s, sc: process_scan(s, sc, cfg))(states, scans)

    shard = NamedSharding(mesh, P(axis))
    kw = dict(donate_argnums=(0,)) if donate else {}
    return jax.jit(step, in_shardings=(shard, shard),
                   out_shardings=(shard, shard), **kw)


def batched_replay(cfg: GCConfig, mesh: Mesh, axis: str = "inst"):
    """Full lax.scan replay over time, vmapped over sharded instances.

    scans: ScanInput with leading axes (n_instances, T, ...).
    """
    # Kernels ON under the instance vmap — see batched_step note.
    # Dense-page insert under batching: the drop-mode scattered-column
    # insert costs a full-ff layout round trip per scan once vmapped
    # (no bitcast exists for (B, CF, SM) -> (B*SM, CF)); the dense page
    # write-back goes through the contiguous-page DMA kernel instead
    # (atlas_kernels.page_writeback_ff). Measured 10.2 -> 7.9 ms per
    # 8-instance step. Single-instance keeps drop mode (measured faster
    # there — commit b53f4b9).
    cfg = cfg.replace(insert_page_dense=True)

    def run(states, scans):
        # vmap the SAME chunked replay driver as the single-instance bench:
        # round-3 bisect showed the earlier hand-rolled lax.scan(process_scan)
        # ran at the R=1 reference cadence, paying the per-chunk map
        # maintenance (view selection sorts + slab gathers over the ~360 MB
        # field block) EVERY scan — the dominant share of the 17x per-instance
        # slowdown (21.6 ms vs 1.26 ms single). ``replay`` amortizes it to
        # 1/view_refresh_every and already ends with flush_slabs, so the
        # returned pools are reconciled.
        from fl_slam_tpu.pipeline import replay
        return jax.vmap(lambda s, sc: replay(s, sc, cfg))(states, scans)

    shard = NamedSharding(mesh, P(axis))
    # Donate the input states: without it the input AND output instance
    # pools are live simultaneously (~2x instances x ~450 MB) — measured
    # RESOURCE_EXHAUSTED at 8 instances on one v5e without donation.
    return jax.jit(run, in_shardings=(shard, shard),
                   out_shardings=(shard, shard), donate_argnums=(0,))


def flush_states_batched(states: PipelineState) -> PipelineState:
    """Reconcile every instance's pool with its resident slabs (required
    before reading ``states.atlas`` after ``batched_step`` loops)."""
    from fl_slam_tpu.pipeline import flush_slabs
    return jax.vmap(flush_slabs)(states)


def shard_scan_inputs(scans: ScanInput, mesh: Mesh, axis: str = "inst"):
    shard = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, shard), scans)
