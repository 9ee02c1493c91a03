"""Certificate system: numeric per-scan audit scalars (parity: reference
``common/certificates.py`` CertBundle/ExpectedEffect + ``aggregate_certificates``
+ ``MinimalScanTape`` + ``common/runtime_counters.py``).

TPU-first redesign (SURVEY.md section 7.1 delta 4): the reference's CertBundle
is a Python object tree whose fields are pulled to the host with ``float()``
mid-scan — the single biggest structural performance bug the survey flags.
Here every operator already returns a flat dict of DEVICE scalars with
namespaced keys ("odom_pose.nll_proxy", "map.fused_mass", ...); this module
gives that stream the reference's audit semantics:

  - a fixed CATEGORY schema mapping key prefixes to the reference's cert
    families (conditioning / support / mismatch / influence / compute / ot /
    map_update / excitation / approximation-triggers);
  - ``aggregate``: per-scan reductions (device-side, jit-safe) mirroring
    ``aggregate_certificates``;
  - ``compute_budget``: STATIC shape/alloc declarations derived from the
    config — the fixed-cost contract checked by budget-assertion tests
    (parity: spec section 12.9.1 / test_budget_assertions.py). Since budgets
    are compile-time constants here, the "runtime counters" of the reference
    (transfer bytes, recompiles) are compile-time facts: one H2D staging
    transfer per replay, one compiled program, zero in-loop syncs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fl_slam_tpu.config import D_Z, GCConfig

# Key-prefix -> cert family (reference CertBundle sub-certs).
CATEGORY_OF_PREFIX = {
    "predict": "conditioning",
    "fusion": "conditioning",
    "hyp": "conditioning",
    "iw_process": "conditioning",
    "iw_meas": "conditioning",
    "odom_pose": "mismatch",
    "odom_vel": "mismatch",
    "odom_wz": "mismatch",
    "odom_kin": "mismatch",
    "odom": "influence",
    "planar_z": "mismatch",
    "planar_vz": "mismatch",
    "planar": "mismatch",
    "imu_grav": "support",
    "imu_gyro": "mismatch",
    "imu_preint": "mismatch",
    "imu_ba": "mismatch",
    "imu": "support",
    "deskew": "influence",
    "point_budget": "support",
    "surfel": "support",
    "ot": "ot",
    "visual": "mismatch",
    "map": "map_update",
    "atlas": "map_update",
    "temper": "influence",
    "exc": "excitation",
    "recompose": "influence",
    "anchor": "influence",
}

# Keys whose magnitudes are approximation TRIGGERS (reference:
# approximation_triggers != empty => frobenius_applied).
TRIGGER_KEYS = (
    "predict.psd_projection",
    "fusion.psd_projection",
    "imu_grav.psd_projection",
    "hyp.psd_projection",
    "recompose.bch_norm",
    "iw_process.psd_projection",
    "iw_meas.psd_projection",
)

NLL_SUFFIX = ".nll_proxy"

# ExpectedEffect pairs (parity: reference ``ExpectedEffect{objective_name,
# predicted, realized}``, certificates.py:348-510): each major operator emits
# "<op>.effect_predicted" / "<op>.effect_realized" device scalars; their
# divergence is the operator's realized approximation error (PSD projection,
# Frobenius damping, budget caps, mask shrink). ``aggregate`` sums |p - r|.
EFFECT_SUFFIX_P = ".effect_predicted"
EFFECT_SUFFIX_R = ".effect_realized"

# The FULL ExpectedEffect registry: every runtime operator emits a
# predicted/realized pair (reference contract: every operator returns
# (result, CertBundle, ExpectedEffect) — certificates.py:348-510,
# docs/OPERATOR_CONTRACTS.md:3). run_eval and the cert-schema tests assert
# the replay's pairs cover EXACTLY this set — a new operator without a pair,
# or a dropped pair, fails the gate (the round-2 ``>= 6 pairs`` gate was
# trivially satisfiable).
EXPECTED_EFFECT_OPS = (
    "predict",
    "deskew",
    "surfel",
    "odom_pose", "odom_vel", "odom_wz", "odom_kin",
    "imu_grav", "imu_gyro", "imu_preint", "imu_ba",
    "planar",
    "ot",
    "visual",
    "fusion",
    "recompose",
    "anchor",
    "hyp",
    "iw_process", "iw_meas",
    "map", "map.insert",
)


def effect_pairs(certs: dict) -> dict:
    """{op: (predicted, realized)} for every complete effect pair present."""
    out = {}
    for k in certs:
        if k.endswith(EFFECT_SUFFIX_P):
            op = k[: -len(EFFECT_SUFFIX_P)]
            kr = op + EFFECT_SUFFIX_R
            if kr in certs:
                out[op] = (certs[k], certs[kr])
    return out


def category(key: str) -> str:
    return CATEGORY_OF_PREFIX.get(key.split(".", 1)[0], "other")


def aggregate(certs: dict) -> dict:
    """Per-scan aggregate scalars (device-side; parity:
    aggregate_certificates, certificates.py:511)."""
    z = jnp.zeros(())
    trig = sum((certs[k] for k in TRIGGER_KEYS if k in certs), z)
    nll = sum((v for k, v in certs.items() if k.endswith(NLL_SUFFIX)), z)
    lift = sum((v for k, v in certs.items() if k.endswith(".lift")), z)
    proj = sum((v for k, v in certs.items()
                if k.endswith(".psd_projection")), z)
    out = {
        "agg.trigger_magnitude": trig,
        "agg.nll_total": nll,
        "agg.lift_total": lift,
        "agg.psd_projection_total": proj,
        "agg.frobenius_applied": (trig > 0).astype(jnp.float32),
        "agg.effect_divergence": sum(
            (jnp.abs(p - r) for p, r in effect_pairs(certs).values()), z),
    }
    if "predict.cond" in certs:
        out["agg.cond_max"] = jnp.maximum(certs["predict.cond"],
                                          certs.get("fusion.cond_pose6", z))
    if "ot.ess" in certs:
        out["agg.ess_total"] = certs["ot.ess"] + certs.get("imu.ess_int", z)
    return out


def compute_budget(cfg: GCConfig) -> dict:
    """STATIC compute/allocation declarations (the fixed-cost contract).

    Every entry is a compile-time constant; budget-assertion tests pin these
    (parity: test_budget_assertions.py asserting ComputeCert shapes/allocs).
    """
    itemsize = jnp.dtype(cfg.jdtype).itemsize
    n_meas = cfg.n_meas
    view = cfg.n_active_tiles * cfg.m_tile_view
    pool_prims = cfg.n_tiles_pool * cfg.m_tile
    slab_prims = cfg.n_active_tiles * cfg.m_tile
    atlas_bytes = pool_prims * (
        9 + 3 + 3 * cfg.vmf_n_lobes + 1 + 1 + 1 + 3 + 1 + 3) * itemsize \
        + pool_prims * (4 + 4 + 8 + 1)
    return {
        "largest_tensor_shape": (cfg.n_tiles_pool, cfg.m_tile, 3, 3),
        "assoc_cost_shape": (n_meas, view),
        "assoc_cost_bytes": n_meas * view * itemsize,
        "slab_bytes_per_field9": slab_prims * 9 * itemsize,
        "atlas_bytes_est": int(atlas_bytes),
        "segment_sum_k": cfg.k_assoc,
        "sinkhorn_iters": cfg.k_sinkhorn,
        "points_cap": cfg.n_points,
        "imu_len": cfg.imu_len,
        "merge_pairs_per_scan": cfg.k_merge_pairs * cfg.n_active_tiles,
        "merge_pairwise_shape": (cfg.n_active_tiles,
                                 min(cfg.merge_max_tile, cfg.m_tile),
                                 min(cfg.merge_max_tile, cfg.m_tile)),
        "state_dim": D_Z,
        "h2d_transfers_per_replay": 1,   # single staged device_put
        "host_syncs_per_scan": 0,        # certs stay on device
        "jit_programs": 1,               # one lax.scan over the bag
    }


def pytree_bytes(tree) -> int:
    """Total bytes of a pytree of arrays or ShapeDtypeStructs."""
    import numpy as np
    return sum(int(np.prod(l.shape)) * jnp.dtype(l.dtype).itemsize
               for l in jax.tree.leaves(tree))


#: HBM per device by kind substring (jax Device.device_kind, lowercased).
#: memory_stats() returns None on the tunneled axon platform, so the limit
#: comes from this table (override: GC_HBM_BYTES env or limit_bytes arg).
_HBM_BY_KIND = (
    ("v5 lite", 16_000_000_000), ("v5e", 16_000_000_000),
    ("v5p", 95_000_000_000), ("v4", 32_000_000_000),
    ("v6", 32_000_000_000), ("v3", 16_000_000_000),
)


def device_hbm_bytes(device=None) -> int | None:
    """Usable HBM of ``device`` (default backend device 0), or None when
    unknown (CPU hosts). Prefers live memory_stats over the kind table."""
    import os
    env = os.environ.get("GC_HBM_BYTES")
    if env:
        return int(float(env))
    if device is None:
        devs = jax.devices()
        if not devs or devs[0].platform == "cpu":
            return None
        device = devs[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if stats and stats.get("bytes_limit"):
        return int(stats["bytes_limit"])
    kind = getattr(device, "device_kind", "").lower()
    for key, nbytes in _HBM_BY_KIND:
        if key in kind:
            return nbytes
    return None


def memory_envelope(cfg: GCConfig, n_instances: int = 1,
                    staged_bytes: int = 0) -> dict:
    """Per-device HBM envelope for an ``n_instances``-on-one-chip replay.

    ``state_bytes`` is EXACT (jax.eval_shape over init_state — no device
    allocation); the peak model is an engineering envelope calibrated on the
    measured v5e density limit (PERF_NOTES round 3: 8 instances x ~470 MB
    states run, 16 RESOURCE_EXHAUSTED at init):

        peak ≈ n_inst * 2.5 * state_bytes + staged_bytes

    2.5 = live state (1x) + init-stack / replay-donation transient (1x)
    + working set of outputs and scatter temporaries (~0.5x). 8 instances
    -> ~9.6 GB (fits 16 GB), 16 -> ~19 GB (correctly over).
    """
    from fl_slam_tpu.pipeline import init_state
    state = pytree_bytes(jax.eval_shape(lambda: init_state(cfg)))
    peak = int(n_instances * 2.5 * state) + int(staged_bytes)
    return {"state_bytes": int(state), "n_instances": int(n_instances),
            "staged_bytes": int(staged_bytes), "peak_bytes_est": peak}


def assert_memory_envelope(cfg: GCConfig, n_instances: int = 1,
                           staged_bytes: int = 0, device=None,
                           limit_bytes: int | None = None) -> dict:
    """Fail fast — BEFORE touching the device — when the estimated peak
    exceeds the device HBM (parity: the reference's fail-fast budget
    validation ethos, backend_node.py:548-586). Returns the envelope dict;
    no-op check when the limit is unknown (CPU hosts without override)."""
    env = memory_envelope(cfg, n_instances, staged_bytes)
    limit = limit_bytes if limit_bytes is not None else \
        device_hbm_bytes(device)
    env["limit_bytes"] = limit
    if limit is not None and env["peak_bytes_est"] > limit:
        per = env["state_bytes"] / 1e9
        fit = max(1, int((limit - staged_bytes) / (2.5 * env["state_bytes"])))
        raise ValueError(
            f"memory envelope exceeded: {n_instances} instances x "
            f"{per:.2f} GB state (peak est {env['peak_bytes_est']/1e9:.1f} GB"
            f" incl. {staged_bytes/1e9:.2f} GB staged scans) > device HBM "
            f"{limit/1e9:.1f} GB; max instances/device at this config ~{fit}."
            " Shrink the map pool (n_tiles_pool/m_tile), stage fewer scans"
            " per segment, or spread instances over more chips.")
    return env


def tape_schema(certs: dict) -> tuple:
    """Stable, sorted key schema of a scan's cert dict (parity:
    MinimalScanTape field list; tested for schema stability)."""
    return tuple(sorted(certs.keys()))
