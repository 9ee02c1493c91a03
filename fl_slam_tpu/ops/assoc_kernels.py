"""Pallas TPU kernel for the unbalanced-Sinkhorn iteration (ops/association).

Why a kernel: the iteration is two logsumexps over a (K, N) = (8, 1536)
potential matrix — ~50 KB that fits VMEM outright — repeated k_sinkhorn=50
times. As XLA ops (lax.scan, unroll=10) the loop costs ~90 us/scan of
attributed time plus ~300 tiny HLOs of per-op dispatch overhead in the
replay program (xplane trace, round 3): every op is far below the ~0.25 us
dispatch floor. One Pallas kernel holds the whole fixed-point loop on-chip:
the data loads once, the 50 iterations run as a hardware fori_loop with no
per-op scheduling, and the program shrinks by those ~300 HLOs.

Math parity: identical to the pure-JAX path in ``ops/association.py``
(log-domain, unbalanced exponents ua/vb, neg_cap clamp, -inf source rows);
equivalence is asserted in tests/test_tpu_kernels.py against the XLA
fallback, which remains the CPU/small-config path.

Parity anchor: reference ``operators/primitive_association.py:105-138``
(_sinkhorn_unbalanced_fixed_k_jax, fixed-iteration multiplicative form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Caps mirroring ops/association.py: potentials are clamped at -1e30 before
# scaling; "log zero" rows use a large negative finite instead of -inf so
# kernel arithmetic never forms inf - inf.
_NEG_CAP = -1e30
_LOG_ZERO = -3e38


def _sinkhorn_body(n_iter: int, ua: float, vb: float, log_b: float,
                   logKT_ref, log_a_ref, piT_ref):
    """Grid (). logKT (K, N), log_a (1, N) -> piT (K, N) transported mass.

    All scalar constants are pre-cast to the kernel dtype: with jax x64
    enabled a bare Python float becomes an f64 constant, and Mosaic has no
    lowering for the resulting f64->f32 truncf.
    """
    logKT = logKT_ref[:]                                     # (K, N)
    log_a = log_a_ref[:]                                     # (1, N)
    dt = logKT.dtype
    log_zero = jnp.asarray(_LOG_ZERO, dt)
    dead_thr = jnp.asarray(0.5 * _LOG_ZERO, dt)
    neg_cap = jnp.asarray(_NEG_CAP, dt)
    c_ua = jnp.asarray(ua, dt)
    c_vb = jnp.asarray(vb, dt)
    c_log_b = jnp.asarray(log_b, dt)
    zero = jnp.asarray(0.0, dt)
    a_dead = log_a <= dead_thr

    def one_iter(_, uv):
        log_u, log_v = uv                                    # (1, N), (K, 1)
        t = logKT + log_v                                    # (K, N)
        m = jnp.max(t, axis=0, keepdims=True)
        lse_v = m + jnp.log(jnp.sum(jnp.exp(t - m), axis=0, keepdims=True))
        log_u = c_ua * (log_a - jnp.maximum(lse_v, neg_cap))
        log_u = jnp.where(a_dead, log_zero, log_u)
        t2 = logKT + log_u                                   # (K, N)
        m2 = jnp.max(t2, axis=1, keepdims=True)
        lse_u = m2 + jnp.log(jnp.sum(jnp.exp(t2 - m2), axis=1, keepdims=True))
        log_v = c_vb * (c_log_b - jnp.maximum(lse_u, neg_cap))
        return log_u, log_v

    K = logKT.shape[0]
    init = (jnp.zeros_like(log_a), jnp.zeros((K, 1), dtype=dt))
    log_u, log_v = jax.lax.fori_loop(0, n_iter, one_iter, init)
    log_pi = log_u + logKT + log_v
    piT_ref[:] = jnp.where(log_pi > dead_thr, jnp.exp(log_pi), zero)


def sinkhorn_piT(logKT, log_a, *, n_iter: int, ua: float, vb: float,
                 log_b: float, interpret: bool = False):
    """Transported-mass matrix piT (K, N) from potentials logKT = -C^T/eps.

    log_a (N,) may contain -inf (invalid rows); those rows transport zero.
    """
    K, N = logKT.shape
    dt = logKT.dtype
    log_a2 = jnp.nan_to_num(log_a, nan=_LOG_ZERO, neginf=_LOG_ZERO,
                            posinf=0.0).reshape(1, N).astype(dt)
    # Full-array blocks with EXPLICIT i32 index maps (not the bare
    # memory_space=VMEM default): the default index map's literals trace as
    # i64 under global x64, and when jax.vmap batches this call (replicas
    # instance axis) the composed index map returns (i32, i64, i64), which
    # Mosaic cannot legalize ("failed to legalize operation 'func.return'").
    # With i32 maps the native batching rule (leading batch grid dim) works.
    full = lambda shape: pl.BlockSpec(
        shape, lambda: (jnp.int32(0),) * len(shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sinkhorn_body, int(n_iter), float(ua), float(vb),
                          float(log_b)),
        out_shape=jax.ShapeDtypeStruct((K, N), dt),
        in_specs=[full((K, N)), full((1, N))],
        out_specs=full((K, N)),
        interpret=interpret,
    )(logKT, log_a2)


def use_sinkhorn_kernel(enabled: bool) -> bool:
    return bool(enabled) and jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Fused candidate-selection kernel: proxy cost + top-k in ONE program.
#
# The XLA selection path materializes two (N, V) = (1536, 7168) matrices in
# HBM (the squared-distance matmul and the direction-cosine matmul), reads
# them back through the bucket max-reduce, and runs a (N, 128) sort_key_val —
# ~125 us/scan attributed (xplane, round 4). The cost rows are bilinear in
# per-measurement and per-candidate features, so the WHOLE proxy cost is one
# (NR, 16) @ (16, 128) MXU dot per lane chunk, computed in VMEM and never
# touching HBM; the top-k runs in the same kernel (top-2 of every 128-lane
# chunk -> top-k over the 2*V/128 survivors), replacing the bucket sort.
#
# Selection semantics match the ``select_bf16`` proxy (cosine direction term,
# recency bias, +COST_INVALID on invalid rows) at f32 precision, with recall
# ~= 1 - C(k-1,2)/(V/128)^2 (misses need >= 3 of the true top-k in one
# 128-lane chunk; ~0.99 at k=8, V=7168 vs 0.973 for the 128-bucket
# two-stage).
# The k selected candidates are re-scored EXACTLY downstream either way
# (ops/association.py), so selection noise only perturbs which near-ties
# compete in the soft OT.
#
# Parity anchor: reference candidate generation + top-K_ASSOC
# (operators/primitive_association.py:105-553); this kernel is the TPU
# lowering of that selection contract.
# ---------------------------------------------------------------------------

_COST_INVALID_K = 1.0e6


def _select_chunk_body(a_ref, b_ref, out_ref):
    """Grid (N // NR, V // 128). a (NR, 16) meas features, b (16, 128) one
    candidate lane chunk -> this chunk's top-2: vals/idx blocks (NR, 2).

    Mosaic lowering rules (probed on this jaxlib, 2026-08): tpu.iota is
    integer-only (convert for f32 index math); a lane MIN-reduce hangs the
    Mosaic compiler where the equivalent negated MAX compiles, so every
    argmin below is -max(where(mask, -iota, -big)); winner REMOVAL masks
    with ``s >= mv`` (collapsing exact-value ties — benign for candidate
    selection: tied scores are interchangeable targets and real f32 cost
    ties between distinct primitives are measure-zero) because the
    `iota == am`-masked removal also hangs the compiler. The chunk loop is
    a GRID dimension with block-mapped outputs: an unrolled in-kernel loop
    compiled for ~7 minutes, and dynamic lane stores must be 128-aligned
    ("cannot statically prove index is a multiple of 128").
    """
    A = a_ref[:]                                             # (NR, 16)
    dt = A.dtype
    NR = A.shape[0]
    nbig = jnp.asarray(_LOG_ZERO, dt)
    iota = jax.lax.broadcasted_iota(jnp.int32, (NR, 128), 1).astype(dt)
    base = jax.lax.convert_element_type(
        jax.lax.mul(pl.program_id(1), jnp.int32(128)), dt)

    s = -jnp.dot(A, b_ref[:], preferred_element_type=dt)     # (NR, 128)
    mv = jnp.max(s, axis=1, keepdims=True)                   # (NR, 1)
    am = -jnp.max(jnp.where(s >= mv, -iota, nbig), axis=1, keepdims=True)
    s2 = jnp.where(s >= mv, nbig, s)
    mv2 = jnp.max(s2, axis=1, keepdims=True)
    am2 = -jnp.max(jnp.where(s2 >= mv2, -iota, nbig), axis=1, keepdims=True)
    # Output block = one full 128-lane tile per chunk (Mosaic requires
    # 128-divisible or full-width lane blocks): lanes [mv, mv2, am, am2,
    # pad...]; XLA slices vals/idx apart outside.
    fill = jnp.full((NR, 124), _LOG_ZERO, dt)
    out_ref[:] = jnp.concatenate([mv, mv2, am + base, am2 + base, fill],
                                 axis=1)


def _select_topk_body(k: int, vals_ref, idx_ref, out_v_ref, out_i_ref):
    """Grid (N // NR,). Top-k over the (NR, P) stage-1 survivors (P lanes,
    pad lanes pre-filled with _LOG_ZERO outside)."""
    v = vals_ref[:]
    gi = idx_ref[:]
    dt = v.dtype
    nbig = jnp.asarray(_LOG_ZERO, dt)
    for j in range(k):
        mv = jnp.max(v, axis=1, keepdims=True)
        on = v >= mv
        gj = -jnp.max(jnp.where(on, -gi, nbig), axis=1, keepdims=True)
        out_v_ref[:, j:j + 1] = mv
        out_i_ref[:, j:j + 1] = gj
        v = jnp.where(on, nbig, v)


def select_candidates(meas_pos, meas_dir, meas_kappa, view_packed, scan_seq,
                      *, k: int, cost_beta: float, recency_scale: float,
                      interpret: bool = False):
    """Top-k candidate view rows by the selection proxy cost, fused.

    meas_pos/meas_dir (N, 3), meas_kappa (N,); view_packed (V, 17) — the
    MapView packed matrix (cols 0:3 pos | 3:6 dir | 6 kappa | 14 valid |
    15 last_supported). Returns (neg_cost (N, k) = -cost descending,
    cand_view_idx (N, k) int32). Requires N % 128 == 0 and V % 128 == 0.

    Proxy cost (== ops/association.py select_bf16 branch, f32):
      |x - m|^2 + beta * [k_m>0][k_v>0] * 0.5 (1 - mu_m . mu_v)
      + recency_scale * max(seq - last_supported, 0) + [~valid] * 1e6
    which is bilinear: cost = a_row . b_col with
      a = [-2 x | -beta/2 g mu_m | beta/2 g | 1 | |x|^2 | 0...]   (N, 16)
      b = [ m   |    gv mu_v     |   gv     | m2+rec+inval | 1 | 0...] (16, V)
    """
    dt = meas_pos.dtype
    N = meas_pos.shape[0]
    V = view_packed.shape[0]
    assert N % 128 == 0 and V % 128 == 0, (N, V)
    n_chunks = V // 128
    P = -(-2 * n_chunks // 128) * 128                        # scratch lanes

    g = (meas_kappa > 0.0).astype(dt)[:, None]
    x2 = jnp.sum(meas_pos * meas_pos, axis=-1, keepdims=True)
    cb = jnp.asarray(cost_beta, dt)
    a = jnp.concatenate([
        -2.0 * meas_pos,
        (-0.5 * cb) * g * meas_dir,
        (0.5 * cb) * g,
        jnp.ones_like(g),
        x2,
        jnp.zeros((N, 7), dt)], axis=1)                      # (N, 16)

    vpos = view_packed[:, 0:3]
    vdir = view_packed[:, 3:6]
    vkap = view_packed[:, 6]
    vval = view_packed[:, 14]
    vls = view_packed[:, 15]
    gv = (vkap > 0.0).astype(dt)
    m2 = jnp.sum(vpos * vpos, axis=-1)
    rec = jnp.asarray(recency_scale, dt) * jnp.maximum(
        jnp.asarray(scan_seq, dt) - vls, 0.0)
    inval = jnp.where(vval > 0.5, 0.0, _COST_INVALID_K)
    b = jnp.concatenate([
        vpos.T,
        vdir.T * gv[None, :],
        gv[None, :],
        (m2 + rec + inval)[None, :],
        jnp.ones((1, V), dt),
        jnp.zeros((7, V), dt)], axis=0)                      # (16, V)

    # One row-block = the whole measurement batch: grid steps carry ~us-scale
    # sequencing cost and N/128 * V/128 steps measurably regressed the replay
    # (1.21 -> 1.44 ms/scan); V/128 steps with (N, 128) tiles keeps the
    # per-step work VPU-bound and the step count at 56.
    NR = N
    # index_map literals must match the index dtype: under global x64 a bare
    # Python 0 becomes i64 and Mosaic rejects the mixed-type return
    # (same gotcha as render/splat_pallas.py).
    z32 = lambda: jnp.int32(0)
    packed1 = pl.pallas_call(
        _select_chunk_body,
        grid=(N // NR, n_chunks),
        out_shape=jax.ShapeDtypeStruct((N, 128 * n_chunks), dt),
        in_specs=[pl.BlockSpec((NR, 16), lambda r, c: (r, jnp.int32(0))),
                  pl.BlockSpec((16, 128), lambda r, c: (jnp.int32(0), c))],
        out_specs=pl.BlockSpec((NR, 128), lambda r, c: (r, c)),
        interpret=interpret,
    )(a, b)
    pk = packed1.reshape(N, n_chunks, 128)
    vals1 = pk[:, :, 0:2].reshape(N, 2 * n_chunks)
    idx1 = pk[:, :, 2:4].reshape(N, 2 * n_chunks)
    pad = P - 2 * n_chunks
    if pad:
        vals1 = jnp.pad(vals1, ((0, 0), (0, pad)),
                        constant_values=jnp.asarray(_LOG_ZERO, dt))
        idx1 = jnp.pad(idx1, ((0, 0), (0, pad)))
    vals, idx = pl.pallas_call(
        functools.partial(_select_topk_body, int(k)),
        grid=(N // NR,),
        out_shape=(jax.ShapeDtypeStruct((N, k), dt),
                   jax.ShapeDtypeStruct((N, k), dt)),
        in_specs=[pl.BlockSpec((NR, P), lambda r: (r, jnp.int32(0))),
                  pl.BlockSpec((NR, P), lambda r: (r, jnp.int32(0)))],
        out_specs=(pl.BlockSpec((NR, k), lambda r: (r, jnp.int32(0))),
                   pl.BlockSpec((NR, k), lambda r: (r, jnp.int32(0)))),
        interpret=interpret,
    )(vals1, idx1)
    return vals, idx.astype(jnp.int32)


def use_select_kernel(enabled: bool, n: int, v: int, k: int = 8) -> bool:
    # 2 * (v // 128) stage-1 survivors must cover the top-k request.
    return (bool(enabled) and jax.default_backend() == "tpu"
            and n % 128 == 0 and v % 128 == 0 and 2 * (v // 128) >= k)
