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
    return pl.pallas_call(
        functools.partial(_sinkhorn_body, int(n_iter), float(ua), float(vb),
                          float(log_b)),
        out_shape=jax.ShapeDtypeStruct((K, N), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(logKT, log_a2)


def use_sinkhorn_kernel(enabled: bool) -> bool:
    return bool(enabled) and jax.default_backend() == "tpu"
