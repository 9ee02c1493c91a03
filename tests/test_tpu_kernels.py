"""On-device tests for the Pallas atlas kernels (skip on CPU: the kernels
have an XLA fallback that the rest of the suite exercises; these validate
the TPU DMA path itself against that fallback)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs the TPU backend")


def _mk(rng, P, S, CF, M):
    pool_f = jnp.asarray(rng.normal(size=(P, CF, M)), jnp.float32)
    pool_p = jnp.asarray(rng.integers(0, 100, size=(P, M)), jnp.int32)
    slab_f = jnp.asarray(rng.normal(size=(S, CF, M)), jnp.float32)
    slab_p = jnp.asarray(rng.integers(100, 200, size=(S, M)), jnp.int32)
    old = jnp.asarray(rng.permutation(P)[:S], jnp.int32)
    new = jnp.asarray(rng.permutation(P)[:S], jnp.int32)
    return pool_f, pool_p, slab_f, slab_p, old, new


@pytest.mark.parametrize("refresh", [0, 1])
def test_exchange_kernel_matches_fallback(refresh):
    from fl_slam_tpu.structures.atlas_kernels import conditional_slab_exchange
    rng = np.random.default_rng(0)
    P, S, CF, M = 8, 3, 32, 2048          # aligned: M % 1024 == 0, CF % 8 == 0
    args = _mk(rng, P, S, CF, M)
    r = jnp.int32(refresh)
    out_k = jax.jit(lambda *a: conditional_slab_exchange(*a, use_kernel=True)
                    )(*args, r)
    out_x = jax.jit(lambda *a: conditional_slab_exchange(*a, use_kernel=False)
                    )(*args, r)
    for k, x in zip(out_k, out_x):
        np.testing.assert_array_equal(np.asarray(k), np.asarray(x))


@pytest.mark.parametrize("refresh", [0, 1])
def test_exchange_kernel_ff_matches_fallback(refresh):
    from fl_slam_tpu.structures.atlas_kernels import (
        conditional_slab_exchange_ff)
    rng = np.random.default_rng(1)
    P, S, CF, M = 8, 3, 32, 2048
    pool_f, pool_p, slab_f, slab_p, old, new = _mk(rng, P, S, CF, M)
    ff = jnp.swapaxes(slab_f, 0, 1).reshape(CF, S * M)
    fp = slab_p.reshape(S * M)
    r = jnp.int32(refresh)
    out_k = jax.jit(lambda *a: conditional_slab_exchange_ff(
        *a, use_kernel=True))(pool_f, pool_p, ff, fp, old, new, r)
    out_x = jax.jit(lambda *a: conditional_slab_exchange_ff(
        *a, use_kernel=False))(pool_f, pool_p, ff, fp, old, new, r)
    for k, x in zip(out_k, out_x):
        np.testing.assert_array_equal(np.asarray(k), np.asarray(x))
