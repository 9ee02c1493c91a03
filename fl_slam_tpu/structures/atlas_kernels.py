"""Pallas TPU kernels for the resident-slab atlas (see structures/atlas.py).

``conditional_slab_exchange`` performs the per-scan pool<->slab reconciliation
as PREDICATED DMA: when the active tile set is unchanged (the common case,
~19 of 20 scans) the kernel is a ~us no-op; on a tile-set change it flushes
the outgoing slabs to their pool slots and gathers the incoming ones, HBM to
HBM, with the pool and slab buffers aliased in place.

Why a kernel: the XLA formulation (drop-mode scatter + lax.cond regather)
cannot express "do nothing to this 358 MB buffer" cheaply — the scatter
lowers to a while loop that costs ~200 us/scan even when every row drops,
the prim-id scatter another ~190 us, and a lax.cond with the pool as an
operand forces a full-pool copy (profiled 1.24 ms). Predicated DMA with
input_output_aliasing is exactly the missing primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _exchange_kernel(S: int, refresh_ref, oslots_ref, nslots_ref,
                     pool_f_in, pool_p_in, slab_f_in, slab_p_in,
                     pool_f, pool_p, slab_f, slab_p, sem):
    """Grid (). Aliased: pool_f_in IS pool_f, etc. All refs live in HBM/ANY;
    blocks move by async copy only."""

    i32 = jnp.int32

    @pl.when(refresh_ref[i32(0)] != 0)
    def _():
        def oslot(s):
            return oslots_ref[i32(s)].astype(jnp.int32)

        def nslot(s):
            return nslots_ref[i32(s)].astype(jnp.int32)

        # Flush: outgoing slab s -> pool slot oslots[s]. All S copies in
        # flight together, then one barrier wait.
        for s in range(S):
            pltpu.make_async_copy(
                slab_f.at[jnp.int32(s)], pool_f.at[oslot(s)], sem.at[jnp.int32(0), jnp.int32(s)]).start()
            pltpu.make_async_copy(
                slab_p.at[jnp.int32(s)], pool_p.at[oslot(s)], sem.at[jnp.int32(1), jnp.int32(s)]).start()
        for s in range(S):
            pltpu.make_async_copy(
                slab_f.at[jnp.int32(s)], pool_f.at[oslot(s)], sem.at[jnp.int32(0), jnp.int32(s)]).wait()
            pltpu.make_async_copy(
                slab_p.at[jnp.int32(s)], pool_p.at[oslot(s)], sem.at[jnp.int32(1), jnp.int32(s)]).wait()
        # Gather: pool slot nslots[s] -> slab s (sequenced after the flush so
        # slots shared between the outgoing and incoming sets read the
        # just-flushed state).
        for s in range(S):
            pltpu.make_async_copy(
                pool_f.at[nslot(s)], slab_f.at[jnp.int32(s)], sem.at[jnp.int32(0), jnp.int32(s)]).start()
            pltpu.make_async_copy(
                pool_p.at[nslot(s)], slab_p.at[jnp.int32(s)], sem.at[jnp.int32(1), jnp.int32(s)]).start()
        for s in range(S):
            pltpu.make_async_copy(
                pool_f.at[nslot(s)], slab_f.at[jnp.int32(s)], sem.at[jnp.int32(0), jnp.int32(s)]).wait()
            pltpu.make_async_copy(
                pool_p.at[nslot(s)], slab_p.at[jnp.int32(s)], sem.at[jnp.int32(1), jnp.int32(s)]).wait()


def _exchange_kernel_batched(S: int, refresh_ref, oslots_ref, nslots_ref,
                             pool_f_in, pool_p_in, slab_f_in, slab_p_in,
                             pool_f, pool_p, slab_f, slab_p, sem):
    """Grid (B,) instance-batched twin of ``_exchange_kernel``. Scalars carry
    a leading instance axis (refresh (B,), slots (B, S)); tensor refs are the
    whole batched arrays (ANY memory space) indexed by the grid position, so
    each instance's exchange stays predicated on ITS OWN refresh flag."""

    i32 = jnp.int32
    b = pl.program_id(0)

    @pl.when(refresh_ref[b] != 0)
    def _():
        def oslot(s):
            return oslots_ref[b, i32(s)].astype(jnp.int32)

        def nslot(s):
            return nslots_ref[b, i32(s)].astype(jnp.int32)

        for s in range(S):
            pltpu.make_async_copy(
                slab_f.at[b, i32(s)], pool_f.at[b, oslot(s)],
                sem.at[i32(0), i32(s)]).start()
            pltpu.make_async_copy(
                slab_p.at[b, i32(s)], pool_p.at[b, oslot(s)],
                sem.at[i32(1), i32(s)]).start()
        for s in range(S):
            pltpu.make_async_copy(
                slab_f.at[b, i32(s)], pool_f.at[b, oslot(s)],
                sem.at[i32(0), i32(s)]).wait()
            pltpu.make_async_copy(
                slab_p.at[b, i32(s)], pool_p.at[b, oslot(s)],
                sem.at[i32(1), i32(s)]).wait()
        for s in range(S):
            pltpu.make_async_copy(
                pool_f.at[b, nslot(s)], slab_f.at[b, i32(s)],
                sem.at[i32(0), i32(s)]).start()
            pltpu.make_async_copy(
                pool_p.at[b, nslot(s)], slab_p.at[b, i32(s)],
                sem.at[i32(1), i32(s)]).start()
        for s in range(S):
            pltpu.make_async_copy(
                pool_f.at[b, nslot(s)], slab_f.at[b, i32(s)],
                sem.at[i32(0), i32(s)]).wait()
            pltpu.make_async_copy(
                pool_p.at[b, nslot(s)], slab_p.at[b, i32(s)],
                sem.at[i32(1), i32(s)]).wait()


def _exchange_tpu_batched(refresh, old_slots, new_slots, pool_f, pool_p,
                          slab_f, slab_p):
    """Instance-batched predicated exchange: every operand has a leading B
    axis. One pallas_call, grid (B,) (sequential — DMA issue is ~free and the
    copies themselves are HBM-bandwidth-bound either way)."""
    B, S = slab_f.shape[:2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,              # refresh, old_slots, new_slots
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        scratch_shapes=[pltpu.SemaphoreType.DMA((2, S))],
    )
    out_shape = [
        jax.ShapeDtypeStruct(pool_f.shape, pool_f.dtype),
        jax.ShapeDtypeStruct(pool_p.shape, pool_p.dtype),
        jax.ShapeDtypeStruct(slab_f.shape, slab_f.dtype),
        jax.ShapeDtypeStruct(slab_p.shape, slab_p.dtype),
    ]
    return pl.pallas_call(
        functools.partial(_exchange_kernel_batched, S),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # instances index SHARED whole-array refs: keep the grid
            # sequential so megacore cannot interleave two instances' DMAs
            # on one semaphore array
            dimension_semantics=("arbitrary",)),
    )(refresh, old_slots, new_slots, pool_f, pool_p, slab_f, slab_p)


@jax.custom_batching.custom_vmap
def _exchange_tpu(refresh, old_slots, new_slots, pool_f, pool_p, slab_f,
                  slab_p):
    S = slab_f.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,              # refresh, old_slots, new_slots
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        scratch_shapes=[pltpu.SemaphoreType.DMA((2, S))],
    )
    out_shape = [
        jax.ShapeDtypeStruct(pool_f.shape, pool_f.dtype),
        jax.ShapeDtypeStruct(pool_p.shape, pool_p.dtype),
        jax.ShapeDtypeStruct(slab_f.shape, slab_f.dtype),
        jax.ShapeDtypeStruct(slab_p.shape, slab_p.dtype),
    ]
    return pl.pallas_call(
        functools.partial(_exchange_kernel, S),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # tensor input index -> output index (scalar-prefetch args included
        # in the input numbering: 0..2 are scalars, 3..6 the tensors).
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(refresh, old_slots, new_slots, pool_f, pool_p, slab_f, slab_p)


@_exchange_tpu.def_vmap
def _exchange_tpu_vmap(axis_size, in_batched, refresh, old_slots, new_slots,
                       pool_f, pool_p, slab_f, slab_p):
    """Instance-axis batching rule. Without this, jax's generic fallback for
    scalar-prefetch kernels (_batch_with_explicit_loop) dynamic-slices the
    FULL per-instance pool in and out of the loop body every scan — hundreds
    of MB of pure copy traffic. The batched kernel touches only the slabs
    being exchanged, exactly like the single-instance one."""
    def bc(x, batched):
        return x if batched else jnp.broadcast_to(
            x[None], (axis_size,) + x.shape)
    args = [bc(a, b) for a, b in zip(
        (refresh, old_slots, new_slots, pool_f, pool_p, slab_f, slab_p),
        in_batched)]
    # per-instance refresh is (1,); batched it arrives (B, 1) -> flatten
    args[0] = args[0].reshape(axis_size)
    outs = _exchange_tpu_batched(*args)
    # pallas_call returns a list; the primal returns the same structure —
    # make both a tuple so the batching spec matches
    return tuple(outs), (True,) * 4


def _exchange_kernel_ff(S: int, M: int, refresh_ref, oslots_ref, nslots_ref,
                        pool_f_in, pool_p_in, ff_in, fp_in,
                        pool_f, pool_p, ff, fp, sem):
    """ff-layout variant: the slab side is the resident col-major form
    ``ff (CF, S*M)`` / ``fp (S, 8, M/8)``; tile s's block is the column range
    ``[s*M, (s+1)*M)`` — a strided (CF, M) slice whose offset/extent are
    tile-aligned (M % 1024 == 0), which the DMA engine moves directly."""

    i32 = jnp.int32

    @pl.when(refresh_ref[i32(0)] != 0)
    def _():
        def oslot(s):
            return oslots_ref[i32(s)].astype(jnp.int32)

        def nslot(s):
            return nslots_ref[i32(s)].astype(jnp.int32)

        def ffblk(s):
            return ff.at[:, pl.ds(s * M, M)]

        def fpblk(s):
            return fp.at[jnp.int32(s)]

        for s in range(S):
            pltpu.make_async_copy(ffblk(s), pool_f.at[oslot(s)],
                                  sem.at[i32(0), i32(s)]).start()
            pltpu.make_async_copy(fpblk(s), pool_p.at[oslot(s)],
                                  sem.at[i32(1), i32(s)]).start()
        for s in range(S):
            pltpu.make_async_copy(ffblk(s), pool_f.at[oslot(s)],
                                  sem.at[i32(0), i32(s)]).wait()
            pltpu.make_async_copy(fpblk(s), pool_p.at[oslot(s)],
                                  sem.at[i32(1), i32(s)]).wait()
        for s in range(S):
            pltpu.make_async_copy(pool_f.at[nslot(s)], ffblk(s),
                                  sem.at[i32(0), i32(s)]).start()
            pltpu.make_async_copy(pool_p.at[nslot(s)], fpblk(s),
                                  sem.at[i32(1), i32(s)]).start()
        for s in range(S):
            pltpu.make_async_copy(pool_f.at[nslot(s)], ffblk(s),
                                  sem.at[i32(0), i32(s)]).wait()
            pltpu.make_async_copy(pool_p.at[nslot(s)], fpblk(s),
                                  sem.at[i32(1), i32(s)]).wait()


def _exchange_kernel_ff_batched(S: int, M: int, refresh_ref, oslots_ref,
                                nslots_ref, pool_f_in, pool_p_in, ff_in,
                                fp_in, pool_f, pool_p, ff, fp, sem):
    """Grid (B,) instance-batched twin of ``_exchange_kernel_ff``."""

    i32 = jnp.int32
    b = pl.program_id(0)

    @pl.when(refresh_ref[b] != 0)
    def _():
        def oslot(s):
            return oslots_ref[b, i32(s)].astype(jnp.int32)

        def nslot(s):
            return nslots_ref[b, i32(s)].astype(jnp.int32)

        def ffblk(s):
            return ff.at[b, :, pl.ds(s * M, M)]

        def fpblk(s):
            return fp.at[b, i32(s)]

        for s in range(S):
            pltpu.make_async_copy(ffblk(s), pool_f.at[b, oslot(s)],
                                  sem.at[i32(0), i32(s)]).start()
            pltpu.make_async_copy(fpblk(s), pool_p.at[b, oslot(s)],
                                  sem.at[i32(1), i32(s)]).start()
        for s in range(S):
            pltpu.make_async_copy(ffblk(s), pool_f.at[b, oslot(s)],
                                  sem.at[i32(0), i32(s)]).wait()
            pltpu.make_async_copy(fpblk(s), pool_p.at[b, oslot(s)],
                                  sem.at[i32(1), i32(s)]).wait()
        for s in range(S):
            pltpu.make_async_copy(pool_f.at[b, nslot(s)], ffblk(s),
                                  sem.at[i32(0), i32(s)]).start()
            pltpu.make_async_copy(pool_p.at[b, nslot(s)], fpblk(s),
                                  sem.at[i32(1), i32(s)]).start()
        for s in range(S):
            pltpu.make_async_copy(pool_f.at[b, nslot(s)], ffblk(s),
                                  sem.at[i32(0), i32(s)]).wait()
            pltpu.make_async_copy(pool_p.at[b, nslot(s)], fpblk(s),
                                  sem.at[i32(1), i32(s)]).wait()


@jax.custom_batching.custom_vmap
def _exchange_tpu_ff(refresh, old_slots, new_slots, pool_f, pool_p3, ff,
                     fp3):
    """ff-layout predicated exchange (operands pre-reshaped: pool_p3
    (P, 8, M/8), fp3 (S, 8, M/8))."""
    P, CF, M = pool_f.shape
    S = fp3.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        scratch_shapes=[pltpu.SemaphoreType.DMA((2, S))],
    )
    out_shape = [
        jax.ShapeDtypeStruct(pool_f.shape, pool_f.dtype),
        jax.ShapeDtypeStruct(pool_p3.shape, pool_p3.dtype),
        jax.ShapeDtypeStruct(ff.shape, ff.dtype),
        jax.ShapeDtypeStruct(fp3.shape, fp3.dtype),
    ]
    return pl.pallas_call(
        functools.partial(_exchange_kernel_ff, S, M),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(refresh, old_slots, new_slots, pool_f, pool_p3, ff, fp3)


@_exchange_tpu_ff.def_vmap
def _exchange_tpu_ff_vmap(axis_size, in_batched, refresh, old_slots,
                          new_slots, pool_f, pool_p3, ff, fp3):
    """Instance-axis rule — see ``_exchange_tpu_vmap``."""
    def bc(x, batched):
        return x if batched else jnp.broadcast_to(
            x[None], (axis_size,) + x.shape)
    args = [bc(a, b) for a, b in zip(
        (refresh, old_slots, new_slots, pool_f, pool_p3, ff, fp3),
        in_batched)]
    args[0] = args[0].reshape(axis_size)
    B, _, CF, M = args[3].shape
    S = args[6].shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        scratch_shapes=[pltpu.SemaphoreType.DMA((2, S))],
    )
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args[3:]]
    outs = pl.pallas_call(
        functools.partial(_exchange_kernel_ff_batched, S, M),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=("arbitrary",)),
    )(*args)
    return tuple(outs), (True,) * 4


def conditional_slab_exchange_ff(pool_f, pool_p, ff, fp, old_slots,
                                 new_slots, refresh, use_kernel: bool = True):
    """Predicated pool<->resident-ff exchange. ``ff (CF, S*M)``, ``fp (S*M,)``
    int32; pool stays ``(P, CF, M)``. Returns (pool_f, pool_p, ff, fp)."""
    P, CF, M = pool_f.shape
    SM = ff.shape[1]
    S = SM // M
    aligned = (M % 1024 == 0) and (CF % 8 == 0)
    if use_kernel and jax.default_backend() == "tpu" and aligned:
        pf, pp, f2, p2 = _exchange_tpu_ff(
            jnp.asarray(refresh, jnp.int32).reshape(1),
            old_slots.astype(jnp.int32), new_slots.astype(jnp.int32),
            pool_f, pool_p.reshape(P, 8, M // 8),
            ff, fp.reshape(S, 8, M // 8))
        return pf, pp.reshape(P, M), f2, p2.reshape(SM)
    # Portable fallback (CPU tests / vmapped replicas): express through the
    # row-major fallback; the transposes are real copies but this path is
    # off the single-chip hot loop.
    slab_f = jnp.swapaxes(ff.reshape(CF, S, M), 0, 1)
    slab_p = fp.reshape(S, M)
    pool_f, pool_p, slab_f, slab_p = conditional_slab_exchange(
        pool_f, pool_p, slab_f, slab_p, old_slots, new_slots, refresh,
        use_kernel=False)
    return (pool_f, pool_p,
            jnp.swapaxes(slab_f, 0, 1).reshape(CF, SM),
            slab_p.reshape(SM))


def conditional_slab_exchange(pool_f, pool_p, slab_f, slab_p, old_slots,
                              new_slots, refresh, use_kernel: bool = True):
    """Predicated pool<->slab exchange. refresh () int32: 0 = no-op.

    Returns (pool_f, pool_p, slab_f, slab_p) — in-place on TPU.
    """
    P, CF, M = pool_f.shape
    aligned = (M % 1024 == 0) and (CF % 8 == 0)
    if use_kernel and jax.default_backend() == "tpu" and aligned:
        S = slab_f.shape[0]
        # prim_ids as an (.., 8, M/8) view so its DMA blocks tile-align.
        pf, pp, sf, sp = _exchange_tpu(
            jnp.asarray(refresh, jnp.int32).reshape(1),
            old_slots.astype(jnp.int32), new_slots.astype(jnp.int32),
            pool_f, pool_p.reshape(P, 8, M // 8),
            slab_f, slab_p.reshape(S, 8, M // 8))
        return pf, pp.reshape(P, M), sf, sp.reshape(S, M)
    # Portable fallback (CPU tests / interpret-free): drop-mode scatter flush
    # + cond regather. Semantically identical.
    P = pool_f.shape[0]
    r = jnp.asarray(refresh, jnp.int32).reshape(())
    slots_put = jnp.where(r != 0, old_slots, jnp.int32(P))
    pool_f = pool_f.at[slots_put].set(slab_f, mode="drop")
    pool_p = pool_p.at[slots_put].set(slab_p, mode="drop")

    def _regather(_):
        return pool_f[new_slots], pool_p[new_slots]

    def _keep(_):
        return slab_f, slab_p

    slab_f, slab_p = jax.lax.cond(r != 0, _regather, _keep, None)
    return pool_f, pool_p, slab_f, slab_p


# ===========================================================================
# Paged-insert page IO: contiguous (CF, P) page blocks of the resident ff.
#
# Single-instance, the insert path's page gather (``ff[:, cols]``) and dense
# write-back (``ff.at[:, cols].set``) are layout-free: XLA bitcasts
# (CF, SM){1,0} to (SM, CF){0,1} and runs a cheap per-column pass. Under the
# instance vmap that bitcast no longer exists — (B, CF, SM){2,1,0} vs the
# scatter's wanted (B*SM, CF){0,1} differ by a REAL transpose, and XLA
# round-trips the full ~360 MB field block through layout copies EVERY scan
# (round-3 trace: 4 copies of f32[4,8,8,351232] per inner iteration, the
# single largest batched-only cost). The pages are contiguous 128-column
# runs, so the batched forms below move exactly the touched (CF, P) blocks
# by DMA and alias ff in place; the primal (single-instance) call keeps the
# XLA formulation that is already optimal there.
# ===========================================================================


def _page_gather_kernel(S: int, P: int, offs_ref, ff_in, page_out, sem):
    """Grid (B,). offs (B, S) scalar-prefetch col starts (multiples of P);
    ff (B, CF, SM) ANY -> page (B, S, CF, P)."""
    i32 = jnp.int32
    b = pl.program_id(0)

    def off(s):
        # page starts are multiples of P by construction (s*M + page*P);
        # Mosaic needs the divisibility stated to allow a dynamic lane slice
        return pl.multiple_of(offs_ref[b, i32(s)], P)

    for s in range(S):
        pltpu.make_async_copy(
            ff_in.at[b, :, pl.ds(off(s), P)], page_out.at[b, i32(s)],
            sem.at[i32(s)]).start()
    for s in range(S):
        pltpu.make_async_copy(
            ff_in.at[b, :, pl.ds(off(s), P)], page_out.at[b, i32(s)],
            sem.at[i32(s)]).wait()


def _page_writeback_kernel(S: int, P: int, offs_ref, upd_in, ff_in, ff_out,
                           sem):
    """Grid (B,). upd (B, S, CF, P) -> ff (B, CF, SM) at offs; ff aliased."""
    i32 = jnp.int32
    b = pl.program_id(0)

    def off(s):
        return pl.multiple_of(offs_ref[b, i32(s)], P)

    for s in range(S):
        pltpu.make_async_copy(
            upd_in.at[b, i32(s)], ff_out.at[b, :, pl.ds(off(s), P)],
            sem.at[i32(s)]).start()
    for s in range(S):
        pltpu.make_async_copy(
            upd_in.at[b, i32(s)], ff_out.at[b, :, pl.ds(off(s), P)],
            sem.at[i32(s)]).wait()


def _gather_cols(offs, P):
    return (offs[..., None]
            + jnp.arange(P, dtype=jnp.int32)[None, :])


@functools.lru_cache(maxsize=8)
def _page_io(P: int):
    """(gather, writeback) custom_vmap pair for page width P."""

    @jax.custom_batching.custom_vmap
    def gather(ff, offs):
        cols = _gather_cols(offs.astype(jnp.int32), P).reshape(-1)
        return ff[:, cols]                               # (CF, S*P)

    @gather.def_vmap
    def gather_vmap(axis_size, in_batched, ff, offs):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None],
                                                (axis_size,) + x.shape)
        ff, offs = bc(ff, in_batched[0]), bc(offs, in_batched[1])
        B, CF, SM = ff.shape
        S = offs.shape[1]
        offs = offs.astype(jnp.int32)
        if jax.default_backend() == "tpu" and P % 128 == 0 and CF % 8 == 0:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                scratch_shapes=[pltpu.SemaphoreType.DMA((S,))],
            )
            (page,) = pl.pallas_call(
                functools.partial(_page_gather_kernel, S, P),
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((B, S, CF, P), ff.dtype)],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=False,
                    dimension_semantics=("arbitrary",)),
            )(offs, ff)
            out = jnp.swapaxes(page, 1, 2).reshape(B, CF, S * P)
        else:
            cols = _gather_cols(offs, P).reshape(B, -1)  # (B, S*P)
            out = jnp.take_along_axis(ff, cols[:, None, :], axis=2)
        return out, True

    @jax.custom_batching.custom_vmap
    def writeback(ff, offs, upd):
        cols = _gather_cols(offs.astype(jnp.int32), P).reshape(-1)
        return ff.at[:, cols].set(upd)

    @writeback.def_vmap
    def writeback_vmap(axis_size, in_batched, ff, offs, upd):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None],
                                                (axis_size,) + x.shape)
        ff = bc(ff, in_batched[0])
        offs = bc(offs, in_batched[1]).astype(jnp.int32)
        upd = bc(upd, in_batched[2])
        B, CF, SM = ff.shape
        S = offs.shape[1]
        if jax.default_backend() == "tpu" and P % 128 == 0 and CF % 8 == 0:
            upd4 = jnp.swapaxes(upd.reshape(B, CF, S, P), 1, 2)  # (B,S,CF,P)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                scratch_shapes=[pltpu.SemaphoreType.DMA((S,))],
            )
            (out,) = pl.pallas_call(
                functools.partial(_page_writeback_kernel, S, P),
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct(ff.shape, ff.dtype)],
                # input numbering includes the scalar arg: 0 = offs,
                # 1 = upd4, 2 = ff -> alias ff to the output
                input_output_aliases={2: 0},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    dimension_semantics=("arbitrary",)),
            )(offs, upd4, ff)
        else:
            cols = _gather_cols(offs, P)                 # (B, S, P)
            flat = cols.reshape(B, -1)
            out = jax.vmap(lambda f, c, u: f.at[:, c].set(u))(
                ff, flat, upd)
        return out, True

    return gather, writeback


def page_gather_ff(ff, offs, P: int):
    """Contiguous page gather: ff (CF, SM), offs (S,) int32 col starts
    (multiples of the lane width) -> (CF, S*P). vmap-safe: the batched form
    is a predicated DMA kernel on TPU (see module note)."""
    g, _ = _page_io(int(P))
    return g(ff, offs.astype(jnp.int32))


def page_writeback_ff(ff, offs, upd, P: int):
    """Inverse of ``page_gather_ff``: write upd (CF, S*P) back at offs,
    in place on TPU."""
    _, wb = _page_io(int(P))
    return wb(ff, offs.astype(jnp.int32), upd)
