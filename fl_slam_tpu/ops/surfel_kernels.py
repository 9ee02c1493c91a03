"""Pallas TPU kernel for the surfel moment accumulation (ops/surfels).

Why a kernel: the packed per-cell moment sum ([cnt, w, w*p, w*pp^T] over
8192 points into 8192 hex cells) is a `segment_sum` — XLA lowers it as a
row-serialized scatter-add at ~8 ns/row (~60 us/scan traced, round-2 of the
perf campaign). The same contraction is a one-hot matmul
``mom[c, f] = sum_n [cell_n == c] payload[n, f]``, and with the cell id
factored as ``c = hi * 128 + lo`` the one-hot never materializes at (N, C):

    mom[f, hi, lo] = sum_n  ohh[hi, n] * payload[f, n] * ohl[n, lo]

Per N-chunk the kernel builds ``X[f * H + hi, n] = ohh * payload`` in VMEM
(F*H, NB) and contracts ``X @ ohl`` on the MXU into a resident (F*H, 128)
accumulator — scatter-free, ~3 GFLOP total at production shapes.

Precision: the MXU multiplies in bf16, so X ships as an exact two-term
bf16 split (hi + lo, ~1.5e-5 relative) with f32 accumulation; the one-hot
factors are exact in bf16. This is sufficient ONLY because ops/surfels
accumulates CELL-LOCAL coordinates (bounded by the cell radius — see
cell_centers_from_ids): scan-extent coordinates would amplify the bf16x2
error by the E[pp'] - cen cen' cancellation ratio.

Math parity: identical contraction as ``jax.ops.segment_sum`` (the XLA
CPU/small-config path); equivalence asserted in tests/test_tpu_kernels.py
and tests/test_map.py (interpret mode).

Parity anchor: reference ``operators/lidar_surfel_extraction.py:84-431``
(MA-Hex-3D binning + per-cell moment accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_slam_tpu.config import GCConfig

FORCE_INTERPRET = False

_LANE = 128


def use_moment_kernel(cfg: GCConfig) -> bool:
    if not cfg.surfel_moment_kernel:
        return False
    n_cells = cfg.surfel_cells_1 * cfg.surfel_cells_2 * cfg.surfel_cells_z
    if n_cells % _LANE or cfg.n_points % _LANE:
        return False
    return FORCE_INTERPRET or jax.default_backend() == "tpu"


def _moment_body(F: int, H: int, cell_row_ref, cell_col_ref, pay_ref,
                 out_ref):
    """Grid (N // NB,). Blocks: cell_row (1, NB), cell_col (NB, 1),
    payload (F, NB); out (F*H, 128) revisited accumulator."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dt = pay_ref.dtype
    nb = cell_row_ref.shape[1]
    # hi/lo factors of the cell id (lane width 128 = 2^7).
    hi_row = jax.lax.shift_right_logical(cell_row_ref[:], jnp.int32(7))   # (1, NB)
    lo_col = jax.lax.bitwise_and(cell_col_ref[:], jnp.int32(_LANE - 1))

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, nb), 0)
    ohh = (iota_h == hi_row).astype(dt)                        # (H, NB)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (nb, _LANE), 1)
    ohl = (iota_l == lo_col).astype(jnp.bfloat16)              # (NB, 128)

    # X[f*H + h, n] = payload[f, n] * ohh[h, n] — F static slices, no 3-D
    # broadcasts (Mosaic). Exact bf16x2 split, f32 MXU accumulation.
    X = jnp.concatenate([pay_ref[f, :][None, :] * ohh for f in range(F)],
                        axis=0)                                # (F*H, NB)
    Xh = X.astype(jnp.bfloat16)
    Xl = (X - Xh.astype(dt)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    acc = (jax.lax.dot_general(Xh, ohl, dn, preferred_element_type=dt)
           + jax.lax.dot_general(Xl, ohl, dn, preferred_element_type=dt))
    out_ref[:] += acc


def moment_segment_sum(payload, cell, n_cells: int, *,
                       interpret: bool | None = None):
    """payload (F, N) f32 plane layout, cell (N,) int32 in [0, n_cells) ->
    (F, n_cells) per-cell sums. n_cells and N must be multiples of 128."""
    F, N = payload.shape
    assert n_cells % _LANE == 0 and N % _LANE == 0, (n_cells, N)
    H = n_cells // _LANE
    NB = 512 if N % 512 == 0 else _LANE
    dt = payload.dtype
    if interpret is None:
        interpret = FORCE_INTERPRET
    cell = cell.astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_moment_body, F, H),
        grid=(N // NB,),
        in_specs=[
            pl.BlockSpec((1, NB), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, NB), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F * H, _LANE),
                               lambda i: (jnp.int32(0), jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F * H, _LANE), dt),
        interpret=interpret,
    )(cell[None, :], cell[:, None], payload)
    # (F*H, 128) -> (F, H*128) = (F, n_cells): row f*H + h, lane l holds
    # cell c = h*128 + l.
    return out.reshape(F, H, _LANE).reshape(F, n_cells)
