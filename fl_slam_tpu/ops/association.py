"""Soft association via unbalanced Sinkhorn OT (parity: reference
``operators/primitive_association.py:105-553``).

TPU-first redesign:
  - The reference builds a per-measurement hex-stencil candidate pool with
    gather tables, then scores candidates. Here the cost over the FULL stitched
    map view is computed densely — both terms expand into matmuls that run on
    the MXU:
      ||x_i - m_j||^2          = |x|^2 + |m|^2 - 2 x.m^T
      ||eta_i + eta_j||^2      = k_i^2 + k_j^2 + 2 eta_i.eta_j^T
    The view is already restricted to the active hex-disk tiles, so this is a
    superset of the reference's per-measurement stencil (no coverage loss; the
    stencil there is a compute-bound workaround, not a semantic constraint).
  - Association runs in WORLD frame: callers transform the measurement batch
    to the IMU+odom-informed linearization pose first. (The reference compares
    body-frame measurement positions against world-frame map positions —
    tolerable only near the origin; fixed here by design.)
  - Sinkhorn runs in log domain (stable in float32 on TPU); the update rule is
    algebraically identical to the reference's multiplicative form
    (``_sinkhorn_unbalanced_fixed_k_jax``): fixed iterations, unbalanced KL
    relaxation (standard Chizat exponents, see the deliberate-fix note below),
    a = WEIGHT-PROPORTIONAL over valid measurements with a mean-weight floor
    (the round-2 accuracy fix — see the marginal construction in
    ``associate``; the reference uses a uniform marginal, which hands
    near-zero-weight rows a full transport budget), b = uniform 1/K over
    candidate slots, pi used directly as transported mass (NO row
    normalization, spec 5.7.3).

Cost (parity): C = ||dx||^2 + beta * (1 - BC_vMF) + eps * lambda_recency * dt,
row-min subtracted; invalid candidates masked to 1e12.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.core.linalg import top_k_maybe_approx
from fl_slam_tpu.ops import assoc_kernels
from fl_slam_tpu.structures.atlas import MapView

COST_BETA = 0.5          # direction weight in cost (AssociationConfig.beta)
COST_INVALID = 1e12


class AssociationResult(NamedTuple):
    responsibilities: jnp.ndarray  # (N, K) transported mass pi
    cand_view_idx: jnp.ndarray     # (N, K) int32 rows of the map view
    cand_slab_idx: jnp.ndarray     # (N, K) int32 slab-flat indices (s*M+m)
    cand_valid: jnp.ndarray        # (N, K) bool
    row_masses: jnp.ndarray        # (N,) sum_k pi
    cost: jnp.ndarray              # (N, K) selected candidate costs
    cand_packed: jnp.ndarray       # (N, K, 17) gathered view.packed rows
    row_budget: jnp.ndarray        # (N,) source marginal a (novelty base)


def _log_sinh_ratio(k, eps):
    """A_vmf(k) = log(4 pi) + log(sinh k) - log k, stable everywhere
    (parity: _A_vmf_vec_jax)."""
    k = jnp.maximum(k, eps)
    log_sinh = jnp.where(
        k > 20.0, k - jnp.log(2.0),
        jnp.where(k >= 1e-2, jnp.log(jnp.sinh(jnp.minimum(k, 20.0))),
                  jnp.log(k + (k ** 3) / 6.0)))
    return jnp.log(4.0 * jnp.pi) + log_sinh - jnp.log(k)


def associate(meas_pos, meas_dir, meas_kappa, meas_valid, view: MapView,
              scan_seq, cfg: GCConfig,
              meas_weights=None) -> tuple[AssociationResult, dict]:
    """Dense-cost candidate selection + unbalanced Sinkhorn.

    meas_pos (N,3) WORLD frame, meas_dir (N,3), meas_kappa (N,),
    meas_valid (N,) bool, meas_weights (N,) transport-budget weights
    (None = uniform over valid rows). Returns (AssociationResult, certs).
    """
    dt = meas_pos.dtype
    eps = cfg.ot_epsilon
    K = cfg.k_assoc

    eta_m = meas_kappa[:, None] * meas_dir                      # (N, 3)
    eig_min = 1e-12
    A_k1 = _log_sinh_ratio(jnp.maximum(meas_kappa, eig_min), eig_min)[:, None]

    use_sel_k = assoc_kernels.use_select_kernel(
        cfg.select_kernel, meas_pos.shape[0], view.packed.shape[0], K)
    if use_sel_k:
        # Fused Pallas selection: proxy cost (same formula as the
        # select_bf16 branch, f32) + top-K in one kernel; the dense (N, V)
        # matrices below never materialize. Selected candidates are
        # re-scored exactly from the packed rows either way.
        k_eff = min(K, view.packed.shape[0])
        neg_cost, cand_view_idx = assoc_kernels.select_candidates(
            meas_pos, meas_dir, meas_kappa, view.packed, scan_seq,
            k=k_eff, cost_beta=float(COST_BETA),
            recency_scale=float(eps * cfg.recency_decay_lambda))
        return _finish_associate(
            meas_pos, meas_kappa, meas_valid, meas_weights, view, scan_seq,
            cfg, neg_cost, cand_view_idx, eta_m, A_k1, proxy_sel=True)

    # ---- dense cost over the view (MXU matmuls) ---------------------------
    x2 = jnp.sum(meas_pos * meas_pos, axis=-1)[:, None]
    m2 = jnp.sum(view.positions * view.positions, axis=-1)[None, :]

    if cfg.select_bf16:
        # SELECTION-pass direction term: cosine proxy 0.5 (1 - mu_m . mu_v)
        # instead of the vMF Bhattacharyya distance. The exact 1 - BC needs
        # log/sinh/exp over the full (N, V) matrix (~110M transcendental
        # lanes, ~140 us/scan traced); both terms are monotone in direction
        # misalignment with the same [0, 1] range, the selection feeds soft
        # machinery, and the K selected candidates are re-scored with the
        # EXACT Bhattacharyya cost below.
        #
        # ONE (N, 8) @ (8, V) matmul carries position cross-term, direction
        # proxy AND the dir_ok gate (rank-1 indicator outer product):
        #   cross = -2 p.p' - 0.5 beta a b (d.d') + 0.5 beta a b
        # with a/b the kappa>0 indicators folded into the factors — so the
        # whole selection matrix materializes exactly once (measured: the
        # second (N, V) matmul + separate combine passes cost ~30 us/scan).
        # NEGATED throughout (the selector maximizes -cost), so the top-k
        # consumes the fused matmul epilogue directly — no separate (N, V)
        # negation pass.
        a_m = (meas_kappa > 0.0).astype(dt)[:, None]            # (N, 1)
        b_v = (view.kappas > 0.0).astype(dt)[:, None]           # (V, 1)
        half_beta = 0.5 * COST_BETA
        cat_m = jnp.concatenate([
            2.0 * meas_pos, half_beta * a_m * meas_dir,
            (-half_beta) * a_m, jnp.zeros_like(a_m)], axis=1)   # (N, 8)
        cat_v = jnp.concatenate([
            view.positions, b_v * view.directions,
            b_v, jnp.zeros_like(b_v)], axis=1)                  # (V, 8)
        ncross = cat_m @ cat_v.T                                # (N, V)
        seq = jnp.asarray(scan_seq, dtype=jnp.int32)
        cand_dt = jnp.maximum(seq - view.last_supported, 0).astype(dt)
        recency = (eps * cfg.recency_decay_lambda) * cand_dt[None, :]
        negC = ncross - (x2 + m2 + recency)
        negC = jnp.where(view.valid[None, :], negC, -COST_INVALID)
        k_eff = min(K, negC.shape[1])
        neg_cost, cand_view_idx = top_k_maybe_approx(
            negC.astype(jnp.bfloat16), k_eff, cfg.approx_topk)
        return _finish_associate(
            meas_pos, meas_kappa, meas_valid, meas_weights, view, scan_seq,
            cfg, neg_cost, cand_view_idx, eta_m, A_k1, proxy_sel=True)
    # ---- exact selection path (CPU/parity): full vMF Bhattacharyya --------
    dir_ok = (meas_kappa[:, None] > 0.0) & (view.kappas[None, :] > 0.0)
    d_pos = x2 + m2 - 2.0 * meas_pos @ view.positions.T        # (N, V)
    eta_v = view.kappas[:, None] * view.directions              # (V, 3)
    cross = eta_m @ eta_v.T
    km2 = (meas_kappa[:, None] ** 2 + view.kappas[None, :] ** 2
           + 2.0 * cross)
    km = 0.5 * jnp.sqrt(jnp.maximum(km2, 0.0))
    A_km = _log_sinh_ratio(jnp.maximum(km, eig_min), eig_min)
    A_k2 = _log_sinh_ratio(jnp.maximum(view.kappas, eig_min),
                           eig_min)[None, :]
    bc = jnp.exp(A_km - 0.5 * (A_k1 + A_k2))
    d_dir = jnp.where(dir_ok, jnp.maximum(0.0, 1.0 - bc), 0.0)

    # Recency bias (continuous; parity: recency_cost in associate_primitives_ot)
    seq = jnp.asarray(scan_seq, dtype=jnp.int32)
    cand_dt = jnp.maximum(seq - view.last_supported, 0).astype(dt)
    recency = (eps * cfg.recency_decay_lambda) * cand_dt[None, :]

    C_full = d_pos + COST_BETA * d_dir + recency
    C_full = jnp.where(view.valid[None, :], C_full, COST_INVALID)

    # ---- top-K candidates per measurement (cost ascending) ----------------
    k_eff = min(K, C_full.shape[1])
    neg_cost, cand_view_idx = top_k_maybe_approx(-C_full, k_eff,
                                                 cfg.approx_topk)
    return _finish_associate(
        meas_pos, meas_kappa, meas_valid, meas_weights, view, scan_seq, cfg,
        neg_cost, cand_view_idx, eta_m, A_k1, proxy_sel=False)


def _finish_associate(meas_pos, meas_kappa, meas_valid, meas_weights, view,
                      scan_seq, cfg: GCConfig, neg_cost, cand_view_idx,
                      eta_m, A_k1, *, proxy_sel: bool):
    """Candidate gather + exact re-score + unbalanced Sinkhorn, shared by the
    dense-XLA and fused-Pallas selection paths. ``proxy_sel``: the selection
    scores were a proxy (bf16 matrix or the kernel's cosine cost) — recompute
    exact f32 costs of the selected candidates from the packed rows."""
    dt = meas_pos.dtype
    eps = cfg.ot_epsilon
    K = cfg.k_assoc
    eig_min = 1e-12
    seq = jnp.asarray(scan_seq, dtype=jnp.int32)
    k_eff = neg_cost.shape[1]
    if k_eff < K:
        neg_cost = jnp.pad(neg_cost, ((0, 0), (0, K - k_eff)),
                           constant_values=jnp.asarray(
                               -COST_INVALID, neg_cost.dtype))
        cand_view_idx = jnp.pad(cand_view_idx, ((0, 0), (0, K - k_eff)))
    cand_view_idx = cand_view_idx.astype(jnp.int32)
    # ONE gather of all per-candidate fields (see MapView.packed).
    N = meas_pos.shape[0]
    cand_packed = view.packed[cand_view_idx.reshape(-1)].reshape(N, K, -1)
    if proxy_sel:
        # Exact selected-candidate costs from the packed fields (same formula
        # as the dense pass, on (N, K)).
        cp = cand_packed[..., 0:3]
        cd = cand_packed[..., 3:6]
        ck = cand_packed[..., 6]
        d_pos_k = jnp.sum((meas_pos[:, None, :] - cp) ** 2, axis=-1)
        km2_k = (meas_kappa[:, None] ** 2 + ck ** 2
                 + 2.0 * ck * jnp.einsum("ni,nki->nk", eta_m, cd))
        km_k = 0.5 * jnp.sqrt(jnp.maximum(km2_k, 0.0))
        bc_k = jnp.exp(_log_sinh_ratio(jnp.maximum(km_k, eig_min), eig_min)
                       - 0.5 * (A_k1 + _log_sinh_ratio(
                           jnp.maximum(ck, eig_min), eig_min)))
        d_dir_k = jnp.where((meas_kappa[:, None] > 0.0) & (ck > 0.0),
                            jnp.maximum(0.0, 1.0 - bc_k), 0.0)
        dt_k = jnp.maximum(
            seq - cand_packed[..., 15].astype(jnp.int32), 0).astype(dt)
        sel_bad = (-neg_cost.astype(dt)) >= 0.5 * COST_INVALID  # pad/invalid
        C = jnp.where((cand_packed[..., 14] > 0.5) & ~sel_bad,
                      d_pos_k + COST_BETA * d_dir_k
                      + (eps * cfg.recency_decay_lambda) * dt_k,
                      COST_INVALID)                            # (N, K)
    else:
        C = -neg_cost.astype(dt)                               # (N, K)
    cand_valid = (cand_packed[..., 14] > 0.5) & (C < 0.5 * COST_INVALID)
    cand_slab_idx = cand_packed[..., 16].astype(jnp.int32)

    # NOTE: the reference subtracts the per-row minimum cost here
    # (cost_subtract_row_min=True). That destroys absolute cost semantics:
    # a measurement whose best candidate is meters away still transports its
    # full budget onto it, corrupting both the pose evidence and the map
    # fuse. Keeping absolute costs lets the unbalanced OT shrink bad rows'
    # mass to ~0, which novelty insertion then covers. Deliberate fix.

    # ---- unbalanced Sinkhorn, log domain, fixed iterations -----------------
    # Row marginal PROPORTIONAL TO MEASUREMENT WEIGHT (not uniform over
    # valid rows): a uniform marginal hands every valid row — including a
    # near-zero-weight camera feature — the same transport budget, and the
    # transported mass pi then drives the visual WLS and map fuse at full
    # strength REGARDLESS of the row's declared weight (measured: scaling
    # camera weights x0.01 left the camera-on accuracy damage unchanged).
    # Weight-proportional marginals make row influence track the weight
    # system end to end.
    a_mask = meas_valid.astype(dt)
    if meas_weights is None:
        aw = a_mask
    else:
        # Blend toward the mean weight: pure weight-proportional budgets
        # over-concentrate transport on the few heaviest rows at small
        # surfel budgets (the 64-surfel parity config lost its
        # SLAM-beats-odometry translation margin); the mean-floor keeps
        # every valid row at least half a uniform share while heavy rows
        # still carry proportionally more.
        w = jnp.maximum(meas_weights, 0.0) * a_mask
        w_mean = jnp.sum(w) / jnp.maximum(jnp.sum(a_mask), 1.0)
        aw = a_mask * (w + w_mean)
    a = aw / jnp.maximum(jnp.sum(aw), cfg.eps_mass)
    log_a = jnp.where(a > 0, jnp.log(jnp.maximum(a, 1e-300)), -jnp.inf)
    log_b = jnp.full((K,), -jnp.log(float(K)), dtype=dt)

    # Standard unbalanced-OT scaling exponent tau/(tau+eps) (Chizat et al.).
    # The reference uses 1/(1+tau/eps) — with (tau, eps) = (0.5, 0.1) that is
    # 1/6 instead of 5/6, which barely enforces the marginals: transported row
    # masses overshoot the declared budget a_i ~8x, inflating the downstream
    # pose evidence and zeroing novelty. Deliberate fix.
    ua = cfg.ot_tau_a / (cfg.ot_tau_a + eps)
    vb = cfg.ot_tau_b / (cfg.ot_tau_b + eps)
    # K-MAJOR layout for the iteration: (N, K)=(1536, 8) arrays tile-pad the
    # 8-wide minor dim to 128 lanes (16x memory) and reduce over the padded
    # axis every iteration; transposed (K, N) keeps N on the lanes.
    logKT = (-C / eps).T                                        # (K, N)
    neg_cap = jnp.asarray(-1e30, dtype=dt)

    def one_iter(_, fg):
        log_u, log_v = fg                                       # (N,), (K,)
        lse_v = jax.nn.logsumexp(logKT + log_v[:, None], axis=0)   # (N,)
        log_u = ua * (log_a - jnp.maximum(lse_v, neg_cap))
        log_u = jnp.where(jnp.isfinite(log_a), log_u, -jnp.inf)
        lse_u = jax.nn.logsumexp(logKT + log_u[None, :], axis=1)   # (K,)
        log_v = vb * (log_b - jnp.maximum(lse_u, neg_cap))
        return log_u, log_v

    if assoc_kernels.use_sinkhorn_kernel(cfg.sinkhorn_kernel):
        # One Pallas kernel holds the whole 50-iteration fixed point on-chip
        # (the XLA unrolled loop is ~300 dispatch-floor HLOs/scan; see
        # ops/assoc_kernels.py). Math-identical to the fallback below.
        import math
        piT = assoc_kernels.sinkhorn_piT(
            logKT, log_a, n_iter=cfg.k_sinkhorn, ua=float(ua), vb=float(vb),
            log_b=-math.log(float(K)))
        pi = piT.T
    else:
        log_u0 = jnp.zeros_like(log_a)
        log_v0 = jnp.zeros_like(log_b)
        # lax.scan with unroll: the body is two logsumexps — far too small
        # to amortize per-iteration while-loop overhead on TPU (profiled
        # ~1 ms for 50 fori iterations); unrolling 10 bodies per step
        # recovers it.
        def scan_body(fg, _):
            return one_iter(0, fg), None
        (log_u, log_v), _ = jax.lax.scan(
            scan_body, (log_u0, log_v0), None, length=cfg.k_sinkhorn,
            unroll=min(10, max(cfg.k_sinkhorn, 1)))
        log_pi = log_u[:, None] + logKT.T + log_v[None, :]
        pi = jnp.where(jnp.isfinite(log_pi), jnp.exp(log_pi), 0.0)
    pi = pi * a_mask[:, None] * cand_valid.astype(dt)

    # Hard per-row mass cap: a measurement can never transport MORE than its
    # declared budget a_i. The soft unbalanced exponents keep the marginals
    # only approximately; when the candidate field is dense and ambiguous
    # (long planar walls, mature map) the plan overshoots — observed 2.7x the
    # scan budget at 200 scans / low turn rate, which inflates the downstream
    # pose evidence and diverges the filter. Transporting LESS than a_i stays
    # allowed (that remainder is novelty mass).
    row_raw = jnp.sum(pi, axis=1)
    row_cap = jnp.minimum(1.0, a / jnp.maximum(row_raw, cfg.eps_mass))
    pi = pi * row_cap[:, None]

    row_masses = jnp.sum(pi, axis=1)
    col_masses = jnp.sum(pi, axis=0)
    b = jnp.exp(log_b)
    ess_ot = jnp.sum(row_masses) ** 2 / (jnp.sum(row_masses ** 2) + cfg.eps_mass)

    certs = {
        # ExpectedEffect: declared transport budget (sum of the source
        # marginal) vs mass the unbalanced plan actually moved; divergence =
        # the KL-relaxed marginals' shrink (which novelty insertion absorbs).
        "ot.effect_predicted": jnp.sum(a),
        "ot.effect_realized": jnp.sum(pi),
        "ot.marginal_defect_a": jnp.linalg.norm(row_masses - a),
        "ot.marginal_defect_b": jnp.linalg.norm(col_masses - b),
        "ot.transport_mass_total": jnp.sum(pi),
        "ot.sum_novel": jnp.sum(jnp.maximum(a - row_masses, 0.0)),
        "ot.ess": ess_ot,
        "ot.total_cost": jnp.sum(pi * C),
    }
    result = AssociationResult(
        responsibilities=pi,
        cand_view_idx=cand_view_idx,
        cand_slab_idx=cand_slab_idx,
        cand_valid=cand_valid,
        row_masses=row_masses,
        cost=C,
        cand_packed=cand_packed,
        row_budget=a,
    )
    return result, certs


def novelty_mass(result: AssociationResult, meas_valid, eps_mass: float):
    """Novelty per measurement: max(a - transported row mass, 0) with the
    SAME source marginal the plan used (parity: pipeline.py:1330-1337)."""
    del meas_valid, eps_mass  # folded into the stored row budget
    return jnp.maximum(result.row_budget - result.row_masses, 0.0)
