"""Certificate schema + budget assertion tests (parity: the reference's
test_cert_schema.py and test_budget_assertions.py)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from fl_slam_tpu import certs as C
from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
from fl_slam_tpu.pipeline import init_state, process_scan

CFG = GCConfig.small()


def _one_scan_certs():
    ds = simulate(CFG, n_scans=2, seed=0)
    scans = to_scan_inputs(ds, CFG)
    state = init_state(CFG, anchor0=jnp.asarray(ds.gt_poses[0], CFG.jdtype),
                       t0=float(ds.gt_stamps[0]) - 0.1)
    state, out = process_scan(state, jax.tree.map(lambda a: a[0], scans), CFG)
    return out.certs


class TestCertSchema:
    @pytest.mark.slow
    def test_every_key_categorized(self):
        certs = _one_scan_certs()
        uncat = [k for k in certs if C.category(k) == "other"]
        assert not uncat, f"uncategorized cert keys: {uncat}"

    def test_schema_deterministic(self):
        s1 = C.tape_schema(_one_scan_certs())
        s2 = C.tape_schema(_one_scan_certs())
        assert s1 == s2 and len(s1) > 40

    def test_aggregate_semantics(self):
        certs = _one_scan_certs()
        agg = C.aggregate(certs)
        assert float(agg["agg.nll_total"]) >= 0.0
        assert float(agg["agg.psd_projection_total"]) >= 0.0
        # triggers nonnegative; frobenius flag consistent with triggers
        t = float(agg["agg.trigger_magnitude"])
        assert t >= 0.0
        assert float(agg["agg.frobenius_applied"]) == (1.0 if t > 0 else 0.0)

    def test_aggregate_is_jittable(self):
        certs = _one_scan_certs()
        agg = jax.jit(C.aggregate)(certs)
        assert np.isfinite(float(agg["agg.nll_total"]))


class TestExpectedEffect:
    """Per-operator predicted-vs-realized objective pairs (parity: reference
    ExpectedEffect, certificates.py:348-510)."""

    def test_pairs_present_and_complete(self):
        certs = _one_scan_certs()
        pairs = C.effect_pairs(certs)
        # EVERY operator of the pinned registry reports a pair, and nothing
        # outside it does (reference contract: every operator returns
        # (result, certs, ExpectedEffect) — the exact-set assert makes a
        # dropped pair or an unregistered new operator a test failure)
        assert set(pairs) == set(C.EXPECTED_EFFECT_OPS), (
            sorted(set(C.EXPECTED_EFFECT_OPS) - set(pairs)),
            sorted(set(pairs) - set(C.EXPECTED_EFFECT_OPS)))
        # no orphan halves
        for k in certs:
            if k.endswith(C.EFFECT_SUFFIX_P):
                assert k[:-len(C.EFFECT_SUFFIX_P)] + C.EFFECT_SUFFIX_R in certs
            if k.endswith(C.EFFECT_SUFFIX_R):
                assert k[:-len(C.EFFECT_SUFFIX_R)] + C.EFFECT_SUFFIX_P in certs

    def test_consistency_bounds(self):
        certs = _one_scan_certs()
        pairs = C.effect_pairs(certs)
        for op, (p, r) in pairs.items():
            p, r = float(p), float(r)
            assert np.isfinite(p) and np.isfinite(r), op
            # realized never exceeds predicted for the budgeted/masked ops
            if op in ("ot", "map", "map.insert"):
                assert r <= p + 1e-6, (op, p, r)
        agg = C.aggregate(certs)
        assert float(agg["agg.effect_divergence"]) >= 0.0

    def test_fusion_effect_exact_without_projection(self):
        """With PSD evidence and a PSD prior the projection is a no-op, so
        predicted == realized information gain exactly."""
        from fl_slam_tpu.core.belief import identity_belief
        from fl_slam_tpu.ops import fusion
        b = identity_belief(dtype=jnp.float64, prior_info=1.0)
        L_ev = jnp.eye(b.L.shape[0], dtype=jnp.float64) * 0.5
        h_ev = jnp.zeros(b.h.shape, jnp.float64)
        _, certs = fusion.info_fusion_additive(b, L_ev, h_ev, 1.0,
                                               eps_psd=1e-12)
        np.testing.assert_allclose(float(certs["fusion.effect_predicted"]),
                                   float(certs["fusion.effect_realized"]),
                                   rtol=1e-9)


class TestBudgetAssertions:
    """The fixed-cost contract: declared budgets are compile-time facts
    (spec section 12.9.1)."""

    def test_small_budget_declarations(self):
        b = C.compute_budget(CFG)
        assert b["largest_tensor_shape"] == (CFG.n_tiles_pool, CFG.m_tile,
                                             3, 3)
        assert b["assoc_cost_shape"] == (CFG.n_meas,
                                         CFG.n_active_tiles * CFG.m_tile_view)
        assert b["segment_sum_k"] == CFG.k_assoc
        assert b["host_syncs_per_scan"] == 0
        assert b["jit_programs"] == 1

    def test_production_budgets_within_hbm(self):
        cfg = GCConfig.tpu()
        b = C.compute_budget(cfg)
        # atlas pool must fit comfortably in a v5e's 16 GB HBM
        assert b["atlas_bytes_est"] < 2 * 1024 ** 3, b["atlas_bytes_est"]
        # dense association cost matrix stays small (MXU-friendly)
        assert b["assoc_cost_bytes"] < 64 * 1024 ** 2
        # merge pairwise work is bounded by the subset cap
        S, a, bb = b["merge_pairwise_shape"]
        assert a <= cfg.merge_max_tile and a * bb <= 256 * 256

    def test_budget_change_is_recompile(self):
        """Configs are hashable statics: different budgets => different
        config objects (the by-construction fixed-cost contract)."""
        c1, c2 = GCConfig.small(), GCConfig.small(n_points=512)
        assert hash(c1) != hash(c2)
        assert c1 != c2


class TestConfigValidation:
    """GCConfig.validate fail-fast ranges (parity: the reference's budget/
    param validation at node start, backend_node.py:548-586)."""

    def test_canonical_configs_pass(self):
        from fl_slam_tpu.config import GCConfig
        GCConfig.small().validate()
        GCConfig.tpu().validate()

    def test_silent_sign_flips_rejected(self):
        from fl_slam_tpu.config import GCConfig
        import pytest as _pytest
        for bad in (dict(camera_fuse_geom_scale=-0.5),
                    dict(visual_evidence_weight=-1.0),
                    dict(odom_pose_mix=1.5),
                    dict(forgetting_factor=0.0),
                    dict(ot_epsilon=0.0),
                    dict(view_page=100)):   # does not divide m_tile
            with _pytest.raises(ValueError):
                GCConfig.tpu(**bad).validate()
