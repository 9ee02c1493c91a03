"""End-to-end pipeline tests: synthetic bag -> lax.scan replay -> ATE gates.

The canonical system test (SURVEY.md section 4 tier c): mirror of the
reference's ``run_and_evaluate_gc.sh`` stage structure, on synthetic data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.eval.metrics import ate, rpe
from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
from fl_slam_tpu.pipeline import init_state, process_scan, replay

# Production-scale replay compiles dominate the suite wall clock: the
# whole module is the SLOW tier (pytest.ini; fast tier = -m "not slow").
pytestmark = pytest.mark.slow

CFG = GCConfig.small()


@pytest.fixture(scope="module")
def dataset():
    return simulate(CFG, n_scans=25, seed=3)


@pytest.fixture(scope="module")
def replay_result(dataset):
    scans = to_scan_inputs(dataset, CFG)
    anchor0 = jnp.asarray(dataset.gt_poses[0], dtype=CFG.jdtype)
    state = init_state(CFG, anchor0=anchor0,
                       t0=float(dataset.gt_stamps[0]) - 0.1)
    final_state, outs = replay(state, scans, CFG)
    return final_state, outs


class TestReplay:
    def test_poses_finite_and_shaped(self, dataset, replay_result):
        _, outs = replay_result
        poses = np.asarray(outs.pose)
        assert poses.shape == (25, 6)
        assert np.isfinite(poses).all()

    def test_ate_within_gate(self, dataset, replay_result):
        _, outs = replay_result
        poses = np.asarray(outs.pose)
        m = ate(poses, dataset.gt_poses, align="initial")
        # Odometry noise is ~1 cm / 0.1 deg; the fused estimate must stay in
        # that class over a 2 m / 2.5 s trajectory.
        assert m["trans"]["rmse"] < 0.05, m
        assert m["rot_deg"]["rmse"] < 0.5, m

    def test_slam_beats_drifting_odometry(self):
        """The SLAM gate: with drifting wheel odometry (honest covariance),
        the fused estimate must beat raw odometry on BOTH metrics, and the
        scan-to-map evidence must contribute (better than odom even though
        odom is an input)."""
        cfg = GCConfig.small()
        ds = simulate(cfg, n_scans=50, seed=3, odom_drift_vel_scale=1.03,
                      odom_drift_yaw_rate=0.01)
        scans = to_scan_inputs(ds, cfg)
        anchor0 = jnp.asarray(ds.gt_poses[0], dtype=cfg.jdtype)
        state = init_state(cfg, anchor0=anchor0,
                           t0=float(ds.gt_stamps[0]) - 0.1)
        _, outs = replay(state, scans, cfg)
        m = ate(np.asarray(outs.pose), ds.gt_poses, align="initial")
        m_odom = ate(ds.scans["odom_pose"], ds.gt_poses, align="initial")
        assert m["trans"]["rmse"] < m_odom["trans"]["rmse"], (m, m_odom)
        assert m["rot_deg"]["rmse"] < m_odom["rot_deg"]["rmse"], (m, m_odom)

    @pytest.mark.parametrize("dtype", ["float64", "float32"])
    def test_rotation_stress(self, dtype):
        """Rotation-stress gate (VERDICT r1 weak 4 / next 10): >= pi total
        yaw on tight arcs (3.5 rad, 1.1 m radius), run in BOTH dtypes — the
        round-1 f32 conditioning cliff (1.1 -> 2.8 deg rotation walk) was
        caught only by ad-hoc production runs; this pins it in the suite.
        Calibrated margins ~2x over measured (f64 0.36 deg, f32 0.55 deg)."""
        cfg = GCConfig.small(dtype=dtype)
        ds = simulate(cfg, n_scans=50, seed=11, turn_rate=0.7)
        scans = to_scan_inputs(ds, cfg)
        state = init_state(cfg, anchor0=jnp.asarray(ds.gt_poses[0],
                                                    cfg.jdtype),
                           t0=float(ds.gt_stamps[0]) - 0.1)
        _, outs = replay(state, scans, cfg)
        m = ate(np.asarray(outs.pose), ds.gt_poses, align="initial")
        assert m["trans"]["rmse"] < 0.10, m
        assert m["rot_deg"]["rmse"] < (1.2 if dtype == "float32" else 0.7), m

    def test_rpe_within_gate(self, dataset, replay_result):
        _, outs = replay_result
        poses = np.asarray(outs.pose)
        m = rpe(poses, dataset.gt_poses, delta_m=0.5)
        assert m["trans"]["rmse"] < 0.05, m

    def test_map_grows_then_stabilizes(self, dataset, replay_result):
        final_state, outs = replay_result
        from fl_slam_tpu.structures.atlas import total_count
        n = int(total_count(final_state.atlas))
        assert n > 0
        inserted = np.asarray(outs.certs["map.inserted_count"])
        # Early scans insert; after the map covers the corridor the per-scan
        # insertions must fall (fuse explains re-observations).
        assert inserted[:5].sum() > 0

    def test_certs_finite(self, replay_result):
        _, outs = replay_result
        for k, v in outs.certs.items():
            arr = np.asarray(v)
            assert np.isfinite(arr).all(), f"cert {k} has non-finite entries"

    def test_scan_seq_advances(self, replay_result):
        final_state, _ = replay_result
        assert int(final_state.scan_seq) == 25

    def test_adaptive_noise_moves(self, replay_result):
        final_state, _ = replay_result
        import fl_slam_tpu.ops.noise as noise_ops
        st0 = noise_ops.init_measurement_noise(CFG)
        # IW states must have absorbed suffstats (nu grows with scans).
        assert float(jnp.sum(final_state.meas_noise.nu)) > float(jnp.sum(st0.nu))

    def test_replay_deterministic(self, dataset):
        scans = to_scan_inputs(dataset, CFG)
        anchor0 = jnp.asarray(dataset.gt_poses[0], dtype=CFG.jdtype)
        t0 = float(dataset.gt_stamps[0]) - 0.1

        def run():
            st = init_state(CFG, anchor0=anchor0, t0=t0)
            _, outs = replay(st, scans, CFG)
            return np.asarray(outs.pose)

        p1, p2 = run(), run()
        np.testing.assert_array_equal(p1, p2)

    def test_single_step_matches_replay(self, dataset, replay_result):
        """scan-by-scan process_scan == lax.scan replay (same trace)."""
        _, outs = replay_result
        scans = to_scan_inputs(dataset, CFG)
        anchor0 = jnp.asarray(dataset.gt_poses[0], dtype=CFG.jdtype)
        state = init_state(CFG, anchor0=anchor0,
                           t0=float(dataset.gt_stamps[0]) - 0.1)
        step = jax.jit(lambda s, sc: process_scan(s, sc, CFG))
        poses = []
        for i in range(3):
            scan_i = jax.tree.map(lambda a: a[i], scans)
            state, out = step(state, scan_i)
            poses.append(np.asarray(out.pose))
        np.testing.assert_allclose(np.stack(poses), np.asarray(outs.pose)[:3],
                                   rtol=1e-8, atol=1e-10)


class TestHypothesisBank:
    """MHT semantics (this build's upgrade of the reference's frozen bank,
    docs/PIPELINE_DESIGN_GAPS.md:396): diverse initial hypotheses + per-scan
    likelihood weight updates must actually move the weights, and the
    barycenter must stay at least as good as raw odometry."""

    def test_weights_respond_and_estimate_stays_good(self):
        cfg = GCConfig.small().replace(hyp_init_spread_rot=0.08,
                                       hyp_init_spread_trans=0.15,
                                       hyp_nll_temp=1.0)
        ds = simulate(cfg, n_scans=30, seed=5, odom_drift_vel_scale=1.03,
                      odom_drift_yaw_rate=0.01)
        scans = to_scan_inputs(ds, cfg)
        anchor0 = jnp.asarray(ds.gt_poses[0], dtype=cfg.jdtype)
        state = init_state(cfg, anchor0=anchor0,
                           t0=float(ds.gt_stamps[0]) - 0.1)
        fs, outs = replay(state, scans, cfg)
        w = np.asarray(fs.hyp_weights)
        assert np.isfinite(w).all() and abs(w.sum() - 1.0) < 1e-6
        # Weights must respond to data: the unperturbed hypothesis 0 should
        # dominate the deliberately-offset ones.
        assert w.max() - w.min() > 0.05, w
        assert int(np.argmax(w)) == 0, w
        # The published barycenter must not be degraded by the bank.
        m = ate(np.asarray(outs.pose), ds.gt_poses, align="initial")
        mo = ate(np.asarray(ds.scans["odom_pose"]), ds.gt_poses,
                 align="initial")
        assert m["trans"]["rmse"] < mo["trans"]["rmse"], (m, mo)
        assert m["rot_deg"]["rmse"] < mo["rot_deg"]["rmse"], (m, mo)

    def test_zero_spread_is_reference_parity(self):
        """Spread 0 (the default) keeps the bank identical and the weights
        frozen uniform — bit-parity with the pre-MHT pipeline."""
        cfg = GCConfig.small()
        ds = simulate(cfg, n_scans=8, seed=3)
        scans = to_scan_inputs(ds, cfg)
        state = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
        fs, _ = replay(state, scans, cfg)
        w = np.asarray(fs.hyp_weights)
        np.testing.assert_allclose(w, np.full_like(w, 1.0 / cfg.k_hyp),
                                   atol=1e-12)

    def test_inert_bank_equals_k1(self):
        """The reference's frozen-uniform K=4 bank is semantically inert:
        all hypotheses see identical inputs, weights never move, the map is
        updated from hypothesis 0, and the barycenter of identical beliefs
        is that belief (``backend_node.py:2079-2083``). Therefore k_hyp=1
        must reproduce the K=4 spread-0 replay to fp-associativity — the
        equivalence that lets the production TPU config run the bank at
        K=1 (VERDICT round-1 item 6 option b) without a semantics delta."""
        ds = simulate(CFG, n_scans=10, seed=3)
        poses = {}
        for k in (CFG.k_hyp, 1):
            cfg = CFG.replace(k_hyp=k)
            scans = to_scan_inputs(ds, cfg)
            state = init_state(cfg, t0=float(ds.gt_stamps[0]) - 0.1)
            _, outs = replay(state, scans, cfg)
            poses[k] = np.asarray(outs.pose)
        np.testing.assert_allclose(poses[1], poses[CFG.k_hyp],
                                   rtol=1e-9, atol=1e-11)


class TestChunkedReplay:
    """view_refresh_every > 1: membership/maintenance at chunk boundaries,
    resident view rows in between (the production TPU cadence R=4)."""

    def test_r4_matches_r1_accuracy_class(self):
        ds = simulate(CFG, n_scans=24, seed=3)
        a0 = jnp.asarray(ds.gt_poses[0], CFG.jdtype)
        t0 = float(ds.gt_stamps[0]) - 0.1
        metrics = {}
        for key, kw in (
                (1, dict(view_refresh_every=1)),
                (4, dict(view_refresh_every=4)),
                # production cadence add-on: merge once per chunk
                ("4m", dict(view_refresh_every=4, merge_at_chunk=True))):
            cfg = GCConfig.small(**kw)
            scans = to_scan_inputs(ds, cfg)
            _, outs = replay(init_state(cfg, anchor0=a0, t0=t0), scans, cfg)
            poses = np.asarray(outs.pose)
            assert np.isfinite(poses).all()
            metrics[key] = ate(poses, ds.gt_poses, align="initial")
        # bounded staleness: same accuracy class, not bit equality
        for key in (4, "4m"):
            assert metrics[key]["trans"]["rmse"] \
                < 2.0 * metrics[1]["trans"]["rmse"] + 0.01, (key, metrics)
            assert metrics[key]["rot_deg"]["rmse"] \
                < 2.0 * metrics[1]["rot_deg"]["rmse"] + 0.05, (key, metrics)

    def test_r_falls_back_to_divisor(self):
        """T=10 with R=4 -> largest divisor (2) is used; replay still runs."""
        cfg = GCConfig.small(view_refresh_every=4)
        ds = simulate(cfg, n_scans=10, seed=7)
        scans = to_scan_inputs(ds, cfg)
        s = init_state(cfg, anchor0=jnp.asarray(ds.gt_poses[0], cfg.jdtype),
                       t0=float(ds.gt_stamps[0]) - 0.1)
        fs, outs = replay(s, scans, cfg)
        assert np.isfinite(np.asarray(outs.pose)).all()
        assert int(fs.scan_seq) == 10

    def test_inserts_survive_chunk_writeback(self):
        """Map mass inserted mid-chunk must survive the end-of-chunk view
        write-back (eviction exclusion of resident columns)."""
        from fl_slam_tpu.structures.atlas import total_count
        cfg = GCConfig.small(view_refresh_every=4)
        ds = simulate(cfg, n_scans=12, seed=3)
        scans = to_scan_inputs(ds, cfg)
        s = init_state(cfg, anchor0=jnp.asarray(ds.gt_poses[0], cfg.jdtype),
                       t0=float(ds.gt_stamps[0]) - 0.1)
        fs, outs = replay(s, scans, cfg)
        ins = np.asarray(outs.certs["map.inserted_mass"]).sum()
        assert ins > 0
        assert int(total_count(fs.atlas)) > 0
        w = np.asarray(fs.atlas.weights)
        assert np.isfinite(w).all() and w.min() >= 0


class TestApproxTopK:
    def test_approx_selection_matches_exact_metrics(self):
        """The production TPU config runs every selection (view extraction,
        association candidates, insert eviction, merge subsets) through
        approx_max_k (recall ~0.95); the parity suite runs exact top_k. This
        gate replays the same bag both ways and requires the approximate
        path to stay in the same accuracy class and finite throughout
        (ADVICE r1: the approx path was never exercised by tests)."""
        ds = simulate(CFG, n_scans=25, seed=3)
        results = {}
        for approx in (False, True):
            cfg = CFG.replace(approx_topk=approx)
            scans = to_scan_inputs(ds, cfg)
            state = init_state(cfg, anchor0=jnp.asarray(
                ds.gt_poses[0], dtype=cfg.jdtype),
                t0=float(ds.gt_stamps[0]) - 0.1)
            _, outs = replay(state, scans, cfg)
            poses = np.asarray(outs.pose)
            assert np.isfinite(poses).all()
            results[approx] = ate(poses, ds.gt_poses, align="initial")
        exact, approx = results[False], results[True]
        assert approx["trans"]["rmse"] < max(2.0 * exact["trans"]["rmse"],
                                             0.05), results
        assert approx["rot_deg"]["rmse"] < max(2.0 * exact["rot_deg"]["rmse"],
                                               0.5), results


_SEGMENT_EQUIV_SCRIPT = """
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
from fl_slam_tpu.pipeline import init_state, replay, replay_segments
cfg = GCConfig.small(view_refresh_every=4)
ds = simulate(cfg, n_scans=16, seed=3)
scans = to_scan_inputs(ds, cfg)
a0 = jnp.asarray(ds.gt_poses[0], cfg.jdtype)
t0 = float(ds.gt_stamps[0]) - 0.1
fs_m, outs_m = replay(init_state(cfg, anchor0=a0, t0=t0), scans, cfg)
halves = [jax.tree.map(lambda a: a[:8], scans),
          jax.tree.map(lambda a: a[8:], scans)]
fs_s, outs_s = replay_segments(init_state(cfg, anchor0=a0, t0=t0),
                               halves, cfg)
# Segment boundaries on chunk boundaries: identical trajectory (the
# inter-segment flush is an idempotent write-back).
np.testing.assert_allclose(np.asarray(outs_s.pose),
                           np.asarray(outs_m.pose), atol=1e-9)
assert int(fs_s.scan_seq) == int(fs_m.scan_seq) == 16
assert outs_s.pose.shape == outs_m.pose.shape
assert set(outs_s.certs) == set(outs_m.certs)
assert np.asarray(outs_s.certs["map.inserted_mass"]).shape == (16,)
print("SEGMENT_EQUIV_OK")
"""


class TestSegmentedReplay:
    """replay_segments: host loop over fixed-shape segments, one compiled
    program reused — the big-bag path (one-shot staging of an hour-long bag
    does not fit on device beside the tile pool).

    Runs HERMETICALLY in a subprocess: the XLA:CPU compiler segfaults
    nondeterministically when compiling large programs late in a long
    many-program process (reproduced at jax compiler.py
    backend_compile_and_load mid-suite; the identical test passes
    standalone), and this test compiles two fresh replay programs."""

    def test_segments_match_monolithic(self):
        import os
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, JAX_PLATFORMS="cpu", GC_COMPILE_CACHE="off",
                   PYTHONPATH=repo)
        r = subprocess.run([sys.executable, "-c", _SEGMENT_EQUIV_SCRIPT],
                           capture_output=True, text=True, timeout=900,
                           env=env, cwd=repo)
        assert r.returncode == 0 and "SEGMENT_EQUIV_OK" in r.stdout, (
            r.stdout[-1000:], r.stderr[-2000:])


class TestScalarTailKernel:
    """ops/belief_kernels.scalar_tail (interpret mode, CPU-runnable) must
    reproduce the XLA reference tail (fusion -> recompose -> drift ->
    barycenter -> IW apply) through the FULL pipeline: same cert keys, same
    poses/certs at scan 0 to fp tolerance, same trajectory class over 12
    scans (f32 chaos compounds the ~1e-7 solve deltas downstream)."""

    @pytest.mark.parametrize("variant", ["default", "relative_odom"])
    def test_kernel_path_matches_xla(self, variant):
        from fl_slam_tpu.ops import belief_kernels

        cfg = GCConfig.small(dtype="float32", k_hyp=1)
        sim_kw = {}
        if variant == "relative_odom":
            # the relative/mixed odom factor has its own kernel branch
            # (dark at the neutral default) — hold it to the same
            # XLA-equivalence gate. Drive LARGE yaw increments (~0.08
            # rad/scan): the kernel must apply V(omega) to the se(3)-log
            # translation when composing pose_prev ∘ Exp(d_od); at small
            # increments the missing-V bias (first order in omega) hides
            # under the fp tolerance (advisor round-3 #1).
            cfg = cfg.replace(odom_pose_relative=True, odom_pose_mix=0.5,
                              odom_pose_rot_scale=0.3)
            sim_kw = dict(turn_rate=0.8, speed=1.5)
        ds = simulate(cfg, n_scans=12, seed=3, odom_drift_vel_scale=1.03,
                      odom_drift_yaw_rate=0.01, **sim_kw)
        scans = to_scan_inputs(ds, cfg)
        outs = {}
        try:
            for mode in ("xla", "kernel"):
                belief_kernels.FORCE_INTERPRET = (mode == "kernel")
                jax.clear_caches()
                state = init_state(
                    cfg, anchor0=jnp.asarray(ds.gt_poses[0], cfg.jdtype),
                    t0=float(ds.gt_stamps[0]) - 0.1)
                _, o = replay(state, scans, cfg)
                outs[mode] = (np.asarray(o.pose),
                              {k: np.asarray(v) for k, v in o.certs.items()})
        finally:
            belief_kernels.FORCE_INTERPRET = False
        px, cx = outs["xla"]
        pk, ck = outs["kernel"]
        assert set(cx) == set(ck), sorted(set(cx) ^ set(ck))
        assert np.abs(px - pk).max() < 1e-3
        bad = [(k, float(cx[k][0]), float(ck[k][0])) for k in sorted(cx)
               if abs(cx[k][0] - ck[k][0])
               > 1e-4 * max(abs(cx[k][0]), abs(ck[k][0])) + 1e-6]
        assert not bad, bad
