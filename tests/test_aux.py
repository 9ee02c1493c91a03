"""Aux subsystem tests: checkpoint/resume (bit-exact), time alignment."""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from fl_slam_tpu.checkpoint import load_state, save_state
from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
from fl_slam_tpu.io.time_alignment import (align_gt_timebase,
                                           estimate_offset_drift,
                                           monotonicity_report,
                                           overlap_fraction)
from fl_slam_tpu.pipeline import init_state, process_scan

CFG = GCConfig.small()


class TestCheckpoint:
    @pytest.mark.slow
    def test_resume_is_bit_exact(self, tmp_path):
        ds = simulate(CFG, n_scans=6, seed=2)
        scans = to_scan_inputs(ds, CFG)
        anchor0 = jnp.asarray(ds.gt_poses[0], CFG.jdtype)
        t0 = float(ds.gt_stamps[0]) - 0.1

        def step(state, i):
            return process_scan(state, jax.tree.map(lambda a: a[i], scans),
                                CFG)

        # run 6 scans straight
        s = init_state(CFG, anchor0=anchor0, t0=t0)
        for i in range(6):
            s, out_full = step(s, i)

        # run 3 scans, checkpoint, resume, run 3 more
        s2 = init_state(CFG, anchor0=anchor0, t0=t0)
        for i in range(3):
            s2, _ = step(s2, i)
        path = os.path.join(tmp_path, "ckpt.npz")
        save_state(path, s2, cfg=CFG)
        s3 = load_state(path, init_state(CFG, anchor0=anchor0, t0=t0),
                        cfg=CFG)
        for i in range(3, 6):
            s3, out_resumed = step(s3, i)

        for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(s3)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(out_full.pose),
                                      np.asarray(out_resumed.pose))

    def test_shape_mismatch_rejected(self, tmp_path):
        import pytest
        s = init_state(CFG)
        path = os.path.join(tmp_path, "c.npz")
        save_state(path, s, cfg=CFG)
        cfg2 = CFG.replace(m_tile=CFG.m_tile * 2)
        other = init_state(cfg2)
        # config-aware load reports the exact mismatching field
        with pytest.raises(ValueError, match="m_tile"):
            load_state(path, other, cfg=cfg2)
        # config-less load still fails on shape
        with pytest.raises(ValueError):
            load_state(path, other)


class TestTimeAlignment:
    def test_monotonicity(self):
        r = monotonicity_report(np.array([0.0, 0.1, 0.2, 0.15, 0.3]))
        assert not r["monotonic"] and r["n_backwards"] == 1

    def test_offset_drift_recovered(self):
        t = np.linspace(0, 100, 500)
        t_b = t + 0.25 + 5e-6 * (t - t[0])
        r = estimate_offset_drift(t, t_b)
        assert abs(r["offset_s"] - 0.25) < 1e-6
        assert abs(r["drift_ppm"] - 5.0) < 0.1

    def test_gt_alignment_and_overlap(self):
        est = np.linspace(100, 160, 600)
        gt = np.linspace(0, 80, 800)  # starts together in its own clock
        off = align_gt_timebase(gt, est)
        assert abs(off - 100.0) < 4.5  # 5th-percentile robustification slack
        assert overlap_fraction(gt, est, off) > 0.9
        assert overlap_fraction(gt, est, 0.0) < 0.01
