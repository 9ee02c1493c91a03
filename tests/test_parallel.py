"""Multi-chip batched replay tests on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io.synthetic import simulate, to_scan_inputs
from fl_slam_tpu.parallel.replicas import (batched_replay, batched_step,
                                           init_states_batched, make_mesh,
                                           shard_scan_inputs)

CFG = GCConfig.small(n_points=64, imu_len=32, n_surfel=32, m_tile=128,
                     n_tiles_pool=16, m_tile_view=64, merge_max_tile=64,
                     k_insert=8, k_hyp=2)


def _instances(n, T):
    """n independent datasets stacked on a leading instance axis."""
    dss = [simulate(CFG, n_scans=T, seed=100 + i) for i in range(n)]
    scans = [to_scan_inputs(ds, CFG) for ds in dss]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    anchors = [jnp.asarray(ds.gt_poses[0], CFG.jdtype) for ds in dss]
    return dss, stacked, anchors


@pytest.mark.slow
class TestBatchedReplay:
    def test_eight_instances_sharded(self):
        n = jax.device_count()
        assert n == 8, "conftest should provide 8 virtual devices"
        dss, scans, anchors = _instances(n, T=3)
        mesh = make_mesh()
        states = init_states_batched(CFG, n, anchors0=anchors)
        shard = jax.sharding.NamedSharding(mesh,
                                           jax.sharding.PartitionSpec("inst"))
        states = jax.tree.map(lambda a: jax.device_put(a, shard), states)
        scans = shard_scan_inputs(scans, mesh)

        run = batched_replay(CFG, mesh)
        fs, outs = run(states, scans)
        poses = np.asarray(outs.pose)
        assert poses.shape == (n, 3, 6)
        assert np.isfinite(poses).all()
        assert int(np.asarray(fs.scan_seq).min()) == 3
        # Instances have different seeds: trajectories must differ.
        assert np.abs(poses[0] - poses[1]).max() > 1e-6

    def test_multiple_instances_per_device(self):
        """The BASELINE stretch shape (64 instances on v5e-8) is instances =
        k * devices: the leading axis shards k-per-device and vmap covers
        the within-device batch. 16-on-8 exercises exactly that split."""
        n = 2 * jax.device_count()
        dss, scans, anchors = _instances(n, T=2)
        mesh = make_mesh()
        states = init_states_batched(CFG, n, anchors0=anchors)
        run = batched_replay(CFG, mesh)
        fs, outs = run(states, shard_scan_inputs(scans, mesh))
        poses = np.asarray(outs.pose)
        assert poses.shape == (n, 2, 6)
        assert np.isfinite(poses).all()
        # Distinct seeds on the SAME device must stay independent.
        assert np.abs(poses[0] - poses[1]).max() > 1e-6

    def test_batched_matches_single(self):
        """Instance 0 of the batched run == a plain single replay."""
        from fl_slam_tpu.pipeline import init_state, replay
        n = jax.device_count()
        dss, scans, anchors = _instances(n, T=3)
        mesh = make_mesh()
        states = init_states_batched(CFG, n, anchors0=anchors)
        run = batched_replay(CFG, mesh)
        fs, outs = run(jax.tree.map(
            lambda a: jax.device_put(
                a, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("inst"))), states),
            shard_scan_inputs(scans, mesh))

        # Same default t0=0.0 as init_states_batched uses.
        s0 = init_state(CFG, anchor0=anchors[0])
        _, outs_single = replay(s0, jax.tree.map(lambda a: a[0], scans), CFG)
        diff = np.abs(np.asarray(outs.pose)[0] - np.asarray(outs_single.pose))
        # vmapped and single traces fuse reductions in different orders, so
        # bitwise equality is not expected — but a real batched-vs-single
        # divergence (wrong instance slicing, state bleed) is O(1e-2)+.
        assert diff.max() < 1e-5, f"batched diverges from single: {diff.max()}"


class TestMemoryEnvelope:
    """certs.memory_envelope: the v5e instance-density limit is encoded
    arithmetic (8/chip fits, 16 fails BEFORE touching the device), not
    folklore (round-3 verdict item 6)."""

    def test_production_density_limit_encoded(self):
        from fl_slam_tpu.certs import assert_memory_envelope
        prod = GCConfig.tpu()
        v5e = 16_000_000_000
        env = assert_memory_envelope(prod, 8, limit_bytes=v5e)
        assert 0 < env["peak_bytes_est"] <= v5e
        # state_bytes is exact (eval_shape): the ~470 MB production pool
        assert 3e8 < env["state_bytes"] < 7e8
        with pytest.raises(ValueError, match="max instances/device"):
            assert_memory_envelope(prod, 16, limit_bytes=v5e)

    def test_staged_bytes_count_against_the_limit(self):
        from fl_slam_tpu.certs import assert_memory_envelope
        prod = GCConfig.tpu()
        v5e = 16_000_000_000
        with pytest.raises(ValueError, match="staged"):
            assert_memory_envelope(prod, 8, staged_bytes=8_000_000_000,
                                   limit_bytes=v5e)

    def test_unknown_limit_is_noop_on_cpu(self):
        from fl_slam_tpu.certs import assert_memory_envelope
        env = assert_memory_envelope(GCConfig.tpu(), 1024)
        assert env["limit_bytes"] is None

    def test_init_states_batched_fails_fast(self):
        from fl_slam_tpu.certs import memory_envelope
        import os
        prod = GCConfig.tpu()
        per = memory_envelope(prod, 1)["state_bytes"]
        os.environ["GC_HBM_BYTES"] = str(int(per))   # 1 state fills "HBM"
        try:
            with pytest.raises(ValueError, match="memory envelope"):
                init_states_batched(prod, 2)
        finally:
            del os.environ["GC_HBM_BYTES"]


@pytest.mark.slow
class TestDryrunHermetic:
    def test_dryrun_multichip_subprocess(self):
        """The driver gate: dryrun must pass regardless of host TPU state.

        Round-1 regression: MULTICHIP_r01.json rc=1 (libtpu AOT mismatch)
        because the dryrun touched the real TPU runtime. The hermetic
        re-exec must succeed even with TPU plugin env vars present.
        """
        import os
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import __graft_entry__ as g
        # Simulate a hostile driver env: point the TPU plugin vars at junk.
        os.environ["PALLAS_AXON_POOL_IPS"] = "203.0.113.1"
        try:
            g.dryrun_multichip(4)
        finally:
            del os.environ["PALLAS_AXON_POOL_IPS"]
