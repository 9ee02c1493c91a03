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


def test_scalar_tail_device_matches_interpret():
    """The Mosaic-lowered scalar-tail kernel must match its interpret-mode
    run on identical inputs (the interpret path is itself gated against the
    XLA pipeline in test_pipeline_e2e.TestScalarTailKernel)."""
    from fl_slam_tpu.config import GCConfig, D_Z
    from fl_slam_tpu.ops import belief_kernels as bk
    from fl_slam_tpu.ops import noise as noise_ops

    cfg = GCConfig.tpu()
    dt = jnp.float32
    rng = np.random.default_rng(0)

    def spd(n, s=1.0):
        A = rng.normal(size=(n, n)).astype(np.float32)
        return jnp.asarray((A @ A.T * s + np.eye(n)).astype(np.float32))

    pn = noise_ops.init_process_noise(cfg.replace(dtype="float32"))
    mn = noise_ops.init_measurement_noise(cfg.replace(dtype="float32"))
    d3 = spd(3, .01)
    args = (spd(22, 10.), jnp.asarray(rng.normal(size=22).astype(np.float32)),
            jnp.asarray(np.array([1., 2., .3, 1., 0, 0, 0], np.float32)),
            jnp.asarray(rng.normal(size=22).astype(np.float32) * 0.01),
            spd(22, 2.), jnp.asarray(rng.normal(size=22).astype(np.float32)),
            jnp.asarray(rng.normal(size=22).astype(np.float32) * 0.01),
            spd(22), jnp.asarray(rng.normal(size=22).astype(np.float32)),
            jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.01),
            pn.nu.astype(dt), pn.psi.astype(dt), mn.nu.astype(dt),
            mn.psi.astype(dt), d3, d3, d3)
    kw = dict(ess_pre=jnp.float32(100.), ot_ess=jnp.float32(50.),
              ot_cost=jnp.float32(10.), grav_proj=jnp.float32(.001),
              cond_p6=jnp.float32(5.))
    dev = jax.jit(lambda *a: bk.scalar_tail(cfg, *a, **kw))(*args)
    itp = bk.scalar_tail(cfg, *args, **kw, interpret=True)
    for i, (a, b) in enumerate(zip(dev, itp)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), i
        d = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        assert d < 5e-4, (i, d)


def test_predict_evidence_device_matches_interpret():
    """Kernel B (predict + evidence) Mosaic lowering vs interpret mode on
    identical inputs (the interpret path is gated against the XLA pipeline
    by test_pipeline_e2e.TestScalarTailKernel, which toggles both kernels)."""
    from fl_slam_tpu.config import GCConfig
    from fl_slam_tpu.ops import belief_kernels as bk

    cfg = GCConfig.tpu()
    dt = jnp.float32
    rng = np.random.default_rng(0)

    def spd(n, s=1.0):
        A = rng.normal(size=(n, n)).astype(np.float32)
        return jnp.asarray((A @ A.T * s + np.eye(n)).astype(np.float32))

    v3 = lambda s=1.0: jnp.asarray(rng.normal(size=3).astype(np.float32) * s)
    kw = dict(dt_sec=jnp.float32(0.1), pre_ess=jnp.float32(100.),
              dt_int=jnp.float32(0.1), dt_imu=jnp.float32(0.005),
              grav_rbar=jnp.float32(0.95), transport_sigma=jnp.float32(0.05),
              pose_prev=jnp.asarray(
                  rng.normal(size=6).astype(np.float32) * 0.1),
              motion_rot=v3(0.01), motion_p=v3(0.01), motion_v=v3(0.01),
              omega_avg=v3(0.1),
              a_body_mean=v3(0.1) + jnp.asarray([0, 0, 9.8], dt),
              odom_vel=v3(0.5), odom_omega=v3(0.1),
              odom_pose=jnp.asarray(
                  rng.normal(size=6).astype(np.float32) * 0.1),
              grav_xbar=jnp.asarray([0.05, 0.02, 0.99], dt) / 0.9925,
              acc_m1=v3(0.1) + jnp.asarray([0, 0, 9.8], dt),
              acc_sw=jnp.float32(0.999))
    from fl_slam_tpu.core import se3
    L_prev = spd(22, 10.)
    sigma_prev = jnp.linalg.inv(L_prev + 1e-9 * jnp.eye(22, dtype=dt))
    sigma_prev = 0.5 * (sigma_prev + sigma_prev.T)
    R_prev = se3.so3_exp(kw["pose_prev"][3:6]).astype(dt)
    args = (L_prev, jnp.asarray(rng.normal(size=22).astype(np.float32)),
            jnp.asarray(np.array([1., 2., .3, 1., 0, 0, 0], np.float32)),
            jnp.asarray(rng.normal(size=22).astype(np.float32) * 0.01),
            sigma_prev, R_prev,
            spd(22, .01), spd(3, .001), spd(3, .01), spd(6, .01), spd(3, .1))
    dev = jax.jit(lambda *a: bk.predict_evidence(cfg, *a, **kw))(*args)
    itp = bk.predict_evidence(cfg, *args, **kw, interpret=True)
    for i, (a, b) in enumerate(zip(dev, itp)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), i
        d = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        assert d < 1e-3, (i, d)


def test_select_kernel_device_matches_interpret():
    """Mosaic lowering of the fused candidate-selection kernel vs interpret
    mode on identical production-shaped inputs (the interpret path is gated
    against exact top-k in test_ops)."""
    from fl_slam_tpu.ops import assoc_kernels

    N, V, k = 256, 7168, 8
    rng = np.random.default_rng(3)
    mp = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32) * 5
    md = rng.normal(size=(N, 3))
    md = jnp.asarray(md / np.linalg.norm(md, axis=1, keepdims=True),
                     jnp.float32)
    mk = jnp.asarray(np.abs(rng.normal(size=N)), jnp.float32)
    packed = np.zeros((V, 17), np.float32)
    packed[:, 0:3] = rng.normal(size=(V, 3)) * 5
    d = rng.normal(size=(V, 3))
    packed[:, 3:6] = d / np.linalg.norm(d, axis=1, keepdims=True)
    packed[:, 6] = np.abs(rng.normal(size=V))
    packed[:, 14] = (rng.random(V) > 0.1).astype(np.float32)
    packed[:, 15] = rng.integers(0, 50, V)
    packed = jnp.asarray(packed)
    seq = jnp.asarray(60, jnp.int32)

    kw = dict(k=k, cost_beta=4.0, recency_scale=0.002)
    dv, di = jax.jit(lambda *a: assoc_kernels.select_candidates(*a, **kw))(
        mp, md, mk, packed, seq)
    iv, ii = assoc_kernels.select_candidates(mp, md, mk, packed, seq,
                                             interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(iv), rtol=1e-5,
                               atol=1e-4)
    # index mismatches only permissible among exact score ties
    same = np.asarray(di) == np.asarray(ii)
    ties = np.abs(np.asarray(dv) - np.asarray(iv)) < 1e-5
    assert (same | ties).all()


def test_moment_kernel_device_matches_segment_sum():
    """surfel_kernels.moment_segment_sum Mosaic lowering vs segment_sum at
    the production shape (F=11, N=8192, C=8192), bf16x2 accuracy."""
    from fl_slam_tpu.ops import surfel_kernels as sk

    rng = np.random.default_rng(1)
    F, N, C = 11, 8192, 8192
    payload = jnp.asarray(rng.normal(size=(F, N)).astype(np.float32)) * 0.2
    cell = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    got = jax.jit(lambda p, c: sk.moment_segment_sum(p, c, C))(payload, cell)
    want = jax.ops.segment_sum(np.asarray(payload).T, cell,
                               num_segments=C).T
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() < 5e-5 * scale, err.max() / scale


# ---------------------------------------------------------------------------
# Instance-batched (vmapped) kernel paths — the round-3 fix that lets the
# batched replay keep the kernels ON (parallel/replicas.py). Each test vmaps
# the kernel wrapper over a small instance axis on device and asserts
# equality with the per-instance loop.
# ---------------------------------------------------------------------------


class TestBatchedKernels:
    B = 3

    def test_vmapped_sinkhorn_matches_loop(self):
        from fl_slam_tpu.ops.assoc_kernels import sinkhorn_piT
        rng = np.random.default_rng(5)
        K, N = 8, 512
        kw = dict(n_iter=10, ua=0.8, vb=0.8, log_b=-2.0)
        logKT = jnp.asarray(rng.normal(size=(self.B, K, N)), jnp.float32)
        log_a = jnp.asarray(rng.normal(size=(self.B, N)), jnp.float32)
        out = jax.jit(jax.vmap(lambda k, a: sinkhorn_piT(k, a, **kw)))(
            logKT, log_a)
        ref = jnp.stack([sinkhorn_piT(logKT[i], log_a[i], **kw)
                         for i in range(self.B)])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_vmapped_select_matches_loop(self):
        from fl_slam_tpu.ops.assoc_kernels import select_candidates
        rng = np.random.default_rng(6)
        N, V = 256, 512
        mp = jnp.asarray(rng.normal(size=(self.B, N, 3)), jnp.float32)
        md = jnp.asarray(rng.normal(size=(self.B, N, 3)), jnp.float32)
        mk = jnp.abs(jnp.asarray(rng.normal(size=(self.B, N)), jnp.float32))
        vp = jnp.asarray(rng.normal(size=(self.B, V, 17)), jnp.float32)
        vp = vp.at[..., 14].set(1.0)
        ss = jnp.zeros((self.B,), jnp.float32)
        f = lambda a, b, c, d, s: select_candidates(
            a, b, c, d, s, k=8, cost_beta=0.5, recency_scale=0.001)
        vals, idx = jax.jit(jax.vmap(f))(mp, md, mk, vp, ss)
        for i in range(self.B):
            rv, ri = f(mp[i], md[i], mk[i], vp[i], ss[i])
            np.testing.assert_array_equal(np.asarray(vals[i]),
                                          np.asarray(rv))
            np.testing.assert_array_equal(np.asarray(idx[i]), np.asarray(ri))

    def test_vmapped_moment_matches_loop(self):
        from fl_slam_tpu.ops.surfel_kernels import moment_segment_sum
        rng = np.random.default_rng(7)
        F, N, C = 14, 512, 256
        pay = jnp.asarray(rng.normal(size=(self.B, F, N)), jnp.float32)
        cell = jnp.asarray(rng.integers(0, C, size=(self.B, N)), jnp.int32)
        out = jax.jit(jax.vmap(lambda p, c: moment_segment_sum(p, c, C)))(
            pay, cell)
        ref = jnp.stack([moment_segment_sum(pay[i], cell[i], C)
                         for i in range(self.B)])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.parametrize("refresh", [(1, 0, 1), (0, 0, 0)])
    def test_vmapped_exchange_matches_loop(self, refresh):
        from fl_slam_tpu.structures.atlas_kernels import (
            conditional_slab_exchange)
        rng = np.random.default_rng(8)
        P, S, CF, M = 8, 3, 32, 1024
        ops = [_mk(rng, P, S, CF, M) for _ in range(self.B)]
        batched = [jnp.stack([o[j] for o in ops]) for j in range(6)]
        r = jnp.asarray(refresh, jnp.int32)
        f = lambda pf, pp, sf, sp, o, n, rr: conditional_slab_exchange(
            pf, pp, sf, sp, o, n, rr, use_kernel=True)
        out = jax.jit(jax.vmap(f))(*batched, r)
        for i in range(self.B):
            ref = conditional_slab_exchange(*ops[i], r[i], use_kernel=False)
            for k, x in zip(out, ref):
                np.testing.assert_array_equal(np.asarray(k[i]),
                                              np.asarray(x))

    def test_vmapped_scalar_tail_matches_loop(self):
        """The custom_vmap instance rule (ONE kernel, instances vmapped
        inside the body) must reproduce the per-instance kernel bit for bit
        (round-3 verdict item 1: the native batching rule grid-serialized
        B instances at 8x one instance's cost)."""
        from fl_slam_tpu.config import GCConfig
        from fl_slam_tpu.ops import belief_kernels as bk
        from fl_slam_tpu.ops import noise as noise_ops

        cfg = GCConfig.tpu()
        dt = jnp.float32
        rng = np.random.default_rng(11)

        def spd(n, s=1.0):
            A = rng.normal(size=(self.B, n, n)).astype(np.float32)
            return jnp.asarray(np.einsum("bij,bkj->bik", A, A) * s
                               + np.eye(n, dtype=np.float32))

        pn = noise_ops.init_process_noise(cfg.replace(dtype="float32"))
        mn = noise_ops.init_measurement_noise(cfg.replace(dtype="float32"))
        d3 = spd(3, .01)
        BN = lambda *sh, s=1.0: jnp.asarray(
            rng.normal(size=(self.B,) + sh).astype(np.float32) * s)
        anchor = jnp.broadcast_to(
            jnp.asarray([1., 2., .3, 1., 0, 0, 0], dt), (self.B, 7))
        args = (spd(22, 10.), BN(22), anchor, BN(22, s=0.01), spd(22, 2.),
                BN(22), BN(22, s=0.01), spd(22), BN(22), BN(6, s=0.01),
                jnp.broadcast_to(pn.nu.astype(dt), (self.B, 7)),
                jnp.broadcast_to(pn.psi.astype(dt), (self.B, 7, 6, 6)),
                jnp.broadcast_to(mn.nu.astype(dt), (self.B, 3)),
                jnp.broadcast_to(mn.psi.astype(dt), (self.B, 3, 3, 3)),
                d3, d3, d3,
                jnp.full((self.B,), 100., dt), jnp.full((self.B,), 50., dt),
                jnp.full((self.B,), 10., dt), jnp.full((self.B,), .001, dt),
                jnp.full((self.B,), 5., dt))
        f = lambda *a: bk.scalar_tail(cfg, *a)
        out = jax.jit(jax.vmap(f))(*args)
        for i in range(self.B):
            ref = jax.jit(f)(*(a[i] for a in args))
            for j, (o, r) in enumerate(zip(out, ref)):
                np.testing.assert_array_equal(np.asarray(o[i]),
                                              np.asarray(r), err_msg=str(j))

    def test_vmapped_predict_evidence_matches_loop(self):
        from fl_slam_tpu.config import GCConfig
        from fl_slam_tpu.core import se3
        from fl_slam_tpu.ops import belief_kernels as bk

        cfg = GCConfig.tpu()
        dt = jnp.float32
        rng = np.random.default_rng(12)

        def spd(n, s=1.0):
            A = rng.normal(size=(self.B, n, n)).astype(np.float32)
            return jnp.asarray(np.einsum("bij,bkj->bik", A, A) * s
                               + np.eye(n, dtype=np.float32))

        BN = lambda *sh, s=1.0: jnp.asarray(
            rng.normal(size=(self.B,) + sh).astype(np.float32) * s)
        pose_prev = BN(6, s=0.1)
        kw = dict(dt_sec=jnp.full((self.B,), 0.1, dt),
                  pre_ess=jnp.full((self.B,), 100., dt),
                  dt_int=jnp.full((self.B,), 0.1, dt),
                  dt_imu=jnp.full((self.B,), 0.005, dt),
                  grav_rbar=jnp.full((self.B,), 0.95, dt),
                  transport_sigma=jnp.full((self.B,), 0.05, dt),
                  pose_prev=pose_prev, motion_rot=BN(3, s=0.01),
                  motion_p=BN(3, s=0.01), motion_v=BN(3, s=0.01),
                  omega_avg=BN(3, s=0.1),
                  a_body_mean=BN(3, s=0.1) + jnp.asarray([0, 0, 9.8], dt),
                  odom_vel=BN(3, s=0.5), odom_omega=BN(3, s=0.1),
                  odom_pose=BN(6, s=0.1),
                  grav_xbar=jnp.broadcast_to(
                      jnp.asarray([0.05, 0.02, 0.99], dt) / 0.9925,
                      (self.B, 3)),
                  acc_m1=BN(3, s=0.1) + jnp.asarray([0, 0, 9.8], dt),
                  acc_sw=jnp.full((self.B,), 0.999, dt))
        L_prev = spd(22, 10.)
        sig = jnp.linalg.inv(L_prev + 1e-9 * jnp.eye(22, dtype=dt)[None])
        sig = 0.5 * (sig + jnp.swapaxes(sig, 1, 2))
        R_prev = jax.vmap(lambda p: se3.so3_exp(p[3:6]))(pose_prev).astype(dt)
        anchor = jnp.broadcast_to(
            jnp.asarray([1., 2., .3, 1., 0, 0, 0], dt), (self.B, 7))
        args = (L_prev, BN(22), anchor, BN(22, s=0.01), sig, R_prev,
                spd(22, .01), spd(3, .001), spd(3, .01), spd(6, .01),
                spd(3, .1))
        names = sorted(kw)
        f = lambda a_list, k_list: bk.predict_evidence(
            cfg, *a_list, **{n: k_list[i] for i, n in enumerate(names)})
        kl = [kw[n] for n in names]
        out = jax.jit(jax.vmap(f))(args, kl)
        for i in range(self.B):
            ref = jax.jit(f)([a[i] for a in args], [k[i] for k in kl])
            for j, (o, r) in enumerate(zip(out, ref)):
                np.testing.assert_array_equal(np.asarray(o[i]),
                                              np.asarray(r), err_msg=str(j))

    def test_vmapped_page_io_matches_loop(self):
        from fl_slam_tpu.structures.atlas_kernels import (
            page_gather_ff, page_writeback_ff)
        rng = np.random.default_rng(9)
        CF, S, M, P = 32, 3, 1024, 128
        ff = jnp.asarray(rng.normal(size=(self.B, CF, S * M)), jnp.float32)
        pg = rng.integers(0, M // P, size=(self.B, S))
        offs = jnp.asarray(np.arange(S)[None, :] * M + pg * P, jnp.int32)
        upd = jnp.asarray(rng.normal(size=(self.B, CF, S * P)), jnp.float32)
        g = jax.jit(jax.vmap(lambda f, o: page_gather_ff(f, o, P)))
        w = jax.jit(jax.vmap(
            lambda f, o, u: page_writeback_ff(f, o, u, P)))
        got_g = g(ff, offs)
        got_w = w(ff, offs, upd)
        for i in range(self.B):
            np.testing.assert_array_equal(
                np.asarray(got_g[i]),
                np.asarray(page_gather_ff(ff[i], offs[i], P)))
            np.testing.assert_array_equal(
                np.asarray(got_w[i]),
                np.asarray(page_writeback_ff(ff[i], offs[i], upd[i], P)))
