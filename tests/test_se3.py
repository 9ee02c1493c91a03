"""SO(3)/SE(3) invariants (parity with reference audit tests:
exp-log roundtrips including near pi, compose/inverse, adjoint transport)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fl_slam_tpu.core import se3


def random_rotvecs(rng, n, scale=np.pi * 0.9):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    mags = rng.uniform(1e-9, scale, size=(n, 1))
    return v * mags


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(random_rotvecs(rng, 256))
    w2 = se3.so3_log(se3.so3_exp(w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-9)


def test_so3_log_near_pi(rng):
    axes = rng.normal(size=(64, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    for theta in [np.pi - 1e-3, np.pi - 1e-6, np.pi]:
        w = jnp.asarray(axes * theta)
        R = se3.so3_exp(w)
        w_back = se3.so3_log(R)
        R_back = se3.so3_exp(w_back)
        # Rotations must match even if the axis sign flips at exactly pi.
        np.testing.assert_allclose(np.asarray(R_back), np.asarray(R), atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(w_back), axis=-1), theta, atol=1e-6
        )


def test_so3_log_identity():
    R = jnp.eye(3, dtype=jnp.float64)
    w = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-12)


def test_so3_exp_orthonormal(rng):
    w = jnp.asarray(random_rotvecs(rng, 128))
    R = se3.so3_exp(w)
    eye = jnp.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-12)


def test_V_Vinv_inverse(rng):
    w = jnp.asarray(random_rotvecs(rng, 128))
    V = se3.so3_V(w)
    Vi = se3.so3_V_inv(w)
    np.testing.assert_allclose(np.asarray(V @ Vi),
                               np.broadcast_to(np.eye(3), V.shape), atol=1e-9)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(np.concatenate(
        [rng.normal(size=(128, 3)) * 2.0, random_rotvecs(rng, 128)], axis=-1))
    xi2 = se3.se3_log(se3.se3_exp(xi))
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-9)


def test_se3_compose_inverse(rng):
    a = se3.se3_exp(jnp.asarray(np.concatenate(
        [rng.normal(size=(64, 3)), random_rotvecs(rng, 64)], axis=-1)))
    ident = se3.se3_compose(a, se3.se3_inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-9)


def test_se3_plus_minus(rng):
    a = se3.se3_exp(jnp.asarray(np.concatenate(
        [rng.normal(size=(64, 3)), random_rotvecs(rng, 64)], axis=-1)))
    xi = jnp.asarray(np.concatenate(
        [rng.normal(size=(64, 3)) * 0.1, random_rotvecs(rng, 64) * 0.1], axis=-1))
    b = se3.se3_plus(a, xi)
    xi2 = se3.se3_minus(b, a)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-9)


def test_se3_apply_matches_rt(rng):
    pose = se3.se3_exp(jnp.asarray(np.concatenate(
        [rng.normal(size=(8, 3)), random_rotvecs(rng, 8)], axis=-1)))
    p = jnp.asarray(rng.normal(size=(8, 3)))
    R, t = se3.pose_rt(pose)
    expected = jnp.einsum("...ij,...j->...i", R, p) + t
    np.testing.assert_allclose(np.asarray(se3.se3_apply(pose, p)),
                               np.asarray(expected), atol=1e-12)


def test_adjoint_transport_consistency(rng):
    """Adjoint must satisfy Exp(Ad_X xi) = X Exp(xi) X^{-1}."""
    X = se3.se3_exp(jnp.asarray(np.concatenate(
        [rng.normal(size=(16, 3)), random_rotvecs(rng, 16)], axis=-1)))
    xi = jnp.asarray(np.concatenate(
        [rng.normal(size=(16, 3)) * 0.1, random_rotvecs(rng, 16) * 0.1], axis=-1))
    Ad = se3.se3_adjoint(X)
    lhs = se3.se3_exp(jnp.einsum("...ij,...j->...i", Ad, xi))
    rhs = se3.se3_compose(se3.se3_compose(X, se3.se3_exp(xi)), se3.se3_inverse(X))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-8)


@pytest.mark.parametrize("theta", [0.0, 1e-12, 1e-8, 1e-4, 0.1, 1.0, 3.0])
def test_smoothness_across_scales(theta, rng):
    axis = np.array([0.3, -0.5, 0.81])
    axis /= np.linalg.norm(axis)
    w = jnp.asarray(axis * theta)
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-9)


# ---------------------------------------------------------------------------
# Quaternion 7-vector pose (the anchor state representation).
# ---------------------------------------------------------------------------

class TestPose7:
    def test_quat_rotvec_roundtrip_all_angles(self):
        rng = np.random.default_rng(11)
        for theta in (1e-9, 1e-4, 0.5, 1.5, 3.0, np.pi - 1e-4):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            w = jnp.asarray(axis * theta)
            q = se3.quat_from_rotvec(w)
            np.testing.assert_allclose(float(jnp.linalg.norm(q)), 1.0,
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(se3.quat_to_rotvec(q)),
                                       np.asarray(w), atol=1e-9)
            np.testing.assert_allclose(np.asarray(se3.quat_to_R(q)),
                                       np.asarray(se3.so3_exp(w)), atol=1e-9)

    def test_pose7_compose_matches_se3_compose(self):
        rng = np.random.default_rng(12)
        for _ in range(5):
            a = jnp.asarray(rng.normal(size=6))
            b = jnp.asarray(rng.normal(size=6) * 0.3)
            ref = se3.se3_compose(a, b)
            got = se3.pose6_from_pose7(se3.pose7_compose(
                se3.pose7_from_pose6(a), se3.pose7_from_pose6(b)))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-9)

    def test_pose7_plus_minus_roundtrip(self):
        rng = np.random.default_rng(13)
        a = se3.pose7_from_pose6(jnp.asarray(rng.normal(size=6)))
        xi = jnp.asarray(rng.normal(size=6) * 0.2)
        b = se3.pose7_plus(a, xi)
        np.testing.assert_allclose(np.asarray(se3.pose7_minus(b, a)),
                                   np.asarray(xi), atol=1e-9)

    def test_quat_rotate_matches_matrix(self):
        rng = np.random.default_rng(14)
        q = se3.quat_from_rotvec(jnp.asarray(rng.normal(size=3)))
        v = jnp.asarray(rng.normal(size=3))
        np.testing.assert_allclose(np.asarray(se3.quat_rotate(q, v)),
                                   np.asarray(se3.quat_to_R(q) @ v),
                                   atol=1e-12)

    def test_f32_compounding_beats_rotvec_chart(self):
        """The design claim behind the quaternion anchor: 10k composed f32
        small yaw steps accumulate orders less rotation error via the
        quaternion product than via per-step rotvec exp/compose/log."""
        step = jnp.asarray([0.0, 0, 0, 0, 0, 1e-3], jnp.float32)
        n = 10000
        q = se3.pose7_from_pose6(jnp.zeros(6, jnp.float32))
        import jax
        q = jax.lax.fori_loop(
            0, n, lambda i, p: se3.pose7_plus(p, step), q)
        yaw_q = float(np.linalg.norm(se3.quat_to_rotvec(q[3:7])))
        # principal angle of the accumulated 10 rad yaw
        expect = n * 1e-3
        while expect > np.pi:
            expect = abs(expect - 2 * np.pi)
        assert abs(yaw_q - expect) < 5e-4, (yaw_q, expect)
