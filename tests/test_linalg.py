"""Numeric primitive invariants (parity: reference test_primitives.py +
test_audit_invariants.py no-gate checks)."""

import numpy as np
import jax.numpy as jnp

from fl_slam_tpu.core import linalg


def test_project_psd_floors_negative_eigenvalue():
    A = jnp.diag(jnp.asarray([1.0, 2.0, -1e6]))
    out, mag = linalg.project_psd(A, eps=1e-12)
    lam = np.linalg.eigvalsh(np.asarray(out))
    assert lam.min() >= 1e-13
    assert float(mag) > 9e5


def test_project_psd_identity_on_spd(rng):
    B = rng.normal(size=(6, 6))
    A = jnp.asarray(B @ B.T + 6 * np.eye(6))
    out, mag = linalg.project_psd(A)
    np.testing.assert_allclose(np.asarray(out), np.asarray(A), rtol=1e-10)
    assert float(mag) == 0.0


def test_spd_solve_lifted_singular():
    A = jnp.zeros((4, 4), dtype=jnp.float64)
    b = jnp.ones((4,), dtype=jnp.float64)
    x, _ = linalg.spd_solve_lifted(A, b, eps=1e-9)
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x), 1e9, rtol=1e-6)


def test_spd_solve_matches_np(rng):
    B = rng.normal(size=(5, 5))
    A = jnp.asarray(B @ B.T + 5 * np.eye(5))
    b = jnp.asarray(rng.normal(size=5))
    x, _ = linalg.spd_solve_lifted(A, b, eps=0.0)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(np.asarray(A), b),
                               rtol=1e-9)


def test_spd_inverse_lifted(rng):
    B = rng.normal(size=(5, 5))
    A = jnp.asarray(B @ B.T + 5 * np.eye(5))
    inv, _ = linalg.spd_inverse_lifted(A, eps=0.0)
    np.testing.assert_allclose(np.asarray(inv @ A), np.eye(5), atol=1e-9)


def test_masked_softmax_fully_masked():
    logits = jnp.asarray([1.0, 2.0, 3.0])
    mask = jnp.asarray([False, False, False])
    w = linalg.masked_softmax(logits, mask)
    np.testing.assert_allclose(np.asarray(w), 0.0)


def test_masked_softmax_partial():
    logits = jnp.asarray([1.0, 2.0, -1e5])
    mask = jnp.asarray([True, True, False])
    w = np.asarray(linalg.masked_softmax(logits, mask))
    assert w[2] == 0.0
    np.testing.assert_allclose(w[:2].sum(), 1.0, rtol=1e-12)


def test_safe_normalize_zero():
    unit, norm = linalg.safe_normalize(jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(unit), 0.0)
    assert float(norm) == 0.0


def test_eigvalsh3x3_matches_lapack(rng):
    B = rng.normal(size=(512, 3, 3))
    A = jnp.asarray(B + np.swapaxes(B, -1, -2))
    lam = np.asarray(linalg.eigvalsh3x3(A))
    lam_ref = np.linalg.eigvalsh(np.asarray(A))
    np.testing.assert_allclose(lam, lam_ref, atol=1e-8)


def test_eigvec3x3_smallest(rng):
    B = rng.normal(size=(128, 3, 3))
    A = jnp.asarray(B @ np.swapaxes(B, -1, -2))
    lam0, v, _ = linalg.eigh3x3_smallest(A)
    Av = np.einsum("nij,nj->ni", np.asarray(A), np.asarray(v))
    lv = np.asarray(lam0)[:, None] * np.asarray(v)
    np.testing.assert_allclose(Av, lv, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0,
                               atol=1e-10)


def test_eig3x3_degenerate_isotropic():
    A = jnp.broadcast_to(jnp.eye(3) * 2.5, (4, 3, 3))
    lam = np.asarray(linalg.eigvalsh3x3(A))
    np.testing.assert_allclose(lam, 2.5, atol=1e-12)
    _, v, _ = linalg.eigh3x3_smallest(A)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0,
                               atol=1e-10)


def test_sanitize():
    x = jnp.asarray([np.nan, np.inf, -np.inf, 1.5])
    y = np.asarray(linalg.sanitize(x, sentinel=1e6))
    np.testing.assert_allclose(y, [0.0, 1e6, -1e6, 1.5])


class TestKabsch3x3:
    def test_recovers_rotation(self, rng):
        from fl_slam_tpu.core.linalg import kabsch3x3
        from fl_slam_tpu.core import se3
        import jax.numpy as jnp
        rv = jnp.asarray([0.3, -0.2, 0.5])
        R_true = se3.so3_exp(rv)
        # scatter S = R_true @ SPD (polar form)
        W = rng.standard_normal((3, 3))
        A_true = W @ W.T + 3.0 * np.eye(3)
        S = np.asarray(R_true) @ A_true
        R, A = kabsch3x3(jnp.asarray(S))
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-6)
        np.testing.assert_allclose(np.asarray(A), A_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(R) @ np.asarray(R).T, np.eye(3),
                                   atol=1e-8)
        assert np.linalg.det(np.asarray(R)) > 0.99

    def test_rank_deficient_total(self, rng):
        from fl_slam_tpu.core.linalg import kabsch3x3
        import jax.numpy as jnp
        # rank-1 scatter (all directions identical)
        d = np.array([0.0, 0.0, 1.0])
        S = np.outer(d, d) * 5.0
        R, A = kabsch3x3(jnp.asarray(S))
        R = np.asarray(R)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) > 0.99
        assert np.isfinite(np.asarray(A)).all()

    def test_reflection_input_gives_proper_rotation(self):
        from fl_slam_tpu.core.linalg import kabsch3x3
        import jax.numpy as jnp
        S = np.diag([2.0, 1.5, -1.0])  # det < 0
        R, A = kabsch3x3(jnp.asarray(S))
        R = np.asarray(R)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) > 0.99


class TestUnrolledSmallCholesky:
    """spd_solve_lifted / spd_inverse_lifted dispatch static n <= 8 to the
    fused unrolled Cholesky (no LAPACK custom call on the TPU hot path);
    the unrolled form must agree with the LAPACK path it replaces."""

    def test_solve_matches_lapack_small_sizes(self):
        import jax.numpy as jnp
        from jax.scipy.linalg import cho_factor, cho_solve
        from fl_slam_tpu.core.linalg import spd_solve_lifted
        rng = np.random.default_rng(7)
        for n in (2, 3, 6, 7, 8):
            G = rng.normal(size=(10, n, n))
            A = G @ np.swapaxes(G, -1, -2) + 0.1 * np.eye(n)
            b = rng.normal(size=(10, n))
            x, _ = spd_solve_lifted(jnp.asarray(A), jnp.asarray(b), 1e-9)
            c, low = cho_factor(jnp.asarray(A) + 1e-9 * jnp.eye(n))
            x_ref = cho_solve((c, low), jnp.asarray(b))
            np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                       rtol=5e-4, atol=5e-5)

    def test_inverse_matches_lapack(self):
        import jax.numpy as jnp
        from fl_slam_tpu.core.linalg import spd_inverse_lifted
        rng = np.random.default_rng(8)
        for n in (3, 6):
            G = rng.normal(size=(n, n))
            A = G @ G.T + 0.1 * np.eye(n)
            inv, _ = spd_inverse_lifted(jnp.asarray(A), 1e-9)
            np.testing.assert_allclose(np.asarray(inv) @ A, np.eye(n),
                                       atol=5e-4)
            np.testing.assert_allclose(np.asarray(inv),
                                       np.asarray(inv).T, atol=1e-7)

    def test_singular_psd_is_total(self):
        import jax.numpy as jnp
        from fl_slam_tpu.core.linalg import spd_solve_lifted
        A = np.zeros((6, 6)); A[0, 0] = 1.0
        x, _ = spd_solve_lifted(jnp.asarray(A), jnp.ones(6), 1e-6)
        assert np.isfinite(np.asarray(x)).all()

    def test_large_n_still_lapack_vector_and_matrix_rhs(self):
        import jax.numpy as jnp
        from fl_slam_tpu.core.linalg import spd_solve_lifted
        rng = np.random.default_rng(9)
        G = rng.normal(size=(22, 22))
        A = G @ G.T + 0.1 * np.eye(22)
        x, _ = spd_solve_lifted(jnp.asarray(A), jnp.ones(22), 1e-9)
        np.testing.assert_allclose(np.asarray(A @ np.asarray(x)),
                                   np.ones(22), rtol=1e-3, atol=1e-3)
