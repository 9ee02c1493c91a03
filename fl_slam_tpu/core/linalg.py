"""Total-function numeric primitives with certificate magnitudes.

Parity targets (reference ``common/primitives.py``): Symmetrize,
DomainProjectionPSD (eigenvalue floor), SPDCholeskySolveLifted,
SPDCholeskyInverseLifted, InvMass, Clamp, safe_normalize, softmax.

Every function is total (finite output for any finite input), branch-free, and
returns the numeric result plus scalar "certificate magnitudes" describing how
much stabilization was applied — the audit contract of the reference, kept as
device scalars (never host-synced inside the scan loop).

TPU-specific additions (not in the reference):
  - ``eigh3x3_smallest``: closed-form smallest eigenpair of symmetric 3x3
    batches (the reference vmaps ``jnp.linalg.eigh`` over up to 8192 cells,
    ``operators/lidar_surfel_extraction.py``; a trigonometric closed form keeps
    this on the VPU with no Schur iteration).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


def symmetrize(A):
    """0.5 (A + A^T); returns (result, asymmetry magnitude)."""
    S = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    mag = jnp.linalg.norm(A - jnp.swapaxes(A, -1, -2), axis=(-2, -1)) * 0.5
    return S, mag


def mm(a, b):
    """Batched SMALL matmul (..., m, k) @ (..., k, n) as a VPU broadcast-sum.

    A tiny batched ``dot_general`` — e.g. the (K_HYP, 3, 3) products all over
    the per-hypothesis evidence algebra — hits the MXU path, which XLA
    horizontally fuses into (8, K, 3, 3) batches and then lowers to a
    SERIALIZED while loop of single 3x3 MXU ops (profiled: ~24 such whiles at
    5-13 us each per scan). The broadcast-multiply-reduce form stays a single
    VPU fusion. Use for op-count-bound small algebra ONLY — big matmuls
    belong on the MXU."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def mv(A, v):
    """Batched small matvec (..., m, n) @ (..., n) via VPU broadcast-sum."""
    return jnp.sum(A * v[..., None, :], axis=-1)


def quad_form(v, A):
    """v^T A v batched, via VPU broadcast-sum."""
    return jnp.sum(v[..., :, None] * A * v[..., None, :], axis=(-2, -1))


def project_psd(A, eps: float = 1e-12):
    """Eigenvalue-floor PSD projection; returns (result, projection magnitude).

    magnitude = total eigenvalue mass clipped (sum of max(eps - lam, 0)).
    """
    S = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    lam, Q = jnp.linalg.eigh(S)
    lam_floored = jnp.maximum(lam, eps)
    mag = jnp.sum(jnp.maximum(eps - lam, 0.0), axis=-1)
    out = jnp.einsum("...ij,...j,...kj->...ik", Q, lam_floored, Q)
    out = 0.5 * (out + jnp.swapaxes(out, -1, -2))
    return out, mag


def psd_guard(A, eps: float = 1e-12):
    """Cheap PSD guard for matrices PSD BY CONSTRUCTION (sums/convex combos
    of PSD terms, congruences): symmetrize + eps lift. Returns (A', 0.0).

    Replaces eigh-based ``project_psd`` on the TPU hot path: a 22x22 eigh
    costs ~3 ms AND ~170 s of XLA compile time per call site. Use
    ``project_psd`` (eigh) only where the input can be genuinely indefinite
    (sensor covariances, Laplace Hessians).
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    return A + eps * eye, jnp.zeros(A.shape[:-2], A.dtype)


def project_psd3(A, eps: float = 1e-12):
    """Exact-ish PSD floor for symmetric 3x3 via the analytic eigensolver:
    diagonal lift by max(0, -lambda_min) + eps. Conservative (lifts all
    eigenvalues equally) but closed-form — no LAPACK on TPU. Returns
    (A', lift_magnitude)."""
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    lam_min = eigvalsh3x3(A)[..., 0]
    lift = jnp.maximum(0.0, -lam_min) + eps
    return A + lift[..., None, None] * jnp.eye(3, dtype=A.dtype), lift


# Static size at or below which SPD solves use the UNROLLED elementwise
# Cholesky instead of the LAPACK custom call. The pipeline executes ~150
# cholesky/triangular_solve custom calls per scan, most of them on 3x3/6x6
# evidence blocks; each call costs ~1.5-7 us of dispatch + layout copies and
# cannot fuse with its neighbors. The unrolled form is the SAME algorithm as
# scalar ops that XLA fuses into one VPU kernel (~136 -> ~40 us/scan traced).
_UNROLL_CHOL_MAX_N = 8


def _chol_unrolled(A_l):
    """Lower-triangular Cholesky factor of a small (static n) SPD batch as a
    list-of-lists of (...,)-shaped scalar arrays. Caller guarantees A_l is
    symmetric and lifted; the sqrt argument is floored to stay total."""
    n = A_l.shape[-1]
    a = [[A_l[..., i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = a[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(d, 1e-30))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L


def _chol_solve_unrolled(L, b_cols):
    """Solve L L^T x = b for each column in b_cols (list of length-n lists of
    (...,) scalars); returns the same structure."""
    n = len(L)
    out = []
    for b in b_cols:
        y = [None] * n
        for i in range(n):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        out.append(x)
    return out


def spd_solve_lifted(A, b, eps: float = 1e-9):
    """Solve (A + eps I) x = b by Cholesky; total on PSD A.

    Returns (x, lift magnitude = eps * ||b|| proxy). The lift makes the solve
    defined for singular PSD A (parity: primitives.py:141). Static sizes
    <= _UNROLL_CHOL_MAX_N use the fused unrolled form (identical algorithm).
    """
    n = A.shape[-1]
    A_l = 0.5 * (A + jnp.swapaxes(A, -1, -2)) + eps * jnp.eye(n, dtype=A.dtype)
    mag = jnp.asarray(eps, dtype=A.dtype) * jnp.ones(A.shape[:-2], dtype=A.dtype)
    if n <= _UNROLL_CHOL_MAX_N and b.shape[-1] == n and b.ndim == A.ndim - 1:
        L = _chol_unrolled(A_l)
        (x_list,) = _chol_solve_unrolled(L, [[b[..., i] for i in range(n)]])
        return jnp.stack(x_list, axis=-1), mag
    c, low = cho_factor(A_l)
    x = cho_solve((c, low), b)
    return x, mag


def spd_inverse_lifted(A, eps: float = 1e-9):
    """(A + eps I)^{-1} by Cholesky; total on PSD A."""
    n = A.shape[-1]
    A_l = 0.5 * (A + jnp.swapaxes(A, -1, -2)) + eps * jnp.eye(n, dtype=A.dtype)
    mag = jnp.asarray(eps, dtype=A.dtype) * jnp.ones(A.shape[:-2], dtype=A.dtype)
    if n <= _UNROLL_CHOL_MAX_N:
        L = _chol_unrolled(A_l)
        one = jnp.ones(A.shape[:-2], dtype=A.dtype)
        zero = jnp.zeros(A.shape[:-2], dtype=A.dtype)
        cols = [[one if i == j else zero for i in range(n)] for j in range(n)]
        xs = _chol_solve_unrolled(L, cols)  # xs[j][i] = inv[i, j]
        inv = jnp.stack([jnp.stack([xs[j][i] for j in range(n)], axis=-1)
                         for i in range(n)], axis=-2)
        inv = 0.5 * (inv + jnp.swapaxes(inv, -1, -2))
        return inv, mag
    c, low = cho_factor(A_l)
    inv = cho_solve((c, low), jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A_l.shape))
    inv = 0.5 * (inv + jnp.swapaxes(inv, -1, -2))
    return inv, mag


def inv_mass(m, eps: float = 1e-12):
    """1 / (m + eps) for nonnegative masses (total)."""
    return 1.0 / (m + eps)


def clamp(x, lo, hi):
    """Clip with magnitude = amount clipped."""
    y = jnp.clip(x, lo, hi)
    return y, jnp.abs(x - y)


def safe_normalize(v, eps: float = 1e-12):
    """Normalize last axis; zero vectors map to zero (total). Returns (unit, norm)."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    unit = v / jnp.maximum(n, eps)
    unit = jnp.where(n > eps, unit, jnp.zeros_like(unit))
    return unit, n[..., 0]


def masked_softmax(logits, mask, axis=-1, floor: float = 1e-12):
    """Softmax over valid entries; invalid entries get zero weight.

    Fully masked rows return all-zeros (not NaN).
    """
    neg = jnp.asarray(-1e30, dtype=logits.dtype)
    z = jnp.where(mask, logits, neg)
    z = z - jax_stop_max(z, axis)
    e = jnp.where(mask, jnp.exp(z), 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, floor)


def jax_stop_max(z, axis):
    m = jnp.max(z, axis=axis, keepdims=True)
    return jnp.where(jnp.isfinite(m), m, 0.0)


def sanitize(x, sentinel: float = 1e6):
    """Replace non-finite entries with +/- sentinel (reference wrapper-boundary rule)."""
    return jnp.nan_to_num(x, nan=0.0, posinf=sentinel, neginf=-sentinel)


def cond_proxy(A, eps: float = 1e-12):
    """Cheap conditioning proxy: max/min diagonal ratio (no eigh).

    Used for the conditioning certificate on the hot path; the exact
    eigenvalue-based condition number is reserved for offline checks.
    """
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    dmax = jnp.max(d, axis=-1)
    dmin = jnp.min(d, axis=-1)
    return (dmax + eps) / (jnp.maximum(dmin, 0.0) + eps)


def cond_spectral(A, eps: float = 1e-12):
    """Exact spectral condition number via eigh (use off the hot path)."""
    lam = jnp.linalg.eigvalsh(0.5 * (A + jnp.swapaxes(A, -1, -2)))
    return (jnp.max(lam, axis=-1) + eps) / (jnp.maximum(jnp.min(lam, axis=-1), 0.0) + eps)


# ---------------------------------------------------------------------------
# Closed-form symmetric 3x3 eigen-solver (batched, VPU-friendly).
# ---------------------------------------------------------------------------

def eigvalsh3x3(A):
    """Eigenvalues of symmetric (..., 3, 3), ascending, closed form.

    Trigonometric method (Smith 1961): exact for symmetric 3x3, no iteration.
    Scale-normalized first: the method forms p^3, which overflows float32
    once entries pass ~1e6 (seen with heavily-fused map precisions) — inf/inf
    then poisons arccos with NaN. Eigenvalues scale linearly, so divide by
    the max |entry| and multiply back.
    """
    s = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), 1e-30)
    A = A / s[..., None, None]
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-38))
    # det(B/p) with B = A - qI
    c00 = b11 * b22 - a12 * a12
    c01 = a01 * b22 - a12 * a02
    c02 = a01 * a12 - b11 * a02
    detB = b00 * c00 - a01 * c01 + a02 * c02
    r = detB / (2.0 * p * p * p)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam2 = q + 2.0 * p * jnp.cos(phi)                         # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)    # smallest
    lam1 = 3.0 * q - lam0 - lam2
    # Degenerate (p ~ 0): all eigenvalues = q.
    degen = p2 < 1e-30
    lam0 = jnp.where(degen, q, lam0)
    lam1 = jnp.where(degen, q, lam1)
    lam2 = jnp.where(degen, q, lam2)
    return jnp.stack([lam0, lam1, lam2], axis=-1) * s[..., None]


def eigvec3x3(A, lam):
    """Unit eigenvector of symmetric 3x3 for eigenvalue lam, via cross products.

    Total: for (near-)degenerate eigenvalues returns a valid basis vector of the
    eigenspace (falls back to the largest-norm cross product, then to e_z).
    """
    eye = jnp.eye(3, dtype=A.dtype)
    M = A - lam[..., None, None] * eye
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nbest = jnp.linalg.norm(best, axis=-1, keepdims=True)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype=A.dtype), best.shape)
    unit = jnp.where(nbest > 1e-12, best / jnp.maximum(nbest, 1e-30), ez)
    return unit


def eigh3x3_smallest(A):
    """(smallest eigenvalue, its unit eigenvector) for symmetric (..., 3, 3)."""
    lam = eigvalsh3x3(A)
    return lam[..., 0], eigvec3x3(A, lam[..., 0]), lam


# ---------------------------------------------------------------------------
# Closed-form 3x3 inverse / solve (batched; avoids lapack on the hot path).
# ---------------------------------------------------------------------------

def det3x3(A):
    """Determinant of (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inv3x3(A, eps: float = 0.0):
    """Closed-form inverse of (..., 3, 3) via the adjugate.

    When ``eps > 0``, inverts ``A + eps I`` (lifted). Total function as long as
    the lifted matrix is nonsingular (which SPD + eps guarantees).
    """
    if eps:
        A = A + eps * jnp.eye(3, dtype=A.dtype)
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], axis=-1),
        jnp.stack([A10, A11, A12], axis=-1),
        jnp.stack([A20, A21, A22], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def solve3x3(A, b, eps: float = 0.0):
    """Solve (A + eps I) x = b for (..., 3, 3) / (..., 3)."""
    return jnp.einsum("...ij,...j->...i", inv3x3(A, eps), b)


def kabsch3x3(S, eps: float = 1e-12):
    """Closed-form proper-rotation polar factor of a 3x3 matrix.

    Returns (R, A) with R in SO(3), A = R^T S (symmetric at the optimum):
    the rotation maximizing tr(R^T S) (Kabsch/Wahba). Built on the analytic
    symmetric-3x3 eigensolver — no LAPACK/SVD, so it lowers cleanly to TPU
    (jnp.linalg.svd crashes the TPU HLO pipeline for this shape).

    Rank-deficient S is handled: the weak right-singular direction is
    completed by a cross product, so R is always a valid rotation.
    """
    StS = S.T @ S + eps * jnp.eye(3, dtype=S.dtype)
    lam = eigvalsh3x3(StS)                       # ascending
    va = eigvec3x3(StS, lam[2])                  # strongest direction
    vc_raw = eigvec3x3(StS, lam[0])              # weakest
    # Orthonormalize defensively (analytic eigvecs can lose orthogonality in
    # near-degenerate spectra), then complete a right-handed basis.
    vc = vc_raw - (vc_raw @ va) * va
    nc = jnp.linalg.norm(vc)
    alt = jnp.where(jnp.abs(va[0]) < 0.9,
                    jnp.asarray([1.0, 0.0, 0.0], S.dtype),
                    jnp.asarray([0.0, 1.0, 0.0], S.dtype))
    alt = alt - (alt @ va) * va
    vc = jnp.where(nc > 1e-6, vc / jnp.maximum(nc, 1e-30),
                   alt / jnp.linalg.norm(alt))
    vb = jnp.cross(vc, va)
    V = jnp.stack([va, vb, vc], axis=1)          # columns, right-handed

    s = jnp.sqrt(jnp.maximum(jnp.asarray([lam[2], lam[1], lam[0]],
                                         dtype=S.dtype), 0.0))
    ua = S @ va / jnp.maximum(s[0], eps)
    ua = ua / jnp.maximum(jnp.linalg.norm(ua), eps)
    ub_raw = S @ vb / jnp.maximum(s[1], eps)
    ub_raw = ub_raw - (ub_raw @ ua) * ua
    nb = jnp.linalg.norm(ub_raw)
    altb = jnp.where(jnp.abs(ua[0]) < 0.9,
                     jnp.asarray([1.0, 0.0, 0.0], S.dtype),
                     jnp.asarray([0.0, 1.0, 0.0], S.dtype))
    altb = altb - (altb @ ua) * ua
    ub = jnp.where(nb > 1e-6, ub_raw / jnp.maximum(nb, 1e-30),
                   altb / jnp.linalg.norm(altb))
    uc = jnp.cross(ua, ub)
    U = jnp.stack([ua, ub, uc], axis=1)

    R = U @ V.T
    A = R.T @ S
    A = 0.5 * (A + A.T)
    return R, A


# ---------------------------------------------------------------------------
# Symmetric-3x3 <-> 6-component packing (TPU layout discipline).
#
# Arrays shaped (..., 3, 3) put two tiny dims minor-most; the TPU tiler pads
# them to (8, 128) — a 42x memory/bandwidth blowup — and XLA inserts ~1 ms
# layout-change copies between {2,1,0} and {0,2,1} variants of every 350k-row
# map array (profiled: the dominant per-scan cost). Symmetric matrices in bulk
# storage are therefore kept as 6 component PLANES (xx, xy, xz, yy, yz, zz)
# with the large axes minor, and expanded to (..., 3, 3) only on small
# gathered working sets.
# ---------------------------------------------------------------------------

_SYM6_I = (0, 0, 0, 1, 1, 2)
_SYM6_J = (0, 1, 2, 1, 2, 2)


def mat33_to_sym6(A):
    """(..., 3, 3) symmetric -> (..., 6) components (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack([A[..., i, j] for i, j in zip(_SYM6_I, _SYM6_J)], axis=-1)


def sym6_to_mat33(c):
    """(..., 6) components -> (..., 3, 3) symmetric."""
    xx, xy, xz, yy, yz, zz = (c[..., k] for k in range(6))
    r0 = jnp.stack([xx, xy, xz], axis=-1)
    r1 = jnp.stack([xy, yy, yz], axis=-1)
    r2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def sym6_trace(c, axis=-1):
    """trace of the packed symmetric matrix: xx + yy + zz."""
    xx = jnp.take(c, 0, axis=axis)
    yy = jnp.take(c, 3, axis=axis)
    zz = jnp.take(c, 5, axis=axis)
    return xx + yy + zz


def top_k_two_stage(x, k: int, recall: float = 0.95):
    """Approximate top-k: bucket max-reduce then an exact small sort.

    Same binned-reduction semantics as ``lax.approx_max_k`` (expected recall
    1 - (k-1)/(2B) for B buckets) but hand-lowered: one variadic max/argmax
    reduce over (..., B, L) + one two-operand ``sort_key_val`` over B — no
    gathers. Profiled vs approx_max_k on the (1536, 7168) association
    selection: 170 us -> ~45 us (XLA's lowering is sort-heavy and not
    bandwidth-bound). Deterministic (ties -> lowest index)."""
    import jax as _jax
    n = x.shape[-1]
    B = max(128, -(-int((k - 1) / (2.0 * (1.0 - recall))) // 128) * 128)
    B = min(B, n)
    L = -(-n // B)
    pad = B * L - n
    if pad:
        fill = jnp.asarray(-jnp.inf, x.dtype)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=fill)
    xr = x.reshape(x.shape[:-1] + (B, L))
    # ONE variadic reduce for (max, argmax) — separate jnp.max + jnp.argmax
    # cost two full passes over the matrix (~40 us extra on (1536, 7168)).
    iota = _jax.lax.broadcasted_iota(jnp.int32, xr.shape, xr.ndim - 1)

    def _comb(acc, cur):
        av, ai = acc
        bv, bi = cur
        pick = (bv > av) | ((bv == av) & (bi < ai))
        return jnp.where(pick, bv, av), jnp.where(pick, bi, ai)

    vals, arg = _jax.lax.reduce(
        (xr, iota),
        (jnp.asarray(-jnp.inf, xr.dtype), jnp.int32(L)),
        _comb, [xr.ndim - 1])                                # (..., B) each
    arg = jnp.minimum(arg, L - 1)        # all-(-inf) pad bucket: stay in range
    gidx = arg + (jnp.arange(B, dtype=jnp.int32) * L)        # global index
    if k <= 16:
        # k sequential (max, argmax) passes over the B buckets instead of a
        # full sort_key_val: the sort costs ~27 us/scan on the (1536, 128)
        # association selection where k fused reduce+mask passes are
        # bandwidth-trivial. Same tie-break (lowest index wins).
        outs_v, outs_i = [], []
        v = vals
        for _ in range(k):
            mv, mi = _jax.lax.reduce(
                (v, gidx),
                (jnp.asarray(-jnp.inf, v.dtype), jnp.int32(2 ** 30)),
                _comb, [v.ndim - 1])
            outs_v.append(mv)
            outs_i.append(mi)
            v = jnp.where(gidx == mi[..., None], -jnp.inf, v)
        return (jnp.stack(outs_v, axis=-1), jnp.stack(outs_i, axis=-1))
    neg_s, idx_s = _jax.lax.sort_key_val(-vals, gidx, dimension=-1)
    return -neg_s[..., :k], idx_s[..., :k]


def top_k_maybe_approx(x, k: int, approx: bool = False):
    """top_k, or a binned approximate selection (recall ~0.95) when ``approx``.

    The approximate variant replaces the full per-row sort with a binned
    partial reduction — profiled 3-10x faster on (S, 50000) and (N, 7168)
    selections. Small k uses the hand-lowered two-stage (see
    ``top_k_two_stage``); large k falls back to ``lax.approx_max_k`` (the
    bucket sort dominates either way). Deterministic. Use only where the
    selection feeds soft machinery (OT responsibilities, retention eviction,
    candidate views)."""
    import jax as _jax
    if approx and 0 < k < x.shape[-1]:
        if k <= 128:
            return top_k_two_stage(x, k)
        return _jax.lax.approx_max_k(x, k)
    return _jax.lax.top_k(x, k)


# ---------------------------------------------------------------------------
# Component-plane symmetric-3x3 API: a batch of symmetric matrices stored as
# SIX stacked planes ``s (6, C)`` (rows xx, xy, xz, yy, yz, zz) and vectors as
# ``v (3, C)``. Identical math to the (..., 3, 3) helpers above, but the big
# batch axis C stays minor-most: a (C, 3, 3) array makes the TPU (8, 128)
# tiler pad the two 3-wide minor dims to (4, 128) — a ~42x memory blowup that
# turned every per-point/per-cell pass into ~75 us (profiled); plane storage
# moves the same math at the VPU's native tiling.
# ---------------------------------------------------------------------------

def sym6p_eigvals(s):
    """Eigenvalue planes (3, C), ascending (Smith 1961; see eigvalsh3x3)."""
    a00, a01, a02, a11, a12, a22 = s
    sc = jnp.maximum(jnp.max(jnp.abs(s), axis=0), 1e-30)
    a00, a01, a02 = a00 / sc, a01 / sc, a02 / sc
    a11, a12, a22 = a11 / sc, a12 / sc, a22 / sc
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-38))
    c00 = b11 * b22 - a12 * a12
    c01 = a01 * b22 - a12 * a02
    c02 = a01 * a12 - b11 * a02
    detB = b00 * c00 - a01 * c01 + a02 * c02
    r = jnp.clip(detB / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam2 = q + 2.0 * p * jnp.cos(phi)
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam1 = 3.0 * q - lam0 - lam2
    degen = p2 < 1e-30
    lam0 = jnp.where(degen, q, lam0)
    lam1 = jnp.where(degen, q, lam1)
    lam2 = jnp.where(degen, q, lam2)
    return jnp.stack([lam0, lam1, lam2], axis=0) * sc[None]


def sym6p_eigvec(s, lam):
    """Unit eigenvector planes (3, C) for eigenvalue plane lam (C,): largest
    cross product of rows of (A - lam I); e_z fallback on degeneracy."""
    a00, a01, a02, a11, a12, a22 = s
    m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
    # rows: r0 = (m00, a01, a02), r1 = (a01, m11, a12), r2 = (a02, a12, m22)
    c01x = a01 * a12 - a02 * m11
    c01y = a02 * a01 - m00 * a12
    c01z = m00 * m11 - a01 * a01
    c02x = a01 * m22 - a02 * a12
    c02y = a02 * a02 - m00 * m22
    c02z = m00 * a12 - a01 * a02
    c12x = m11 * m22 - a12 * a12
    c12y = a12 * a02 - a01 * m22
    c12z = a01 * a12 - m11 * a02
    n01 = c01x * c01x + c01y * c01y + c01z * c01z
    n02 = c02x * c02x + c02y * c02y + c02z * c02z
    n12 = c12x * c12x + c12y * c12y + c12z * c12z
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = (~use01) & (n02 >= n12)
    bx = jnp.where(use01, c01x, jnp.where(use02, c02x, c12x))
    by = jnp.where(use01, c01y, jnp.where(use02, c02y, c12y))
    bz = jnp.where(use01, c01z, jnp.where(use02, c02z, c12z))
    nb = jnp.sqrt(bx * bx + by * by + bz * bz)
    ok = nb > 1e-12
    nbs = jnp.maximum(nb, 1e-30)
    return jnp.stack([jnp.where(ok, bx / nbs, 0.0),
                      jnp.where(ok, by / nbs, 0.0),
                      jnp.where(ok, bz / nbs, 1.0)], axis=0)


def sym6p_inv(s, eps: float = 0.0):
    """Inverse planes (6, C) via the adjugate (of ``s + eps I`` when eps>0)."""
    a00, a01, a02, a11, a12, a22 = s
    if eps:
        a00, a11, a22 = a00 + eps, a11 + eps, a22 + eps
    A00 = a11 * a22 - a12 * a12
    A01 = a02 * a12 - a01 * a22
    A02 = a01 * a12 - a02 * a11
    A11 = a00 * a22 - a02 * a02
    A12 = a01 * a02 - a00 * a12
    A22 = a00 * a11 - a01 * a01
    det = a00 * A00 + a01 * A01 + a02 * A02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30,
                              jnp.where(det < 0, -1e-30, 1e-30), det)
    return jnp.stack([A00, A01, A02, A11, A12, A22], axis=0) * inv_det[None]


def sym6p_matvec(s, v):
    """(6, C) symmetric planes @ (3, C) vector planes -> (3, C)."""
    a00, a01, a02, a11, a12, a22 = s
    x, y, z = v
    return jnp.stack([a00 * x + a01 * y + a02 * z,
                      a01 * x + a11 * y + a12 * z,
                      a02 * x + a12 * y + a22 * z], axis=0)
