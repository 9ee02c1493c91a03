"""Host-side visual feature extraction (parity: reference
``src/visual_feature_node.cpp`` — ORB with a fixed budget, grid spatial
spread, robust median depth sampling, quadratic local depth fit, closed-form
backprojection covariance, camera-depth natural parameters).

Host preprocessing by design (SURVEY.md section 2.5): feature extraction is
sensor I/O that runs once per bag at staging time; the fixed-size outputs
feed the device pipeline's camera slice.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class PinholeIntrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int


class FeatureArrays(NamedTuple):
    """Fixed-size (n_feat, ...) feature outputs; invalid rows are zeroed."""

    uv: np.ndarray            # (N, 2) pixel coords
    z: np.ndarray             # (N,) fused median depth (m); 0 invalid
    depth_lambda: np.ndarray  # (N,) camera-depth precision (1/m^2)
    depth_theta: np.ndarray   # (N,) camera-depth info (lambda * z)
    xyz_cam: np.ndarray       # (N, 3) backprojected point, camera frame
    cov_cam: np.ndarray       # (N, 3, 3) closed-form backprojection cov
    kappa_app: np.ndarray     # (N,) curvature-derived appearance concentration
    normal_cam: np.ndarray    # (N, 3) sensor-facing surface normal (camera
                              # frame) from the quadratic depth fit; zero
                              # when the fit is degenerate
    color: np.ndarray         # (N, 3) RGB in [0, 1]
    weight: np.ndarray        # (N,)
    valid: np.ndarray         # (N,) bool


def _grid_spread(kps, responses, width, height, n_keep, grid=16):
    """Spatial spread: bucket keypoints into a grid, keep the strongest per
    cell first (parity: the C++ node's hex-grid spread)."""
    if len(kps) == 0:
        return []
    gx = np.clip((kps[:, 0] / max(width, 1) * grid).astype(int), 0, grid - 1)
    gy = np.clip((kps[:, 1] / max(height, 1) * grid).astype(int), 0, grid - 1)
    cell = gy * grid + gx
    order = np.argsort(-responses)
    chosen, seen_round = [], {}
    # round-robin over cells by strength
    by_cell = {}
    for i in order:
        by_cell.setdefault(cell[i], []).append(i)
    rounds = max(len(v) for v in by_cell.values())
    for r in range(rounds):
        for cidx in sorted(by_cell):
            lst = by_cell[cidx]
            if r < len(lst):
                chosen.append(lst[r])
                if len(chosen) >= n_keep:
                    return chosen
    return chosen


def _median3(depth, u, v):
    h, w = depth.shape
    u = int(round(u))
    v = int(round(v))
    u0, u1 = max(u - 1, 0), min(u + 2, w)
    v0, v1 = max(v - 1, 0), min(v + 2, h)
    patch = depth[v0:v1, u0:u1].reshape(-1)
    good = patch[np.isfinite(patch) & (patch > 1e-3)]
    return float(np.median(good)) if good.size else 0.0


def _local_quadratic_depth(depth, u, v, rad=3):
    """Robust local quadratic depth fit around (u, v): returns (z0, grad (2,),
    curvature_mag, residual_var). MAD-weighted LSQ (the C++ node uses
    Student-t weights; one MAD reweight is the same robustness class)."""
    h, w = depth.shape
    u = int(round(u))
    v = int(round(v))
    u0, u1 = max(u - rad, 0), min(u + rad + 1, w)
    v0, v1 = max(v - rad, 0), min(v + rad + 1, h)
    uu, vv = np.meshgrid(np.arange(u0, u1) - u, np.arange(v0, v1) - v)
    zz = depth[v0:v1, u0:u1]
    m = np.isfinite(zz) & (zz > 1e-3)
    if m.sum() < 8:
        return 0.0, np.zeros(2), 0.0, 1.0
    x, y, z = uu[m].astype(float), vv[m].astype(float), zz[m].astype(float)
    A = np.stack([np.ones_like(x), x, y, 0.5 * x * x, x * y, 0.5 * y * y],
                 axis=1)
    coef, *_ = np.linalg.lstsq(A, z, rcond=None)
    r = z - A @ coef
    mad = np.median(np.abs(r - np.median(r))) / 0.6745 + 1e-6
    wgt = 1.0 / (1.0 + (r / (3.0 * mad)) ** 2)
    Aw = A * wgt[:, None]
    coef, *_ = np.linalg.lstsq(Aw, z * wgt, rcond=None)
    r = z - A @ coef
    res_var = float(np.sum(wgt * r * r) / max(np.sum(wgt), 1e-9))
    curv = float(np.sqrt(coef[3] ** 2 + 2 * coef[4] ** 2 + coef[5] ** 2))
    return float(coef[0]), coef[1:3], curv, max(res_var, 1e-8)


def surface_normal_from_grad(u, v, z, grad, intr: PinholeIntrinsics,
                             xyz_cam) -> np.ndarray:
    """Sensor-facing unit surface normal (camera frame) from the local depth
    gradient (m/px): the cross product of the backprojected tangents
    dP/du x dP/dv, flipped toward the camera. Zero when degenerate."""
    g_u, g_v = float(grad[0]), float(grad[1])
    tu = np.array([(z + (u - intr.cx) * g_u) / intr.fx,
                   (v - intr.cy) * g_u / intr.fy, g_u])
    tv = np.array([(u - intr.cx) * g_v / intr.fx,
                   (z + (v - intr.cy) * g_v) / intr.fy, g_v])
    n = np.cross(tu, tv)
    nn = np.linalg.norm(n)
    if nn < 1e-12:
        return np.zeros(3)
    n = n / nn
    if n @ np.asarray(xyz_cam) > 0.0:   # sensor-facing (camera at origin)
        n = -n
    return n


def fill_normals_from_depth(out: "FeatureArrays", depth,
                            intr: PinholeIntrinsics) -> None:
    """Populate ``normal_cam`` for valid features from the local depth
    gradient (used for the native backend, whose C ABI returns no gradient;
    the pure-Python extractor fills normals inline).

    Vectorized: ONE image-wide 3x3-median + central-difference gradient pass
    sampled at the feature pixels. The previous per-feature MAD quadratic
    refit ran ~512 Python lstsq's per frame (142 ms/frame measured — the
    single largest camera-staging cost); the median prefilter provides the
    same outlier-rejection class for the first-order gradient the normal
    needs, at ~2 ms/frame."""
    valid = out.valid
    if not valid.any():
        return
    d = np.asarray(depth, dtype=np.float64)
    bad = ~np.isfinite(d) | (d <= 1e-3)
    # 3x3 median (shifted copies). Invalid pixels ride as +inf: the median
    # stays exact while fewer than 5 of 9 neighbors are invalid and becomes
    # inf (-> masked to 0) otherwise. Median-of-9 via Paeth's 19-comparator
    # min/max network in f32 — np.median's partition on the 9-stack cost
    # ~21 ms/frame; the network is ~2 ms of pure elementwise min/max.
    dn = np.where(bad, np.inf, d).astype(np.float32)
    pp = np.pad(dn, 1, constant_values=np.inf)
    v = [pp[i:i + d.shape[0], j:j + d.shape[1]].copy()
         for i in range(3) for j in range(3)]

    def srt(i, j):
        lo = np.minimum(v[i], v[j])
        np.maximum(v[i], v[j], out=v[j])
        v[i] = lo

    for i, j in ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                 (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                 (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)):
        srt(i, j)
    med = v[4].astype(np.float64)
    # central differences (m/px); half-width 2 matches the old rad-3 patch's
    # effective support without its edge sensitivity. Differentiate the
    # UNMASKED median (inf where >=5 of 9 neighbors invalid): a stencil that
    # touches a hole produces inf/nan in gu/gv and the feature is
    # invalidated below, instead of a huge spurious-but-unit-norm normal
    # from differencing across a 0 fill (advisor round-3 #3).
    gu = np.zeros_like(med)
    gv = np.zeros_like(med)
    with np.errstate(invalid="ignore"):
        gu[:, 1:-1] = 0.5 * (med[:, 2:] - med[:, :-2])
        gv[1:-1, :] = 0.5 * (med[2:, :] - med[:-2, :])
    med = np.where(np.isfinite(med), med, 0.0)

    j = np.flatnonzero(valid)
    u = out.uv[j, 0]
    v = out.uv[j, 1]
    ui = np.clip(np.round(u).astype(int), 0, d.shape[1] - 1)
    vi = np.clip(np.round(v).astype(int), 0, d.shape[0] - 1)
    z = np.where(out.z[j] > 1e-3, out.z[j], med[vi, ui])
    ok = z > 1e-3
    g_u = gu[vi, ui]
    g_v = gv[vi, ui]
    # gradient stencil touched a masked median pixel -> no trustworthy normal
    ok &= np.isfinite(g_u) & np.isfinite(g_v)
    g_u = np.where(np.isfinite(g_u), g_u, 0.0)
    g_v = np.where(np.isfinite(g_v), g_v, 0.0)
    # tangents dP/du, dP/dv of the backprojection; normal = tu x tv
    tu = np.stack([(z + (u - intr.cx) * g_u) / intr.fx,
                   (v - intr.cy) * g_u / intr.fy,
                   g_u], axis=1)
    tv = np.stack([(u - intr.cx) * g_v / intr.fx,
                   (z + (v - intr.cy) * g_v) / intr.fy,
                   g_v], axis=1)
    n = np.cross(tu, tv)
    nn = np.linalg.norm(n, axis=1)
    ok &= nn > 1e-12
    n = np.where(ok[:, None], n / np.maximum(nn, 1e-12)[:, None], 0.0)
    # sensor-facing (camera at origin)
    flip = np.einsum("ij,ij->i", n, out.xyz_cam[j]) > 0.0
    n = np.where(flip[:, None], -n, n)
    out.normal_cam[j] = n


def backprojection_cov(u, v, z, intr: PinholeIntrinsics, sigma_px: float,
                       sigma_z: float) -> np.ndarray:
    """Closed-form 3x3 covariance of backproject(u, v, z)
    (parity: visual_feature_node.cpp closed-form backprojection covariance).

    p = [ (u-cx) z / fx, (v-cy) z / fy, z ];  J = dp/d(u, v, z).
    """
    J = np.array([
        [z / intr.fx, 0.0, (u - intr.cx) / intr.fx],
        [0.0, z / intr.fy, (v - intr.cy) / intr.fy],
        [0.0, 0.0, 1.0],
    ])
    S = np.diag([sigma_px ** 2, sigma_px ** 2, sigma_z ** 2])
    return J @ S @ J.T


_GCV = None
_GCV_TRIED = False

#: Which extractor produced the last extract_features() result ("native" /
#: "orb"); staging audits record it so runs are attributable to a backend
#: (the two differ numerically — corner ranking, depth fit weighting).
LAST_BACKEND = None


def _build_native() -> bool:
    """Build libgcvision.so from src/gcvision.cpp (the binary is not
    committed — it is platform-specific and unreviewable in git)."""
    import os
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    script = os.path.join(root, "build_native.sh")
    if not os.path.exists(script):
        return False
    try:
        subprocess.run(["bash", script], cwd=root, check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _gcvision():
    """ctypes handle to the native extractor (src/gcvision.cpp), built on
    demand when the .so is absent; None when the toolchain is unavailable."""
    global _GCV, _GCV_TRIED
    if not _GCV_TRIED:
        _GCV_TRIED = True
        import ctypes
        import os
        path = os.path.join(os.path.dirname(__file__), "libgcvision.so")
        if not os.path.exists(path):
            _build_native()
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            f64p = ctypes.POINTER(ctypes.c_double)
            i64 = ctypes.c_int64
            lib.gcv_extract_features.restype = i64
            lib.gcv_extract_features.argtypes = [
                u8p, f32p, u8p, i64, i64,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, i64, ctypes.c_int, ctypes.c_double,
                f64p, f64p, f64p, f64p, f64p, f64p, f64p, f64p, f64p, u8p,
                f64p]
            _GCV = lib
    return _GCV


def extract_native(rgb, depth, intr: PinholeIntrinsics, n_feat: int,
                   sigma_px: float = 1.0) -> FeatureArrays:
    """Native path with adaptive threshold: low-texture scenes (smooth
    synthetic walls, dim frames) need a lower segment-test threshold; retry
    halved until the budget is reasonably filled."""
    thr = 20
    out = _extract_native(rgb, depth, intr, n_feat, sigma_px, thr)
    while out.valid.sum() < max(4, n_feat // 4) and thr > 4:
        thr //= 2
        out = _extract_native(rgb, depth, intr, n_feat, sigma_px, thr)
    return out


def _extract_native(rgb, depth, intr: PinholeIntrinsics, n_feat: int,
                    sigma_px: float, fast_thr: int = 20) -> FeatureArrays:
    """Native path: FAST-9 + grid spread + robust depth statistics in C++
    (parity role of the reference's C++ visual_feature_node)."""
    import ctypes
    lib = _gcvision()
    gray = np.ascontiguousarray(
        (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        .astype(np.uint8))
    depth32 = np.ascontiguousarray(depth, dtype=np.float32)
    rgb8 = np.ascontiguousarray(rgb, dtype=np.uint8)
    N = n_feat
    out = FeatureArrays(
        uv=np.zeros((N, 2)), z=np.zeros(N), depth_lambda=np.zeros(N),
        depth_theta=np.zeros(N), xyz_cam=np.zeros((N, 3)),
        cov_cam=np.zeros((N, 3, 3)), kappa_app=np.zeros(N),
        normal_cam=np.zeros((N, 3)),
        color=np.full((N, 3), 0.5), weight=np.zeros(N),
        valid=np.zeros(N, dtype=bool))
    validu8 = np.zeros(N, dtype=np.uint8)
    grad = np.zeros((N, 2))
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    lib.gcv_extract_features(
        p(gray, ctypes.c_uint8), p(depth32, ctypes.c_float),
        p(rgb8, ctypes.c_uint8), intr.height, intr.width,
        intr.fx, intr.fy, intr.cx, intr.cy, N, fast_thr, sigma_px,
        p(out.uv, ctypes.c_double), p(out.z, ctypes.c_double),
        p(out.depth_lambda, ctypes.c_double),
        p(out.depth_theta, ctypes.c_double), p(out.xyz_cam, ctypes.c_double),
        p(out.cov_cam, ctypes.c_double), p(out.kappa_app, ctypes.c_double),
        p(out.color, ctypes.c_double), p(out.weight, ctypes.c_double),
        p(validu8, ctypes.c_uint8), p(grad, ctypes.c_double))
    out.valid[:] = validu8 > 0
    # Surface normals, closed-form from the C fit's robust depth gradient
    # (the same Student-t quadratic patch that produced z0/curv). Replaces
    # the image-wide median+gradient pass (~20 ms/frame at 640x480) with
    # ~0.1 ms over the <=n_feat features.
    fill_normals_from_grad(out, grad, intr)
    return out


def fill_normals_from_grad(out: "FeatureArrays", grad: np.ndarray,
                           intr: PinholeIntrinsics) -> None:
    """Vectorized ``surface_normal_from_grad`` over the valid features:
    normal = (dP/du x dP/dv) of the backprojection, sensor-facing; zero when
    the patch fit was degenerate (zero gradient rows stay zero-normal ONLY
    if the tangent cross-product degenerates — a flat fronto-parallel patch
    has grad 0 but a well-defined normal [0,0,-1])."""
    j = np.flatnonzero(out.valid)
    if j.size == 0:
        return
    u, v = out.uv[j, 0], out.uv[j, 1]
    z = out.z[j]
    g_u, g_v = grad[j, 0], grad[j, 1]
    tu = np.stack([(z + (u - intr.cx) * g_u) / intr.fx,
                   (v - intr.cy) * g_u / intr.fy, g_u], axis=1)
    tv = np.stack([(u - intr.cx) * g_v / intr.fx,
                   (z + (v - intr.cy) * g_v) / intr.fy, g_v], axis=1)
    n = np.cross(tu, tv)
    nn = np.linalg.norm(n, axis=1)
    ok = (nn > 1e-12) & (z > 1e-3)
    n = np.where(ok[:, None], n / np.maximum(nn, 1e-12)[:, None], 0.0)
    flip = np.einsum("ij,ij->i", n, out.xyz_cam[j]) > 0.0
    out.normal_cam[j] = np.where(flip[:, None], -n, n)


def extract_features(rgb: np.ndarray, depth: np.ndarray,
                     intr: PinholeIntrinsics, n_feat: int, *,
                     sigma_px: float = 1.0,
                     n_levels: int = 8,
                     backend: str = "auto") -> FeatureArrays:
    """Corner budget -> grid spread -> median3 depth -> quadratic fit ->
    backprojection covariance + depth naturals. rgb uint8 (H, W, 3),
    depth float meters (H, W).

    backend: "native" (C++ FAST-9, the production staging path), "orb"
    (OpenCV ORB), or "auto" (native when built, else ORB).
    """
    global LAST_BACKEND
    if backend == "native" or (backend == "auto" and _gcvision() is not None):
        LAST_BACKEND = "native"
        return extract_native(rgb, depth, intr, n_feat, sigma_px)
    LAST_BACKEND = "orb"
    import cv2

    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    orb = cv2.ORB_create(nfeatures=4 * n_feat, nlevels=n_levels)
    kps = orb.detect(gray, None)

    N = n_feat
    out = FeatureArrays(
        uv=np.zeros((N, 2)), z=np.zeros(N), depth_lambda=np.zeros(N),
        depth_theta=np.zeros(N), xyz_cam=np.zeros((N, 3)),
        cov_cam=np.zeros((N, 3, 3)), kappa_app=np.zeros(N),
        normal_cam=np.zeros((N, 3)),
        color=np.full((N, 3), 0.5), weight=np.zeros(N),
        valid=np.zeros(N, dtype=bool))
    if not kps:
        return out

    pts = np.asarray([k.pt for k in kps])
    resp = np.asarray([k.response for k in kps])
    keep = _grid_spread(pts, resp, intr.width, intr.height, 3 * N)

    j = 0
    for i in keep:
        if j >= N:
            break
        u, v = pts[i]
        z_med = _median3(depth, u, v)
        if z_med <= 1e-3:
            continue
        z0, grad, curv, res_var = _local_quadratic_depth(depth, u, v)
        z_use = z_med if z0 <= 1e-3 else 0.5 * (z_med + z0)
        lam_d = 1.0 / (res_var + (0.002 * z_use) ** 2)   # depth precision
        sigma_z = 1.0 / np.sqrt(lam_d)
        x = (u - intr.cx) * z_use / intr.fx
        y = (v - intr.cy) * z_use / intr.fy
        cov = backprojection_cov(u, v, z_use, intr, sigma_px, sigma_z)
        ui, vi = int(round(u)), int(round(v))
        col = rgb[min(vi, intr.height - 1), min(ui, intr.width - 1)] / 255.0
        out.uv[j] = (u, v)
        out.z[j] = z_use
        out.depth_lambda[j] = lam_d
        out.depth_theta[j] = lam_d * z_use
        out.xyz_cam[j] = (x, y, z_use)
        out.cov_cam[j] = cov
        # appearance concentration from local curvature (flat -> high kappa)
        out.kappa_app[j] = float(np.clip(10.0 / (1.0 + 50.0 * curv), 0.5,
                                         100.0))
        out.normal_cam[j] = surface_normal_from_grad(u, v, z_use, grad, intr,
                                                     out.xyz_cam[j])
        out.color[j] = col
        out.weight[j] = float(resp[i] / (resp.max() + 1e-9))
        out.valid[j] = True
        j += 1
    return out
