"""LiDAR->camera depth evidence + PoE fusion into camera features (parity:
reference ``frontend/sensors/lidar_camera_depth_fusion.py`` Routes A/B and
``frontend/sensors/splat_prep.py`` ``splat_prep_fused``).

Route A: project lidar points into the image, robust local depth sample
around each feature. Route B: weighted local plane fit of the lidar
neighborhood, ray-plane intersection depth. Mixture of experts in natural
parameters: Lambda_ell = Lambda_A + Lambda_B, theta_ell likewise — always
defined, -> 0 with no support (:389-442). Fusion: Lambda_f = Lambda_c +
Lambda_ell (PoE in depth naturals), backproject (u, v, z_f) with closed-form
covariance (:450-489).

Host-side numpy (staging time), mirroring the reference's frontend placement.
"""

from __future__ import annotations

import numpy as np

from fl_slam_tpu.camera.features import (FeatureArrays, PinholeIntrinsics,
                                         backprojection_cov)


def lidar_depth_evidence(feat_uv: np.ndarray, feat_valid: np.ndarray,
                         points_cam: np.ndarray, intr: PinholeIntrinsics, *,
                         radius_px: float = 6.0, min_support: int = 3,
                         sigma_lidar: float = 0.02, native: bool = True):
    """Per-feature lidar depth naturals (Lambda_ell, theta_ell) via Route A+B.

    points_cam: (M, 3) lidar points in the CAMERA frame.
    Returns (lambda_ell (N,), theta_ell (N,), support (N,)).

    ``native``: route through the C++ kernel (grid-binned candidates +
    closed-form 3x3 eigensolve, ~0.3 ms vs ~4 ms for this Python loop at
    production budgets) when built; this Python implementation remains the
    authoritative one it is parity-tested against (tests/test_camera.py).
    """
    if native:
        res = _lidar_depth_evidence_native(
            feat_uv, feat_valid, points_cam, intr, radius_px=radius_px,
            min_support=min_support, sigma_lidar=sigma_lidar)
        if res is not None:
            return res
    N = feat_uv.shape[0]
    lam = np.zeros(N)
    the = np.zeros(N)
    sup = np.zeros(N, dtype=int)
    front = points_cam[:, 2] > 0.05
    p = points_cam[front]
    if p.shape[0] == 0:
        return lam, the, sup
    u = intr.fx * p[:, 0] / p[:, 2] + intr.cx
    v = intr.fy * p[:, 1] / p[:, 2] + intr.cy
    inimg = (u >= 0) & (u < intr.width) & (v >= 0) & (v < intr.height)
    p, u, v = p[inimg], u[inimg], v[inimg]
    if p.shape[0] == 0:
        return lam, the, sup

    for i in range(N):
        if not feat_valid[i]:
            continue
        du = u - feat_uv[i, 0]
        dv = v - feat_uv[i, 1]
        near = du * du + dv * dv < radius_px ** 2
        k = int(near.sum())
        sup[i] = k
        if k < min_support:
            continue
        q = p[near]
        d2 = du[near] ** 2 + dv[near] ** 2
        w = np.exp(-0.5 * d2 / (0.5 * radius_px) ** 2)

        # Route A: robust (weighted-median-ish) local depth.
        z_a = float(np.median(q[:, 2]))
        mad = float(np.median(np.abs(q[:, 2] - z_a))) / 0.6745 + sigma_lidar
        lam_a = 1.0 / (mad * mad)

        # Route B: weighted plane fit + ray-plane intersection.
        lam_b, z_b = 0.0, 0.0
        if k >= 4:
            c = np.average(q, axis=0, weights=w)
            qc = q - c
            C = (qc * w[:, None]).T @ qc / max(w.sum(), 1e-9)
            evals, evecs = np.linalg.eigh(C)
            n = evecs[:, 0]
            ray = np.array([(feat_uv[i, 0] - intr.cx) / intr.fx,
                            (feat_uv[i, 1] - intr.cy) / intr.fy, 1.0])
            denom = float(ray @ n)
            if abs(denom) > 1e-3:
                t = float(c @ n) / denom
                if t > 0.05:
                    z_b = t           # depth along z since ray_z = 1
                    perp_var = max(float(evals[0]), sigma_lidar ** 2)
                    lam_b = abs(denom) ** 2 / perp_var

        lam[i] = lam_a + lam_b
        the[i] = lam_a * z_a + lam_b * z_b
    return lam, the, sup


def _lidar_depth_evidence_native(feat_uv, feat_valid, points_cam, intr, *,
                                 radius_px, min_support, sigma_lidar):
    """ctypes dispatch to ``gcv_lidar_depth_evidence`` (src/gcvision.cpp);
    None when the library is not built."""
    import ctypes

    from fl_slam_tpu.camera.features import _gcvision
    lib = _gcvision()
    if lib is None:
        return None
    if not hasattr(lib, "gcv_lidar_depth_evidence"):
        return None
    if getattr(lib.gcv_lidar_depth_evidence, "argtypes", None) is None:
        f64p = ctypes.POINTER(ctypes.c_double)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i64 = ctypes.c_int64
        lib.gcv_lidar_depth_evidence.restype = i64
        lib.gcv_lidar_depth_evidence.argtypes = [
            f64p, u8p, i64, f64p, i64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, i64, i64,
            ctypes.c_double, i64, ctypes.c_double,
            f64p, f64p, i64p]
        if hasattr(lib, "gcv_lidar_depth_evidence_f32"):
            lib.gcv_lidar_depth_evidence_f32.restype = i64
            lib.gcv_lidar_depth_evidence_f32.argtypes = [
                f64p, u8p, i64, f32p, i64,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, i64, i64,
                ctypes.c_double, i64, ctypes.c_double,
                f64p, f64p, i64p]
    N = feat_uv.shape[0]
    uv = np.ascontiguousarray(feat_uv, dtype=np.float64)
    valid = np.ascontiguousarray(feat_valid, dtype=np.uint8)
    lam = np.zeros(N)
    the = np.zeros(N)
    sup = np.zeros(N, dtype=np.int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    # f32 twin when the staged points are float32 (production): skips an
    # 8192x3 host conversion per scan (~0.1 ms); evidence math stays f64.
    use_f32 = (np.asarray(points_cam).dtype == np.float32
               and hasattr(lib, "gcv_lidar_depth_evidence_f32"))
    if use_f32:
        pts = np.ascontiguousarray(points_cam, dtype=np.float32)
        fn = lib.gcv_lidar_depth_evidence_f32
        pts_arg = pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        pts = np.ascontiguousarray(points_cam, dtype=np.float64)
        fn = lib.gcv_lidar_depth_evidence
        pts_arg = pts.ctypes.data_as(f64p)
    fn(uv.ctypes.data_as(f64p),
       valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), N,
       pts_arg, pts.shape[0],
       float(intr.fx), float(intr.fy), float(intr.cx), float(intr.cy),
       int(intr.width), int(intr.height),
       float(radius_px), int(min_support), float(sigma_lidar),
       lam.ctypes.data_as(f64p), the.ctypes.data_as(f64p),
       sup.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return lam, the, sup.astype(int)


def splat_prep_fused(feats: FeatureArrays, intr: PinholeIntrinsics,
                     points_cam: np.ndarray | None = None, *,
                     sigma_px: float = 1.0):
    """PoE-fuse camera + lidar depth naturals and backproject.

    Returns dict of fixed (N, ...) arrays for the camera slice:
    xyz_cam, cov_cam, color, weight, valid, kappa_app, z_fused.
    """
    N = feats.uv.shape[0]
    lam_ell = np.zeros(N)
    the_ell = np.zeros(N)
    if points_cam is not None and len(points_cam):
        lam_ell, the_ell, _ = lidar_depth_evidence(
            feats.uv, feats.valid, points_cam, intr)

    lam_f = feats.depth_lambda + lam_ell
    the_f = feats.depth_theta + the_ell
    ok = feats.valid & (lam_f > 1e-9)
    z_f = np.where(ok, the_f / np.maximum(lam_f, 1e-9), 0.0)
    ok = ok & (z_f > 1e-2)

    # Vectorized backprojection + covariance (the per-feature python loop
    # cost ~12 ms/frame; J S J^T expands into per-element products):
    # p = [(u-cx) z/fx, (v-cy) z/fy, z], J = dp/d(u,v,z),
    # S = diag(sigma_px^2, sigma_px^2, sigma_z^2).
    u = feats.uv[:, 0]
    v = feats.uv[:, 1]
    z = np.where(ok, z_f, 0.0)
    a = (u - intr.cx) / intr.fx
    b = (v - intr.cy) / intr.fy
    xyz = np.stack([a * z, b * z, z], axis=1) * ok[:, None]
    sz2 = np.where(ok, 1.0 / np.maximum(lam_f, 1e-9), 0.0)
    sp2 = sigma_px ** 2
    cov = np.zeros((N, 3, 3))
    cov[:, 0, 0] = sp2 * (z / intr.fx) ** 2 + sz2 * a * a
    cov[:, 1, 1] = sp2 * (z / intr.fy) ** 2 + sz2 * b * b
    cov[:, 2, 2] = sz2
    cov[:, 0, 1] = cov[:, 1, 0] = sz2 * a * b
    cov[:, 0, 2] = cov[:, 2, 0] = sz2 * a
    cov[:, 1, 2] = cov[:, 2, 1] = sz2 * b
    cov *= ok[:, None, None]
    return {
        "xyz_cam": xyz, "cov_cam": cov, "color": feats.color,
        "weight": np.where(ok, feats.weight, 0.0), "valid": ok,
        "kappa_app": feats.kappa_app, "z_fused": z_f,
        "normal_cam": feats.normal_cam,
    }


def camera_slice_fields(fused: dict, T_base_cam: np.ndarray, n_lobes: int):
    """Fused camera features (camera frame) -> base-frame info-form fields for
    ``MeasurementBatch.with_camera_features``
    (parity: ``backend/camera_batch_utils.py`` feature_list_to_camera_batch).

    T_base_cam: 4x4 camera->base extrinsic. Appearance lobe: unit view ray
    (base frame) with kappa_app concentration.
    """
    dt = np.asarray(fused["xyz_cam"]).dtype
    R = np.asarray(T_base_cam)[:3, :3].astype(dt)
    t = np.asarray(T_base_cam)[:3, 3].astype(dt)
    N = fused["xyz_cam"].shape[0]
    xyz_b = fused["xyz_cam"] @ R.T + t
    cov_b = (R @ fused["cov_cam"]) @ R.T
    ok = fused["valid"]
    # batched CLOSED-FORM 3x3 inverse (adjugate/det): np.linalg.inv on
    # (512, 3, 3) cost ~0.24 ms/scan of LAPACK dispatch in the camera
    # staging hot loop. Invalid rows get identity covariance so the
    # inverse stays well-posed; their Lambda/theta are masked below.
    safe = np.where(ok[:, None, None],
                    cov_b + np.asarray(1e-9, dt) * np.eye(3, dtype=dt),
                    np.eye(3, dtype=dt)[None])
    a, b_, c = safe[:, 0, 0], safe[:, 0, 1], safe[:, 0, 2]
    d, e, f = safe[:, 1, 1], safe[:, 1, 2], safe[:, 2, 2]
    A = d * f - e * e
    B = c * e - b_ * f
    C = b_ * e - c * d
    det = a * A + b_ * B + c * C
    inv_det = 1.0 / np.where(np.abs(det) > 1e-30, det, 1e-30)
    Lam = np.empty_like(safe)
    Lam[:, 0, 0] = A * inv_det
    Lam[:, 0, 1] = Lam[:, 1, 0] = B * inv_det
    Lam[:, 0, 2] = Lam[:, 2, 0] = C * inv_det
    Lam[:, 1, 1] = (a * f - c * c) * inv_det
    Lam[:, 1, 2] = Lam[:, 2, 1] = (c * b_ - a * e) * inv_det
    Lam[:, 2, 2] = (a * d - b_ * b_) * inv_det
    the = np.einsum("nij,nj->ni", Lam, xyz_b)
    # Primary lobe: the SURFACE NORMAL (sensor-facing, base frame) — the
    # same semantics as the lidar surfels' lobe 0. An earlier revision
    # stored the reversed VIEW RAY here; mixed with lidar normals in the
    # same map-lobe slot it mismatched the association direction term and
    # the Kabsch rotation scatter against lidar-built map normals
    # (|cos(dir, true normal)| median 0.15 on the synthetic rig) and
    # camera-on DEGRADED production ATE ~10x. Features whose depth-patch
    # fit was degenerate (zero normal) fall back to the view ray.
    ray_c = fused["xyz_cam"] / np.maximum(
        np.linalg.norm(fused["xyz_cam"], axis=1, keepdims=True), 1e-9)
    n_c = fused["normal_cam"]
    has_n = np.linalg.norm(n_c, axis=1) > 0.5
    dir_c = np.where(has_n[:, None], n_c, -ray_c)
    dirs_b = dir_c @ R.T
    etas = np.zeros((N, n_lobes, 3))
    etas[:, 0, :] = dirs_b * fused["kappa_app"][:, None] * ok[:, None]
    return {
        "Lambdas": Lam * ok[:, None, None], "thetas": the * ok[:, None],
        "etas": etas, "weights": fused["weight"] * ok,
        "valid": ok, "colors": np.clip(fused["color"], 0, 1),
    }


def splat_prep_fused_batch(feats_b: dict, intr: PinholeIntrinsics,
                           lam_ell_b, the_ell_b, *, sigma_px: float = 1.0):
    """Segment-BATCHED ``splat_prep_fused``: every input carries a leading
    scan axis S (sidecar rows gathered per scan), the per-feature lidar
    naturals come precomputed per scan (native Route A/B). Same math as the
    per-scan function (parity-tested); the batched form exists because the
    per-scan Python loop cost ~0.6 ms/scan of pure bookkeeping in the
    streamed camera path."""
    uv = feats_b["uv"]                                       # (S, N, 2)
    dt = uv.dtype
    lam_f = feats_b["depth_lambda"] + lam_ell_b
    the_f = feats_b["depth_theta"] + the_ell_b
    ok = feats_b["valid"] & (lam_f > 1e-9)
    z_f = np.where(ok, the_f / np.maximum(lam_f, 1e-9), 0.0)
    ok = ok & (z_f > 1e-2)
    u = uv[..., 0]
    v = uv[..., 1]
    z = np.where(ok, z_f, 0.0).astype(dt)
    a = ((u - intr.cx) / intr.fx).astype(dt)
    b = ((v - intr.cy) / intr.fy).astype(dt)
    xyz = np.stack([a * z, b * z, z], axis=-1) * ok[..., None]
    sz2 = np.where(ok, 1.0 / np.maximum(lam_f, 1e-9), 0.0).astype(dt)
    sp2 = dt.type(sigma_px * sigma_px) if hasattr(dt, "type") else sigma_px ** 2
    S, N = u.shape
    cov = np.zeros((S, N, 3, 3), dtype=dt)
    cov[..., 0, 0] = sp2 * (z / intr.fx) ** 2 + sz2 * a * a
    cov[..., 1, 1] = sp2 * (z / intr.fy) ** 2 + sz2 * b * b
    cov[..., 2, 2] = sz2
    cov[..., 0, 1] = cov[..., 1, 0] = sz2 * a * b
    cov[..., 0, 2] = cov[..., 2, 0] = sz2 * a
    cov[..., 1, 2] = cov[..., 2, 1] = sz2 * b
    cov *= ok[..., None, None]
    return {
        "xyz_cam": xyz, "cov_cam": cov, "color": feats_b["color"],
        "weight": np.where(ok, feats_b["weight"], 0.0), "valid": ok,
        "kappa_app": feats_b["kappa_app"], "z_fused": z_f,
        "normal_cam": feats_b["normal_cam"],
    }


def camera_slice_fields_batch(fused: dict, T_base_cam: np.ndarray,
                              n_lobes: int):
    """Segment-batched ``camera_slice_fields`` (leading scan axis S)."""
    dt = np.asarray(fused["xyz_cam"]).dtype
    R = np.asarray(T_base_cam)[:3, :3].astype(dt)
    t = np.asarray(T_base_cam)[:3, 3].astype(dt)
    S, N = fused["xyz_cam"].shape[:2]
    xyz_b = fused["xyz_cam"] @ R.T + t
    cov_b = (R @ fused["cov_cam"]) @ R.T
    ok = fused["valid"]
    safe = np.where(ok[..., None, None],
                    cov_b + np.asarray(1e-9, dt) * np.eye(3, dtype=dt),
                    np.eye(3, dtype=dt))
    a, b_, c = safe[..., 0, 0], safe[..., 0, 1], safe[..., 0, 2]
    d, e, f = safe[..., 1, 1], safe[..., 1, 2], safe[..., 2, 2]
    A = d * f - e * e
    B = c * e - b_ * f
    C = b_ * e - c * d
    det = a * A + b_ * B + c * C
    inv_det = 1.0 / np.where(np.abs(det) > 1e-30, det, 1e-30)
    Lam = np.empty_like(safe)
    Lam[..., 0, 0] = A * inv_det
    Lam[..., 0, 1] = Lam[..., 1, 0] = B * inv_det
    Lam[..., 0, 2] = Lam[..., 2, 0] = C * inv_det
    Lam[..., 1, 1] = (a * f - c * c) * inv_det
    Lam[..., 1, 2] = Lam[..., 2, 1] = (c * b_ - a * e) * inv_det
    Lam[..., 2, 2] = (a * d - b_ * b_) * inv_det
    the = np.einsum("snij,snj->sni", Lam, xyz_b)
    ray_c = fused["xyz_cam"] / np.maximum(
        np.linalg.norm(fused["xyz_cam"], axis=-1, keepdims=True), 1e-9)
    n_c = fused["normal_cam"]
    has_n = np.linalg.norm(n_c, axis=-1) > 0.5
    dir_c = np.where(has_n[..., None], n_c, -ray_c)
    dirs_b = dir_c @ R.T
    etas = np.zeros((S, N, n_lobes, 3), dtype=dt)
    etas[..., 0, :] = dirs_b * fused["kappa_app"][..., None] * ok[..., None]
    return {
        "Lambdas": Lam * ok[..., None, None],
        "thetas": the * ok[..., None],
        "etas": etas, "weights": fused["weight"] * ok,
        "valid": ok, "colors": np.clip(fused["color"], 0, 1),
    }
