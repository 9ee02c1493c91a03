"""ROS 2 bag (sqlite3 ``.db3``) reader and scan-record builder.

Replaces the reference's ROS runtime chain (rosbag play -> DDS -> sensor hub
-> backend subscriptions, SURVEY.md section 3.1) with direct host-side
staging: read the bag once, decode CDR (native C++ batch decoders when built,
pure Python otherwise), apply the lidar->base extrinsic, window/pad IMU,
select closest odometry, and emit a stacked ScanInput ready for one
``device_put`` + ``lax.scan`` replay.

Host preprocessing parity (``backend_node.py``):
  - ``parse_pointcloud2_vlp16`` (:377-468): x/y/z + ring + per-point time,
    non-finite -> +-sentinel, range-sigmoid weights;
  - deterministic point-budget resample (ops/point_budget.py);
  - IMU window slice + zero-pad to ``imu_len`` (:1927-1952);
  - closest-odom selection (:1804-1847).
"""

from __future__ import annotations

import glob
import os
import sqlite3
from typing import NamedTuple, Optional

import numpy as np

from fl_slam_tpu.config import GCConfig
from fl_slam_tpu.io import native


def rotvec_to_matrix(r) -> np.ndarray:
    """Rodrigues (numpy, jax-free — shared by the forensics/converter
    tools)."""
    r = np.asarray(r, dtype=np.float64)
    th = np.linalg.norm(r)
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def quat_xyzw_to_rotvec(q: np.ndarray) -> np.ndarray:
    q = np.asarray(q, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z)
    if n < 1e-12:
        return np.zeros(3)
    angle = 2.0 * np.arctan2(n, abs(w))
    sign = 1.0 if w >= 0 else -1.0
    return sign * np.array([x, y, z]) / n * angle


class BagTopics(NamedTuple):
    lidar: str
    imu: str
    odom: str


class CameraTopics(NamedTuple):
    """RGB-D topics (parity: reference ``src/camera_rgbd_node.cpp`` inputs:
    compressed color + raw rectified depth)."""

    rgb: str        # sensor_msgs/CompressedImage (JPEG/PNG payload)
    depth: str      # sensor_msgs/Image (16UC1 mm or 32FC1 m)


def load_calibration(path: str) -> dict:
    """Rig calibration JSON -> {T_base_lidar (4,4), T_base_cam (4,4),
    intrinsics PinholeIntrinsics} (parity: the reference parses extrinsics
    inline/from file, ``backend_node.py:247-283,672-704``, and ships a Kimera
    converter ``tools/kimera_calibration_to_gc.py``).

    Schema: {"T_base_lidar": 4x4 nested list (optional),
             "T_base_cam": 4x4 (optional),
             "intrinsics": {fx, fy, cx, cy, width, height} (optional)}.
    """
    import json
    with open(path) as fh:
        raw = json.load(fh)
    out = {}
    for k in ("T_base_lidar", "T_base_cam"):
        if k in raw:
            T = np.asarray(raw[k], dtype=np.float64)
            if T.shape != (4, 4):
                raise ValueError(f"{k} must be 4x4, got {T.shape}")
            R = T[:3, :3]
            if abs(np.linalg.det(R) - 1.0) > 1e-3:
                raise ValueError(f"{k} rotation det {np.linalg.det(R):.6f}"
                                 " != 1 (not a rigid transform)")
            out[k] = T
    if "intrinsics" in raw:
        from fl_slam_tpu.camera.features import PinholeIntrinsics
        ii = raw["intrinsics"]
        out["intrinsics"] = PinholeIntrinsics(
            fx=float(ii["fx"]), fy=float(ii["fy"]), cx=float(ii["cx"]),
            cy=float(ii["cy"]), width=int(ii["width"]),
            height=int(ii["height"]))
    return out


class RosbagReader:
    """Reads all messages of the needed topics from a ROS 2 bag directory."""

    def __init__(self, bag_dir: str):
        db_files = sorted(glob.glob(os.path.join(bag_dir, "*.db3")))
        if not db_files:
            raise FileNotFoundError(f"no .db3 files under {bag_dir}")
        self.db_files = db_files

    def topics(self) -> dict:
        out = {}
        for db in self.db_files:
            con = sqlite3.connect(db)
            for tid, name, typ in con.execute(
                    "SELECT id, name, type FROM topics"):
                out[name] = typ
            con.close()
        return out

    def count_topic(self, topic: str) -> int:
        """Message count for a topic (cheap; lets staging preallocate)."""
        n = 0
        for db in self.db_files:
            con = sqlite3.connect(db)
            row = con.execute("SELECT id FROM topics WHERE name=?",
                              (topic,)).fetchone()
            if row is not None:
                n += con.execute(
                    "SELECT COUNT(*) FROM messages WHERE topic_id=?",
                    (row[0],)).fetchone()[0]
            con.close()
        return n

    def read_topic(self, topic: str):
        """Yields (bag_timestamp_ns, blob) for every message on the topic,
        in timestamp order.

        Reads in rowid (insertion) order when the topic's timestamps are
        already monotone there — checked first with a cheap stamps-only
        query. ``ORDER BY timestamp`` without a covering index forces a
        TEMP B-TREE that copies every blob (measured 0.32 vs 1.5 GB/s on
        VLP-16-sized clouds); rosbag2 writers append in time order, so the
        fast path is the production path."""
        for db in self.db_files:
            con = sqlite3.connect(db)
            # mmap the db: VLP-16 blobs (~576 KB) span ~140 overflow pages
            # each; pread-per-page runs ~1.25 GB/s, mmap ~5 GB/s (measured)
            # — at 28.8k pts/scan this is 0.3 ms/scan of staging budget.
            con.execute("PRAGMA mmap_size=1073741824")
            row = con.execute("SELECT id FROM topics WHERE name=?",
                              (topic,)).fetchone()
            if row is None:
                con.close()
                continue
            tid = row[0]
            stamps = [r[0] for r in con.execute(
                "SELECT timestamp FROM messages WHERE topic_id=? "
                "ORDER BY id", (tid,))]
            monotone = all(a <= b for a, b in zip(stamps, stamps[1:]))
            order = "id" if monotone else "timestamp"
            cur = con.execute(
                "SELECT timestamp, data FROM messages WHERE topic_id=? "
                f"ORDER BY {order}", (tid,))
            while True:
                rows = cur.fetchmany(32)
                if not rows:
                    break
                yield from rows
            con.close()


def _range_weights(xyz: np.ndarray, cfg: GCConfig) -> np.ndarray:
    """Range-sigmoid weights (parity: parse_pointcloud2_vlp16 weighting)."""
    r = np.linalg.norm(xyz, axis=1)
    # Clamp the exp arguments: sentinel-substituted points (|r| ~ 1e6) would
    # overflow exp and emit RuntimeWarnings in the production staging path;
    # the sigmoid is saturated (0 or 1 to f64 precision) beyond +-60 either
    # way, so the clamp is value-exact.
    a_lo = np.clip(-(r - cfg.range_weight_min_r)
                   / max(cfg.range_weight_sigma, 1e-6), -60.0, 60.0)
    a_hi = np.clip((r - cfg.range_weight_max_r)
                   / max(10.0 * cfg.range_weight_sigma, 1e-6), -60.0, 60.0)
    lo = 1.0 / (1.0 + np.exp(a_lo))
    hi = 1.0 / (1.0 + np.exp(a_hi))
    return (lo * hi).astype(np.float64)


def _budget_resample(points, stamps, weights, n_cap):
    """Deterministic PHASED-stride subsample + mass-preserving rescale + pad
    (parity: ops/point_budget.py, applied host-side at staging; the k mod s
    phase keeps every VLP-16 ring represented — see the note there)."""
    n_in = points.shape[0]
    out_p = np.zeros((n_cap, 3), dtype=np.float64)
    out_t = np.zeros((n_cap,), dtype=np.float64)
    out_w = np.zeros((n_cap,), dtype=np.float64)
    if n_in == 0:
        return out_p, out_t, out_w
    stride = max(1, -(-n_in // n_cap))
    k = np.arange(-(-n_in // stride))[:n_cap]
    idx = np.minimum(stride * k + (k % stride), n_in - 1)
    total = weights.sum()
    sel_w = weights[idx]
    scale = total / max(sel_w.sum(), 1e-12)
    out_p[:idx.size] = points[idx]
    out_t[:idx.size] = stamps[idx]
    out_w[:idx.size] = sel_w * scale
    return out_p, out_t, out_w


def _decode_rgb(payload: bytes) -> np.ndarray:
    """Compressed RGB payload (JPEG/PNG) -> (H, W, 3) uint8 (parity:
    camera_rgbd_node.cpp cv::imdecode; PIL is libjpeg/libpng-backed)."""
    import io as _io

    from PIL import Image
    img = Image.open(_io.BytesIO(payload))
    return np.asarray(img.convert("RGB"))


class _CameraIndex:
    """RGB-D message index for staging (parity: the reference chain
    ``camera_rgbd_node.cpp:49-90`` [decode + mm->m + stamp pairing
    <= 50 ms] -> ``visual_feature_node.cpp`` [features + depth naturals]
    -> ``backend_node.py:1865-1925``). Holds headers + payload bytes of
    all camera messages (decoded lazily per selected frame, cached), so
    segment-wise staging reuses one index across segments."""

    def __init__(self, reader: "RosbagReader", cam: CameraTopics, intrinsics,
                 T_base_cam, audit: dict, pair_window_s: float = 0.05,
                 feature_cache: Optional[str] = "auto"):
        from fl_slam_tpu.io.cdr import decode_compressed_image, decode_image
        self.cam = cam
        self.intrinsics = intrinsics
        self.T_base_cam = np.asarray(T_base_cam)
        self.rgb_msgs = [decode_compressed_image(b)
                         for _, b in reader.read_topic(cam.rgb)]
        self.depth_msgs = [decode_image(b)
                           for _, b in reader.read_topic(cam.depth)]
        audit["consumed"][cam.rgb] = len(self.rgb_msgs)
        audit["consumed"][cam.depth] = len(self.depth_msgs)
        audit.setdefault("camera_pairs", 0)
        audit.setdefault("camera_scans", 0)
        self.empty = not self.rgb_msgs or not self.depth_msgs
        if self.empty:
            return
        self.rgb_stamps = np.asarray([m.stamp for m in self.rgb_msgs])
        depth_stamps = np.asarray([m.stamp for m in self.depth_msgs])
        # Pair each RGB with the nearest depth (<= pair_window_s, reference
        # camera_rgbd_node pairing tolerance).
        self.d_idx = np.argmin(
            np.abs(depth_stamps[None, :] - self.rgb_stamps[:, None]), axis=1)
        self.pair_ok = np.abs(depth_stamps[self.d_idx]
                              - self.rgb_stamps) <= pair_window_s
        self.pair_cand = np.where(self.pair_ok)[0]
        audit["camera_pairs"] += int(self.pair_ok.sum())
        self.feat_cache: dict = {}
        # Per-bag precomputed feature sidecar (one-time host pass, see
        # camera/feature_cache.py and SURVEY section 7.3): when present and
        # matching, per-frame decode + extraction are skipped entirely.
        self.sidecar = None
        if feature_cache is not None:
            from fl_slam_tpu.camera.feature_cache import load_sidecar
            path = (None if feature_cache == "auto" else feature_cache)
            self.sidecar = load_sidecar(
                getattr(reader, "db_files", [""])[0], cam.rgb,
                self.rgb_stamps, path=path)
            if self.sidecar is not None:
                audit["camera_feature_cache"] = self.sidecar["__path__"]

    def _features_for(self, j: int, NF: int, dt=np.float64):
        """FeatureArrays for rgb frame j: sidecar row, else decode+extract
        with a small LRU (scans walk frames forward; 4 frames cover the
        pairing jitter)."""
        from fl_slam_tpu.camera.feature_cache import row_to_features
        from fl_slam_tpu.camera.features import extract_features
        from fl_slam_tpu.io.cdr import depth_image_to_m
        if self.sidecar is not None:
            if int(self.sidecar["n_feat"]) != NF:
                self.sidecar = None          # stale budget: fall through
            else:
                return row_to_features(self.sidecar, j, dtype=dt)
        if j not in self.feat_cache:
            intrinsics = self.intrinsics
            rgb = _decode_rgb(self.rgb_msgs[j].data)
            depth = depth_image_to_m(self.depth_msgs[self.d_idx[j]])
            if (rgb.shape[0] != intrinsics.height
                    or rgb.shape[1] != intrinsics.width):
                raise ValueError(
                    f"intrinsics {intrinsics.width}x{intrinsics.height} "
                    f"do not match bag image "
                    f"{rgb.shape[1]}x{rgb.shape[0]}")
            if len(self.feat_cache) >= 4:
                self.feat_cache.pop(next(iter(self.feat_cache)))
            self.feat_cache[j] = extract_features(rgb, depth, intrinsics, NF)
        return self.feat_cache[j]

    def stage(self, scan_starts, scan_points, cfg, audit: dict,
              scan_window_s: float = 0.15) -> dict:
        """Camera slice fields for one batch/segment of scans."""
        from fl_slam_tpu.camera.depth_fusion import (camera_slice_fields,
                                                     splat_prep_fused)

        T = len(scan_starts)
        B = cfg.vmf_n_lobes
        NF = cfg.n_feat
        out = _zero_camera_slice(T, cfg)
        if self.empty:
            return out
        intrinsics = self.intrinsics
        R_bc = self.T_base_cam[:3, :3]
        t_bc = self.T_base_cam[:3, 3]
        n_cam_scans = 0
        cand = self.pair_cand
        if cand.size == 0:
            return out
        # Vectorized nearest-frame pairing for the whole batch (the per-scan
        # argmin over all frames cost ~0.2 ms/scan on long bags).
        starts = np.asarray(scan_starts, dtype=np.float64)
        cs = self.rgb_stamps[cand]
        pos = np.searchsorted(cs, starts)
        lo = np.clip(pos - 1, 0, cand.size - 1)
        hi = np.clip(pos, 0, cand.size - 1)
        pick = np.where(np.abs(cs[hi] - starts) < np.abs(cs[lo] - starts),
                        hi, lo)
        j_all = cand[pick]
        ok_all = np.abs(self.rgb_stamps[j_all] - starts) <= scan_window_s
        sidecar_ok = (self.sidecar is not None
                      and int(self.sidecar["n_feat"]) == NF)
        if sidecar_ok:
            # SEGMENT-BATCHED path: features gathered as (S, NF, ...) rows
            # straight from the sidecar, fuse + slice vectorized over the
            # scan axis (the per-scan Python loop cost ~0.6 ms/scan of pure
            # bookkeeping). Only the per-scan Route A/B evidence stays a
            # loop (native kernel, ~0.2 ms/scan).
            from fl_slam_tpu.camera.depth_fusion import (
                camera_slice_fields_batch, lidar_depth_evidence,
                splat_prep_fused_batch)
            sel = np.flatnonzero(ok_all)
            if sel.size == 0:
                return out
            dt = np.float32 if cfg.jdtype == np.float32 else np.float64
            js = j_all[sel]
            fb = {k: np.asarray(self.sidecar[k][js], dtype=dt)
                  for k in ("uv", "depth_lambda", "depth_theta", "kappa_app",
                            "normal_cam", "color", "weight")}
            fb["valid"] = np.asarray(self.sidecar["valid"][js], dtype=bool)
            S = sel.size
            lam_b = np.zeros((S, NF), dtype=dt)
            the_b = np.zeros((S, NF), dtype=dt)
            for s, i in enumerate(sel):
                pts_cam = (scan_points[i] - t_bc) @ R_bc
                lam, the, _ = lidar_depth_evidence(
                    fb["uv"][s], fb["valid"][s], pts_cam, intrinsics)
                lam_b[s] = lam
                the_b[s] = the
            fused = splat_prep_fused_batch(fb, intrinsics, lam_b, the_b)
            fields = camera_slice_fields_batch(fused, self.T_base_cam, B)
            out["cam_Lambdas"][sel] = fields["Lambdas"]
            out["cam_thetas"][sel] = fields["thetas"]
            out["cam_etas"][sel] = fields["etas"]
            out["cam_weights"][sel] = fields["weights"]
            out["cam_valid"][sel] = fields["valid"].astype(np.float64)
            out["cam_colors"][sel] = fields["colors"]
            audit["camera_scans"] += int(sel.size)
            return out
        for i in range(T):
            if not ok_all[i]:
                continue
            j = j_all[i]
            feats = self._features_for(
                int(j), NF,
                np.float32 if cfg.jdtype == np.float32 else np.float64)
            # This scan's lidar points (base frame) -> camera frame for the
            # Route A/B lidar-depth evidence.
            pts_cam = (scan_points[i] - t_bc) @ R_bc
            fused = splat_prep_fused(feats, intrinsics, pts_cam)
            fields = camera_slice_fields(fused, self.T_base_cam, B)
            out["cam_Lambdas"][i] = fields["Lambdas"]
            out["cam_thetas"][i] = fields["thetas"]
            out["cam_etas"][i] = fields["etas"]
            out["cam_weights"][i] = fields["weights"]
            out["cam_valid"][i] = fields["valid"].astype(np.float64)
            out["cam_colors"][i] = fields["colors"]
            n_cam_scans += 1
        audit["camera_scans"] += n_cam_scans
        return out


def _zero_camera_slice(T: int, cfg) -> dict:
    B = cfg.vmf_n_lobes
    NF = cfg.n_feat
    return {
        "cam_Lambdas": np.zeros((T, NF, 3, 3)),
        "cam_thetas": np.zeros((T, NF, 3)),
        "cam_etas": np.zeros((T, NF, B, 3)),
        "cam_weights": np.zeros((T, NF)),
        "cam_valid": np.zeros((T, NF)),
        "cam_colors": np.full((T, NF, 3), 0.5),
    }


def _stage_camera(reader: "RosbagReader", cam: CameraTopics, intrinsics,
                  T_base_cam: np.ndarray, scan_starts, scan_points, cfg,
                  audit: dict, pair_window_s: float = 0.05,
                  scan_window_s: float = 0.15) -> dict:
    """One-shot camera staging (index + one stage pass; see _CameraIndex)."""
    idx = _CameraIndex(reader, cam, intrinsics, T_base_cam, audit,
                       pair_window_s)
    return idx.stage(scan_starts, scan_points, cfg, audit, scan_window_s)


def load_scan_records(bag_dir: str, topics: BagTopics, cfg: GCConfig, *,
                      T_base_lidar: Optional[np.ndarray] = None,
                      cam_topics: Optional[CameraTopics] = None,
                      intrinsics=None,
                      T_base_cam: Optional[np.ndarray] = None,
                      max_scans: Optional[int] = None,
                      raw_point_cap: int = 60000,
                      native_staging: bool = True) -> dict:
    """Read a bag and build the stacked ScanInput dict (numpy, leading T).

    T_base_lidar: optional 4x4 lidar->base extrinsic applied host-side
    (parity: backend_node.py:1680). cam_topics + intrinsics + T_base_cam
    enable the RGB-D camera slice (parity: camera_rgbd_node ->
    visual_feature_node -> backend camera batch).

    ``native_staging``: route the per-scan lidar staging loop through the
    single-pass C++ kernel (``gcio_stage_lidar_batch``) when built — ~10x
    the Python loop's scans/s on one core; the Python path below remains the
    authoritative implementation it is parity-tested against.
    """
    reader = RosbagReader(bag_dir)
    sentinel = cfg.nonfinite_sentinel
    # Staging audit (parity: the reference's wiring auditor,
    # frontend/audit/wiring_auditor.py — processed vs dead-ended topics plus
    # host-boundary counters, emitted as one JSON-able summary).
    audit = {
        "topics_in_bag": reader.topics(),
        "consumed": {},
        "n_scans": 0,
        "missing_odom_scans": 0,
        "imu_windows_saturated": 0,
        "nonfinite_points_total": 0,
        "staged_bytes": 0,
    }

    imu_blobs = [b for _, b in reader.read_topic(topics.imu)]
    odom_blobs = [b for _, b in reader.read_topic(topics.odom)]
    imu = native.decode_imu_batch(imu_blobs) if imu_blobs else np.zeros((0, 7))
    odom = (native.decode_odom_batch(odom_blobs) if odom_blobs
            else np.zeros((0, 86)))
    imu_stamps_all = imu[:, 0]
    odom_stamps_all = odom[:, 0]
    audit["consumed"][topics.imu] = int(len(imu_blobs))
    audit["consumed"][topics.odom] = int(len(odom_blobs))

    R_bl = np.eye(3)
    t_bl = np.zeros(3)
    if T_base_lidar is not None:
        R_bl = np.asarray(T_base_lidar)[:3, :3]
        t_bl = np.asarray(T_base_lidar)[:3, 3]

    if native_staging and native.have_native_staging():
        out = _native_stage_loop(reader, topics, cfg, R_bl, t_bl, imu, odom,
                                 max_scans, raw_point_cap, audit)
        audit["staging_backend"] = "native"
        return _finish_records(out, reader, topics, cfg, audit, cam_topics,
                               intrinsics, T_base_cam)
    audit["staging_backend"] = "python"

    blobs = []
    for _, blob in reader.read_topic(topics.lidar):
        blobs.append(blob)
        if max_scans is not None and len(blobs) >= max_scans:
            break
    out, _ = _python_stage_blobs(blobs, cfg, R_bl, t_bl, imu, odom, None,
                                 raw_point_cap, audit)
    return _finish_records(out, reader, topics, cfg, audit, cam_topics,
                           intrinsics, T_base_cam)


def _rebase_times(out: dict, origin: float) -> dict:
    """Shift all ABSOLUTE time fields by ``-origin`` (in place).

    ROS bags stamp with epoch seconds (~1.6e9): under the pipeline's f32
    the ulp there is 128 s, so every scan of a bag quantizes to the same
    stamp (dt = 0) until the value crosses to the next representable float
    — observed as a deterministic dt = 128 s OU-predict explosion at scan
    440 of the 5,000-scan fixture replay, with the gravity factor dead the
    whole run (quantized IMU stamps zero the soft windows). Staging
    therefore rebases every time field to ``origin`` (first lidar stamp
    minus a margin, so pre-scan IMU stays positive); zero entries are
    PADDING sentinels and stay zero. The origin rides the audit
    (``time_origin``) for GT alignment / TUM export."""
    for k in ("scan_start", "scan_end"):
        out[k] = out[k] - origin
    for k in ("point_stamps", "imu_stamps"):
        # in place, one pass (np.where allocated 3 temporaries — measured
        # 0.5 ms/scan of staging at VLP-16 density)
        v = np.ascontiguousarray(out[k])
        np.subtract(v, origin, out=v, where=(v != 0.0))
        out[k] = v
    return out


TIME_REBASE_MARGIN_S = 16.0

#: jitted per-(shape-layout) unpack functions for the packed segment upload
_PACKED_UNPACK_CACHE: dict = {}


def _fill_cam_zeros(out: dict, cam_missing, T: int, cfg) -> None:
    """Camera-off ScanInput leaves, built DEVICE-side inside the unpack jit
    (uploading ~95 MB of host zeros per 512-scan segment cost ~1 ms/scan)."""
    import jax.numpy as jnp
    if not cam_missing:
        return
    zshapes = _zero_camera_slice(1, cfg)
    for k in cam_missing:
        zshape = (T,) + zshapes[k].shape[1:]
        fill = 0.5 if k == "cam_colors" else 0.0
        out[k] = jnp.full(zshape, fill, dtype=jnp.float32)


def _python_stage_blobs(blobs, cfg, R_bl, t_bl, imu, odom, prev_t,
                        raw_point_cap, audit):
    """The authoritative per-scan staging loop over decoded lidar blobs
    (the native kernel ``gcio_stage_lidar_batch`` is parity-tested against
    this). Returns (stacked recs dict, prev_t after the batch)."""
    sentinel = cfg.nonfinite_sentinel
    imu_stamps_all = imu[:, 0] if len(imu) else np.zeros(0)
    odom_stamps_all = odom[:, 0] if len(odom) else np.zeros(0)
    recs = {k: [] for k in
            ("points", "point_stamps", "point_weights", "scan_start",
             "scan_end", "imu_stamps", "imu_gyro", "imu_accel", "odom_pose",
             "odom_cov", "odom_vel_body", "odom_omega_body")}
    for blob in blobs:
        stamp, xyz, t_rel, ring = native.decode_pointcloud2(blob,
                                                            raw_point_cap)
        # f64 staging math throughout (the decoder returns the f32 wire
        # values; leaving them f32 made the range-weight sigmoids compute in
        # f32 — a 6e-8 wart vs the f64 native staging kernel)
        xyz = xyz.astype(np.float64)
        bad = ~np.isfinite(xyz).all(axis=1)
        audit["nonfinite_points_total"] += int(bad.sum())
        xyz = np.where(bad[:, None], np.sign(xyz) * sentinel, xyz)
        xyz = np.nan_to_num(xyz, nan=sentinel, posinf=sentinel,
                            neginf=-sentinel)
        w = _range_weights(xyz, cfg) * (~bad)
        p_base = xyz @ R_bl.T + t_bl
        # Per-point absolute stamps: relative offsets when provided, else a
        # uniform sweep over the nominal 0.1 s rotation.
        if np.any(t_rel != 0):
            t_abs = stamp + t_rel.astype(np.float64)
        else:
            t_abs = stamp + np.linspace(0.0, 0.1, max(len(xyz), 1))
        pts, sts, ws = _budget_resample(p_base.astype(np.float64), t_abs, w,
                                        cfg.n_points)

        sweep_end = float(t_abs.max()) if len(t_abs) else stamp + 0.1
        recs["points"].append(pts)
        recs["point_stamps"].append(sts)
        recs["point_weights"].append(ws)
        recs["scan_start"].append(stamp)
        recs["scan_end"].append(max(sweep_end, stamp + 1e-3))

        # IMU window: everything in (prev_t - margin, sweep_end]; keep the
        # LAST imu_len samples, zero-pad the tail.
        t_lo = (prev_t if prev_t is not None else stamp - 1.0) - 0.05
        sel = (imu_stamps_all > t_lo) & (imu_stamps_all <= sweep_end)
        window = imu[sel][-cfg.imu_len:]
        m = window.shape[0]
        audit["imu_windows_saturated"] += int(int(sel.sum()) > cfg.imu_len)
        st = np.zeros(cfg.imu_len)
        gy = np.zeros((cfg.imu_len, 3))
        ac = np.zeros((cfg.imu_len, 3))
        st[:m] = window[:, 0]
        gy[:m] = window[:, 1:4]
        ac[:m] = window[:, 4:7] * cfg.imu_accel_scale
        recs["imu_stamps"].append(st)
        recs["imu_gyro"].append(gy)
        recs["imu_accel"].append(ac)

        # Closest odometry to the scan clock.
        if len(odom) > 0:
            k = int(np.argmin(np.abs(odom_stamps_all - stamp)))
            row = odom[k]
            pose = np.concatenate([row[1:4], quat_xyzw_to_rotvec(row[4:8])])
            cov = row[8:44].reshape(6, 6)
            vel = row[44:47]
            omg = row[47:50]
        else:
            # Missing odom: identity pose with huge covariance
            # (parity: backend_node.py:1663-1666).
            audit["missing_odom_scans"] += 1
            pose = np.zeros(6)
            cov = np.eye(6) * 1e12
            vel = np.zeros(3)
            omg = np.zeros(3)
        recs["odom_pose"].append(pose)
        recs["odom_cov"].append(cov)
        recs["odom_vel_body"].append(vel)
        recs["odom_omega_body"].append(omg)

        prev_t = stamp

    out = {k: np.asarray(v) for k, v in recs.items()}
    return out, prev_t


def _native_stage_loop(reader, topics, cfg, R_bl, t_bl, imu, odom, max_scans,
                       raw_point_cap, audit, chunk: int = 256) -> dict:
    """Lidar staging through the C++ single-pass kernel, in bounded chunks
    (blob batches stay ~chunk*0.7 MB; prev_t threads across chunks)."""
    # The kernel binary-searches stamps: sort once (bag order is already
    # stamp-sorted in practice; argmin/window semantics are order-free).
    imu = imu[np.argsort(imu[:, 0], kind="stable")] if len(imu) else imu
    odom = odom[np.argsort(odom[:, 0], kind="stable")] if len(odom) else odom
    # Preallocate the whole bag's outputs (calloc-lazy) and let each chunk's
    # native call write its rows in place — the previous per-chunk arrays +
    # np.concatenate copied every staged byte once more (~0.4 ms/scan).
    n_bag = reader.count_topic(topics.lidar)
    T = n_bag if max_scans is None else min(n_bag, max_scans)
    out = native.alloc_stage_out(T, cfg.n_points, cfg.imu_len)
    if T == 0:
        return {k: np.zeros((0,)) for k in out}
    blobs = []
    prev_t = None
    n_total = 0
    offset = 0
    counts = np.zeros(3, dtype=np.int64)

    def flush():
        nonlocal prev_t, offset
        if not blobs:
            return
        res = native.stage_lidar_batch(
            blobs, R_bl=R_bl, t_bl=t_bl,
            min_r=cfg.range_weight_min_r, max_r=cfg.range_weight_max_r,
            sigma=cfg.range_weight_sigma, sentinel=cfg.nonfinite_sentinel,
            n_cap=cfg.n_points, raw_cap=raw_point_cap, imu=imu,
            imu_len=cfg.imu_len, accel_scale=cfg.imu_accel_scale,
            odom=odom, prev_t=prev_t, out=out, offset=offset)
        counts[:] += np.asarray(res.pop("__audit_counts__"))
        prev_t = float(res["scan_start"][-1])
        offset += len(blobs)
        blobs.clear()

    for _, blob in reader.read_topic(topics.lidar):
        blobs.append(blob)
        n_total += 1
        if len(blobs) >= chunk:
            flush()
        if max_scans is not None and n_total >= max_scans:
            break
    flush()
    out = {k: v[:offset] for k, v in out.items()}
    audit["nonfinite_points_total"] += int(counts[0])
    audit["imu_windows_saturated"] += int(counts[1])
    audit["missing_odom_scans"] += int(counts[2])
    return out


def _finish_records(out, reader, topics, cfg, audit, cam_topics, intrinsics,
                    T_base_cam) -> dict:
    audit["n_scans"] = int(out["scan_start"].shape[0])
    audit["consumed"][topics.lidar] = audit["n_scans"]
    T = out["scan_start"].shape[0]
    B = cfg.vmf_n_lobes
    if cam_topics is not None and T > 0:
        if intrinsics is None:
            raise ValueError("camera staging needs intrinsics "
                             "(load_calibration --calib JSON)")
        out.update(_stage_camera(
            reader, cam_topics, intrinsics,
            np.eye(4) if T_base_cam is None else T_base_cam,
            out["scan_start"], out["points"], cfg, audit))
    else:
        # No camera: zero slice (every consumer masks on valid).
        out.update({
            "cam_Lambdas": np.zeros((T, cfg.n_feat, 3, 3)),
            "cam_thetas": np.zeros((T, cfg.n_feat, 3)),
            "cam_etas": np.zeros((T, cfg.n_feat, B, 3)),
            "cam_weights": np.zeros((T, cfg.n_feat)),
            "cam_valid": np.zeros((T, cfg.n_feat)),
            "cam_colors": np.full((T, cfg.n_feat, 3), 0.5),
        })
    audit["staged_bytes"] = int(sum(v.nbytes for v in out.values()
                                    if isinstance(v, np.ndarray)))
    audit["dead_end_topics"] = sorted(
        set(audit["topics_in_bag"]) - set(audit["consumed"]))
    # f32-safe relative time base (see _rebase_times); AFTER camera staging
    # (the camera index pairs frames on absolute stamps).
    origin = (float(out["scan_start"][0]) - TIME_REBASE_MARGIN_S
              if T > 0 else 0.0)
    _rebase_times(out, origin)
    audit["time_origin"] = origin
    out["__audit__"] = audit
    return out


def smoothed_initial_anchor(recs: dict, cfg: GCConfig, *, k: int = 10,
                            c_gyro: float = 0.5, c_accel: float = 2.0,
                            gravity_mag: float = 9.81) -> np.ndarray:
    """Closed-form smoothed initial anchor from the first k staged odom poses
    (parity: ``backend_node.py:1467-1513`` + ``_imu_stability_weights`` /
    ``_polar_so3`` at ``:296-332``; constants ``GC_INIT_ANCHOR_*``).

    One noisy first odom message otherwise biases the whole anchor chain and
    the initial-pose-aligned ATE. Per-pose stability weights come from the
    IMU sample nearest each scan clock, ``w = exp(-c_g ||w||^2) *
    exp(-c_a (||a|| - g)^2)`` (smooth downweighting while the robot rings at
    bag start; no gates). Translation = weighted mean with z pinned to the
    planar reference (odom z is unobserved for a ground robot); rotation =
    polar projection of the weighted rotation-matrix mean. Returns pose6.
    """
    poses = np.asarray(recs["odom_pose"][:k], dtype=np.float64)
    if len(poses) == 0:
        return np.zeros(6)
    stamps = np.asarray(recs["scan_start"][:k], dtype=np.float64)
    gyro = np.asarray(recs["imu_gyro"][:k], dtype=np.float64)
    accel = np.asarray(recs["imu_accel"][:k], dtype=np.float64)
    imu_t = np.asarray(recs["imu_stamps"][:k], dtype=np.float64)
    w = np.ones(len(poses))
    for i in range(len(poses)):
        valid = imu_t[i] > 0.0
        if not valid.any():
            continue
        j = int(np.argmin(np.abs(np.where(valid, imu_t[i], np.inf)
                                 - stamps[i])))
        w_g = np.exp(-c_gyro * float(gyro[i, j] @ gyro[i, j]))
        a_norm = float(np.linalg.norm(accel[i, j]))
        w[i] = w_g * np.exp(-c_accel * (a_norm - gravity_mag) ** 2)
    if w.sum() <= 0.0:
        w = np.ones(len(poses))
    w = w / w.sum()
    t_mean = np.einsum("i,ij->j", w, poses[:, :3])
    t_mean[2] = cfg.planar_z_ref
    M = np.einsum("i,ijk->jk", w,
                  np.stack([rotvec_to_matrix(p[3:6]) for p in poses]))
    U, _, Vh = np.linalg.svd(M)
    R = U @ Vh
    if np.linalg.det(R) < 0:
        U = U.copy()
        U[:, -1] *= -1.0
        R = U @ Vh
    # matrix -> rotvec via the quaternion route (stable near 0 and pi)
    tr = np.trace(R)
    qw = 0.5 * np.sqrt(max(1.0 + tr, 1e-12))
    qv = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    qv = qv / max(4.0 * qw, 1e-12)
    nv = np.linalg.norm(qv)
    rotvec = (2.0 * np.arctan2(nv, qw) / nv * qv) if nv > 1e-12 \
        else np.zeros(3)
    return np.concatenate([t_mean, rotvec])


def to_scan_inputs(recs: dict, cfg: GCConfig):
    import jax.numpy as jnp
    from fl_slam_tpu.pipeline import ScanInput
    return ScanInput(**{k: jnp.asarray(v, dtype=cfg.jdtype)
                        for k, v in recs.items() if not k.startswith("__")})


class StreamingStager:
    """LAZY segment-wise staging for big bags: iterating yields fixed-shape
    ``ScanInput`` segments of ``seg_len`` scans, each staged only when
    pulled — so ``pipeline.replay_segments``'s loop overlaps host staging
    of segment k+1 with the device replay of segment k (async dispatch).
    One-shot ``load_scan_records`` instead stages the WHOLE bag before the
    first replay step; the reference throttles the bag to 0.25-0.5x rate to
    hide the same cost (run_and_evaluate_gc.sh:16-18).

    The tail segment pads by repeating the last scan (same contract as
    ``scan_input_segments``); ``.n_scans`` (unpadded) and ``.audit`` are
    final once iteration completes. IMU/odom/camera headers are indexed
    up front (cheap); lidar blobs stream through the native staging kernel
    (or the authoritative Python loop when it is not built).
    """

    def __init__(self, bag_dir: str, topics: BagTopics, cfg: GCConfig,
                 seg_len: int, *, T_base_lidar=None,
                 cam_topics: Optional[CameraTopics] = None, intrinsics=None,
                 T_base_cam=None, max_scans: Optional[int] = None,
                 raw_point_cap: int = 60000, native_staging: bool = True,
                 upload_quant: bool = True):
        self.reader = RosbagReader(bag_dir)
        self.topics = topics
        self.cfg = cfg
        self.upload_quant = upload_quant
        self.seg_len = int(seg_len)
        self.max_scans = max_scans
        self.raw_point_cap = raw_point_cap
        self.audit = {
            "topics_in_bag": self.reader.topics(),
            "consumed": {},
            "n_scans": 0,
            "missing_odom_scans": 0,
            "imu_windows_saturated": 0,
            "nonfinite_points_total": 0,
            "staged_bytes": 0,
        }
        imu_blobs = [b for _, b in self.reader.read_topic(topics.imu)]
        odom_blobs = [b for _, b in self.reader.read_topic(topics.odom)]
        self.imu = (native.decode_imu_batch(imu_blobs) if imu_blobs
                    else np.zeros((0, 7)))
        self.odom = (native.decode_odom_batch(odom_blobs) if odom_blobs
                     else np.zeros((0, 86)))
        self.audit["consumed"][topics.imu] = len(imu_blobs)
        self.audit["consumed"][topics.odom] = len(odom_blobs)
        self.R_bl = np.eye(3)
        self.t_bl = np.zeros(3)
        if T_base_lidar is not None:
            self.R_bl = np.asarray(T_base_lidar)[:3, :3]
            self.t_bl = np.asarray(T_base_lidar)[:3, 3]
        self.native = native_staging and native.have_native_staging()
        self.audit["staging_backend"] = ("native" if self.native
                                         else "python")
        if self.native:
            self.imu = self.imu[np.argsort(self.imu[:, 0], kind="stable")] \
                if len(self.imu) else self.imu
            self.odom = self.odom[np.argsort(self.odom[:, 0],
                                             kind="stable")] \
                if len(self.odom) else self.odom
        self.cam_index = None
        if cam_topics is not None:
            if intrinsics is None:
                raise ValueError("camera staging needs intrinsics")
            self.cam_index = _CameraIndex(
                self.reader, cam_topics, intrinsics,
                np.eye(4) if T_base_cam is None else T_base_cam, self.audit)
        self.n_scans = 0
        self.time_origin = None
        # cheap per-scan accumulations for post-replay eval (ABSOLUTE
        # stamps for GT alignment, odom poses for the raw-odom baseline)
        self.scan_starts: list = []
        self.odom_poses: list = []

    def _stage_blobs(self, blobs, prev_t):
        # f32 fast path: the kernel writes float32 + rebases times INLINE
        # (the pipeline consumes float32; staging f64 then converting before
        # device_put cost ~0.5 ms/scan of the streamed loop). The f64 kernel
        # and the Python loop remain the authoritative parity pair.
        use_f32 = (self.native and self.cfg.jdtype == np.float32
                   and native.have_native_staging_f32())
        if use_f32:
            res, origin = native.stage_lidar_batch_f32(
                blobs, R_bl=self.R_bl, t_bl=self.t_bl,
                min_r=self.cfg.range_weight_min_r,
                max_r=self.cfg.range_weight_max_r,
                sigma=self.cfg.range_weight_sigma,
                sentinel=self.cfg.nonfinite_sentinel,
                n_cap=self.cfg.n_points, raw_cap=self.raw_point_cap,
                imu=self.imu, imu_len=self.cfg.imu_len,
                accel_scale=self.cfg.imu_accel_scale, odom=self.odom,
                prev_t=prev_t, origin=self.time_origin,
                margin=TIME_REBASE_MARGIN_S)
            if self.time_origin is None:
                self.time_origin = origin
                self.audit["time_origin"] = origin
            c = res.pop("__audit_counts__")
            self.audit["nonfinite_points_total"] += int(c[0])
            self.audit["imu_windows_saturated"] += int(c[1])
            self.audit["missing_odom_scans"] += int(c[2])
            start_abs = res["scan_start"] + self.time_origin
            new_prev = float(start_abs[-1])
            if self.cam_index is not None:
                res.update(self.cam_index.stage(start_abs, res["points"],
                                                self.cfg, self.audit))
            self.scan_starts.append(start_abs.copy())
            self.odom_poses.append(np.asarray(res["odom_pose"],
                                              dtype=np.float64))
            return res, new_prev
        if self.native:
            res = native.stage_lidar_batch(
                blobs, R_bl=self.R_bl, t_bl=self.t_bl,
                min_r=self.cfg.range_weight_min_r,
                max_r=self.cfg.range_weight_max_r,
                sigma=self.cfg.range_weight_sigma,
                sentinel=self.cfg.nonfinite_sentinel,
                n_cap=self.cfg.n_points, raw_cap=self.raw_point_cap,
                imu=self.imu, imu_len=self.cfg.imu_len,
                accel_scale=self.cfg.imu_accel_scale, odom=self.odom,
                prev_t=prev_t)
            c = res.pop("__audit_counts__")
            self.audit["nonfinite_points_total"] += int(c[0])
            self.audit["imu_windows_saturated"] += int(c[1])
            self.audit["missing_odom_scans"] += int(c[2])
            new_prev = float(res["scan_start"][-1])
        else:
            res, new_prev = _python_stage_blobs(
                blobs, self.cfg, self.R_bl, self.t_bl, self.imu, self.odom,
                prev_t, self.raw_point_cap, self.audit)
        if self.cam_index is not None:
            res.update(self.cam_index.stage(res["scan_start"],
                                            res["points"], self.cfg,
                                            self.audit))
        # camera-off: the zero slice is built DEVICE-side in __iter__
        # (jnp.zeros) — materializing + uploading ~95 MB of host zeros per
        # 512-scan segment cost ~1 ms/scan of the streamed path
        self.scan_starts.append(np.asarray(res["scan_start"]).copy())
        self.odom_poses.append(np.asarray(res["odom_pose"]).copy())
        # f32-safe relative time base, pinned by the first chunk (see
        # _rebase_times; camera pairing above uses the absolute stamps;
        # .scan_starts stays absolute for GT alignment)
        if self.time_origin is None:
            self.time_origin = (float(res["scan_start"][0])
                                - TIME_REBASE_MARGIN_S)
            self.audit["time_origin"] = self.time_origin
        _rebase_times(res, self.time_origin)
        return res, new_prev

    def _to_inputs(self, seg):
        import jax.numpy as jnp

        from fl_slam_tpu.pipeline import ScanInput
        cfg = self.cfg
        if cfg.jdtype == np.float32:
            return self._to_inputs_packed(seg)
        if self.cam_index is None:
            zeros = {k: jnp.zeros(
                (self.seg_len,) + v.shape[1:], dtype=cfg.jdtype)
                for k, v in _zero_camera_slice(1, cfg).items()
                if k != "cam_colors"}
            zeros["cam_colors"] = jnp.full(
                (self.seg_len, cfg.n_feat, 3), 0.5, dtype=cfg.jdtype)
            return ScanInput(**{k: jnp.asarray(v, dtype=cfg.jdtype)
                                for k, v in seg.items()}, **zeros)
        return to_scan_inputs(seg, cfg)

    def _to_inputs_packed(self, seg):
        """Minimal-transfer segment upload: per-leaf uploads cost a
        round-trip each on the tunneled runtime (~25 ms x 18 leaves), and
        once the replay program has run the runtime's H2D path degrades to
        ~45 MB/s regardless of content (measured; fresh process: 1.5 GB/s)
        — so BYTES are the streamed loop's wall. The bulk per-point/IMU
        fields ship as ONE uint16-quantized buffer (~90 KB/scan vs 180),
        the precision-critical remainder (imu stamps, odom, scan clock) as
        one small f32 buffer; a jitted device unpacker dequantizes and
        assembles the ScanInput (camera-off zero slices built device-side).

        Quantization steps — points 1.95 mm on +-64 m, weights 6.1e-5 on
        [0,4], gyro 4.9e-4 rad/s, accel 2e-3 m/s^2, per-point stamps
        1.8e-6 s relative to scan_start — all below the sensor noise floor
        AND below the f32 staging path's own rounding at bag timescales
        (a rebased stamp at 220 s has a 1.5e-5 s ulp). ``upload_quant=False``
        (stager arg) keeps the exact f32 pack for parity tests."""
        import jax
        import jax.numpy as jnp

        from fl_slam_tpu.pipeline import ScanInput
        cfg = self.cfg
        names = [k for k in ScanInput._fields if k in seg]
        cam_missing = tuple(k for k in ScanInput._fields if k not in seg)
        T = self.seg_len
        if not self.upload_quant:
            parts = [np.ascontiguousarray(seg[k], dtype=np.float32).ravel()
                     for k in names]
            shapes = tuple((k, tuple(seg[k].shape)) for k in names)
            key = ("plain", shapes, cam_missing, T)
            fn = _PACKED_UNPACK_CACHE.get(key)
            if fn is None:
                offs = []
                o = 0
                for k, shp in shapes:
                    n = int(np.prod(shp))
                    offs.append((k, o, n, shp))
                    o += n

                def unpack(buf):
                    out = {k: jax.lax.dynamic_slice(buf, (ofs,), (n,))
                           .reshape(shp) for k, ofs, n, shp in offs}
                    _fill_cam_zeros(out, cam_missing, T, cfg)
                    return ScanInput(**out)

                fn = jax.jit(unpack)
                _PACKED_UNPACK_CACHE[key] = fn
            flat = np.concatenate(parts) if len(parts) > 1 else parts[0]
            return fn(flat)

        # ---- quantized path ------------------------------------------------
        # Base ranges; lo/hi widen PER SEGMENT to the observed min/max (the
        # mass-preserving resample rescale can push weights above any fixed
        # ceiling), shipped as a tiny params vector so ONE compiled unpacker
        # serves every segment.
        QRANGES = {"points": (-64.0, 64.0), "point_weights": (0.0, 4.0),
                   "imu_gyro": (-16.0, 16.0), "imu_accel": (-64.0, 64.0),
                   "point_stamps": (0.0, 0.12),
                   # camera slice: ranges widen per segment to the observed
                   # min/max, so the bases just seed the grid; worst-case
                   # quantization is range/65535 ~ 0.002% of the segment's
                   # largest magnitude — far below feature covariance
                   # uncertainty. valid in {0,1} is exact on the u16 grid.
                   "cam_Lambdas": (-1.0, 1.0), "cam_thetas": (-1.0, 1.0),
                   "cam_etas": (-100.0, 100.0), "cam_weights": (0.0, 1.0),
                   "cam_valid": (0.0, 1.0), "cam_colors": (0.0, 1.0)}
        qnames = [k for k in names if k in QRANGES]
        fnames = [k for k in names if k not in qnames]
        scan_start = np.asarray(seg["scan_start"], dtype=np.float64)
        qparts = []
        qmeta = []
        params = []
        for k in qnames:
            v = np.asarray(seg[k], dtype=np.float32)
            if k == "point_stamps":
                v = v - scan_start[:, None].astype(np.float32)
            lo0, hi0 = QRANGES[k]
            lo = float(min(lo0, np.min(v))) if v.size else lo0
            hi = float(max(hi0, np.max(v))) if v.size else hi0
            step = (hi - lo) / 65535.0
            q = np.clip(np.rint((v - lo) * (1.0 / step)), 0.0,
                        65535.0).astype(np.uint16)
            qparts.append(q.ravel())
            qmeta.append((k, tuple(v.shape)))
            params.extend([lo, step])
        fparts = [np.ascontiguousarray(seg[k], dtype=np.float32).ravel()
                  for k in fnames]
        fshapes = tuple((k, tuple(seg[k].shape)) for k in fnames)
        qbuf = np.concatenate(qparts)
        fbuf = np.concatenate(fparts + [np.asarray(params, np.float32)])
        key = ("quant", tuple(qmeta), fshapes, cam_missing, T)
        fn = _PACKED_UNPACK_CACHE.get(key)
        if fn is None:
            qoffs = []
            o = 0
            for j, (k, shp) in enumerate(qmeta):
                n = int(np.prod(shp))
                qoffs.append((k, o, n, shp, j))
                o += n
            foffs = []
            o = 0
            for k, shp in fshapes:
                n = int(np.prod(shp))
                foffs.append((k, o, n, shp))
                o += n
            p_off = o

            def unpack(qb, fb):
                out = {k: jax.lax.dynamic_slice(fb, (ofs,), (n,))
                       .reshape(shp) for k, ofs, n, shp in foffs}
                for k, ofs, n, shp, j in qoffs:
                    q = jax.lax.dynamic_slice(qb, (ofs,), (n,)).reshape(shp)
                    lo = fb[p_off + 2 * j]
                    step = fb[p_off + 2 * j + 1]
                    v = q.astype(jnp.float32) * step + lo
                    if k == "point_stamps":
                        v = v + out["scan_start"][:, None].astype(jnp.float32)
                    out[k] = v
                _fill_cam_zeros(out, cam_missing, T, cfg)
                return ScanInput(**out)

            fn = jax.jit(unpack)
            _PACKED_UNPACK_CACHE[key] = fn
        return fn(qbuf, fbuf)

    def __iter__(self):
        blobs = []
        prev_t = None
        n = 0
        for _, blob in self.reader.read_topic(self.topics.lidar):
            blobs.append(blob)
            n += 1
            if len(blobs) == self.seg_len:
                seg, prev_t = self._stage_blobs(blobs, prev_t)
                blobs = []
                self.audit["staged_bytes"] += int(sum(
                    v.nbytes for v in seg.values()))
                yield self._to_inputs(seg)
            if self.max_scans is not None and n >= self.max_scans:
                break
        if blobs:
            seg, prev_t = self._stage_blobs(blobs, prev_t)
            pad = self.seg_len - len(blobs)
            seg = {k: np.concatenate(
                [v, np.repeat(v[-1:], pad, axis=0)], axis=0)
                for k, v in seg.items()}
            self.audit["staged_bytes"] += int(sum(
                v.nbytes for v in seg.values()))
            yield self._to_inputs(seg)
        self.n_scans = n
        self.audit["n_scans"] = n
        self.audit["consumed"][self.topics.lidar] = n
        self.audit["dead_end_topics"] = sorted(
            set(self.audit["topics_in_bag"]) - set(self.audit["consumed"]))


def scan_input_segments(recs: dict, cfg: GCConfig, seg_len: int):
    """Yield fixed-shape ``ScanInput`` segments of ``seg_len`` scans for
    ``pipeline.replay_segments`` (the big-bag path: staged host records are
    cheap, but one-shot DEVICE staging of a long bag does not fit beside
    the tile pool). The tail segment is padded by REPEATING the last scan —
    every segment compiles to the same shape; callers trim outputs to
    ``recs["scan_start"].shape[0]`` scans.

    Repeated-scan padding is benign end-state-wise: a repeat advances the
    belief with a ~0 s dt and re-fuses an already-explained scan (novelty
    ~0); trimmed outputs never expose it.
    """
    T = recs["scan_start"].shape[0]
    if T == 0:
        return
    for s in range(0, T, seg_len):
        seg = {}
        for k, v in recs.items():
            if k.startswith("__"):
                continue
            part = v[s:s + seg_len]
            if part.shape[0] < seg_len:
                pad = np.repeat(part[-1:], seg_len - part.shape[0], axis=0)
                part = np.concatenate([part, pad], axis=0)
            seg[k] = part
        yield to_scan_inputs(seg, cfg)
