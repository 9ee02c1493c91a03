"""Per-bag camera feature sidecar (one-time host pass).

SURVEY.md section 7.3: "feature extraction for the full bag must be
precomputed/cached (one-time host pass) — legitimate because the reference
also treats it as frontend preprocessing" (the reference's features come from
a separate C++ node, ``src/visual_feature_node.cpp``, running outside the
backend's timing too).

``build_sidecar`` runs JPEG decode + depth convert + the native FAST-9
extractor once per RGB frame and stores the fixed-budget ``FeatureArrays``
rows in ONE ``.npz`` next to the bag (f32 where tolerable; ~35 KB/frame at
n_feat=512). ``_CameraIndex`` picks the sidecar up automatically ("auto")
when its stamps match the bag's RGB topic, after which per-scan camera
staging costs only the Route A/B lidar evidence + PoE fuse (~1 ms native).

The cache is keyed by content, not trust: frame count AND every RGB stamp
must match, or it is ignored.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_FIELDS_F64 = ("uv", "z", "depth_lambda", "depth_theta", "xyz_cam")
_FIELDS_F32 = ("cov_cam", "kappa_app", "normal_cam", "color", "weight")


def sidecar_path(db_file: str, rgb_topic: str, n_feat: int = None) -> str:
    """Default sidecar location: beside the bag's first .db3."""
    slug = rgb_topic.strip("/").replace("/", "_")
    return os.path.join(os.path.dirname(os.path.abspath(db_file)),
                        f"gc_features_{slug}.npz")


def build_sidecar(bag_dir: str, cam_topics, intrinsics, n_feat: int, *,
                  out_path: Optional[str] = None,
                  progress=None) -> str:
    """One pass over every RGB frame -> sidecar npz. Returns the path."""
    from fl_slam_tpu.io.cdr import (decode_compressed_image, decode_image,
                                    depth_image_to_m)
    from fl_slam_tpu.camera.features import extract_features
    from fl_slam_tpu.io.rosbag import RosbagReader, _decode_rgb

    reader = RosbagReader(bag_dir)
    rgb_msgs = [decode_compressed_image(b)
                for _, b in reader.read_topic(cam_topics.rgb)]
    depth_msgs = [decode_image(b)
                  for _, b in reader.read_topic(cam_topics.depth)]
    if not rgb_msgs or not depth_msgs:
        raise ValueError("bag has no RGB or no depth messages")
    rgb_stamps = np.asarray([m.stamp for m in rgb_msgs])
    depth_stamps = np.asarray([m.stamp for m in depth_msgs])
    d_idx = np.argmin(np.abs(depth_stamps[None, :] - rgb_stamps[:, None]),
                      axis=1)
    F = len(rgb_msgs)
    rows = {k: None for k in _FIELDS_F64 + _FIELDS_F32 + ("valid",)}
    for j in range(F):
        rgb = _decode_rgb(rgb_msgs[j].data)
        depth = depth_image_to_m(depth_msgs[d_idx[j]])
        feats = extract_features(rgb, depth, intrinsics, n_feat)
        for k in _FIELDS_F64:
            v = getattr(feats, k)
            if rows[k] is None:
                rows[k] = np.zeros((F,) + v.shape, dtype=np.float64)
            rows[k][j] = v
        for k in _FIELDS_F32:
            v = getattr(feats, k)
            if rows[k] is None:
                rows[k] = np.zeros((F,) + v.shape, dtype=np.float32)
            rows[k][j] = v
        if rows["valid"] is None:
            rows["valid"] = np.zeros((F, n_feat), dtype=bool)
        rows["valid"][j] = feats.valid
        if progress is not None and (j % 200 == 0 or j == F - 1):
            progress(j + 1, F)
    path = out_path or sidecar_path(reader.db_files[0], cam_topics.rgb)
    np.savez_compressed(path, rgb_stamps=rgb_stamps, n_feat=n_feat, **rows)
    return path


def load_sidecar(db_file: str, rgb_topic: str, rgb_stamps: np.ndarray, *,
                 path: Optional[str] = None) -> Optional[dict]:
    """Load + validate a sidecar; None when absent or stale (stamps must
    match the bag's RGB topic exactly)."""
    p = path or sidecar_path(db_file, rgb_topic)
    if not os.path.exists(p):
        return None
    try:
        with np.load(p) as z:
            cached = {k: z[k] for k in z.files}
    except Exception:
        return None
    st = cached.get("rgb_stamps")
    if st is None or st.shape != np.shape(rgb_stamps) \
            or not np.allclose(st, rgb_stamps, atol=1e-9):
        return None
    cached["__path__"] = p
    return cached


def row_to_features(sidecar: dict, j: int, dtype=np.float64):
    """Sidecar row j -> FeatureArrays (``dtype`` copies; the f32 staging
    path keeps the whole camera chain f32 — the per-scan slice math then
    runs ~2x faster on this host)."""
    from fl_slam_tpu.camera.features import FeatureArrays
    g = lambda k: np.asarray(sidecar[k][j], dtype=dtype)
    return FeatureArrays(
        uv=g("uv"), z=g("z"), depth_lambda=g("depth_lambda"),
        depth_theta=g("depth_theta"), xyz_cam=g("xyz_cam"),
        cov_cam=g("cov_cam"), kappa_app=g("kappa_app"),
        normal_cam=g("normal_cam"), color=g("color"), weight=g("weight"),
        valid=np.asarray(sidecar["valid"][j], dtype=bool))
