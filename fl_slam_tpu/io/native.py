"""ctypes bindings for the native CDR batch decoders (src/gcio.cpp).

Falls back transparently to the pure-Python decoders in ``cdr.py`` when the
shared library has not been built (``./build_native.sh``). The native path is
the production bag-staging route: decoding 10^4-10^5 messages per bag in C++
keeps host preprocessing off the critical path of >=100x-real-time replay.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from fl_slam_tpu.io import cdr

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        path = os.path.join(os.path.dirname(__file__), "libgcio.so")
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            i64p = ctypes.POINTER(ctypes.c_int64)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f64p = ctypes.POINTER(ctypes.c_double)
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.gcio_decode_imu_batch.restype = ctypes.c_int64
            lib.gcio_decode_imu_batch.argtypes = [u8p, i64p, i64p,
                                                  ctypes.c_int64, f64p]
            lib.gcio_decode_odom_batch.restype = ctypes.c_int64
            lib.gcio_decode_odom_batch.argtypes = [u8p, i64p, i64p,
                                                   ctypes.c_int64, f64p]
            lib.gcio_decode_pointcloud2.restype = ctypes.c_int64
            lib.gcio_decode_pointcloud2.argtypes = [u8p, ctypes.c_int64, f64p,
                                                    f32p, f32p, i32p,
                                                    ctypes.c_int64]
            if hasattr(lib, "gcio_stage_lidar_batch"):
                lib.gcio_stage_lidar_batch.restype = ctypes.c_int64
                lib.gcio_stage_lidar_batch.argtypes = [
                    ctypes.POINTER(u8p), i64p, ctypes.c_int64,  # blob ptrs
                    f64p, f64p,                                # R_bl, t_bl
                    ctypes.c_double, ctypes.c_double,          # min_r, max_r
                    ctypes.c_double, ctypes.c_double,          # sigma, sentinel
                    ctypes.c_int64, ctypes.c_int64,            # n_cap, raw_cap
                    f64p, ctypes.c_int64, ctypes.c_int64,      # imu, n, len
                    ctypes.c_double,                           # accel_scale
                    f64p, ctypes.c_int64, ctypes.c_double,     # odom, n, prev_t
                    f64p, f64p, f64p, f64p, f64p,              # pts/st/w/ss/se
                    f64p, f64p, f64p,                          # imu out
                    f64p, f64p, f64p, f64p,                    # odom out
                    i64p]                                      # audit
            if hasattr(lib, "gcio_stage_lidar_batch_f32"):
                lib.gcio_stage_lidar_batch_f32.restype = ctypes.c_int64
                lib.gcio_stage_lidar_batch_f32.argtypes = [
                    ctypes.POINTER(u8p), i64p, ctypes.c_int64,  # blob ptrs
                    f64p, f64p,                                # R_bl, t_bl
                    ctypes.c_double, ctypes.c_double,          # min_r, max_r
                    ctypes.c_double, ctypes.c_double,          # sigma, sentinel
                    ctypes.c_int64, ctypes.c_int64,            # n_cap, raw_cap
                    f64p, ctypes.c_int64, ctypes.c_int64,      # imu, n, len
                    ctypes.c_double,                           # accel_scale
                    f64p, ctypes.c_int64, ctypes.c_double,     # odom, n, prev_t
                    ctypes.c_double, ctypes.c_double, f64p,    # origin/margin
                    f32p, f32p, f32p, f64p, f64p,              # pts/st/w/ss/se
                    f32p, f32p, f32p,                          # imu out
                    f32p, f32p, f32p, f32p,                    # odom out
                    i64p]                                      # audit
            _LIB = lib
    return _LIB


def have_native() -> bool:
    return _lib() is not None


def _pack(blobs):
    offsets = np.zeros(len(blobs), dtype=np.int64)
    sizes = np.asarray([len(b) for b in blobs], dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:]) if len(blobs) > 1 else None
    blob = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    return blob, offsets, sizes


def decode_imu_batch(blobs) -> np.ndarray:
    """list of CDR buffers -> (N, 7) [stamp, gyro xyz, accel xyz]."""
    lib = _lib()
    n = len(blobs)
    if lib is None:
        out = np.zeros((n, 7))
        for i, b in enumerate(blobs):
            m = cdr.decode_imu(b)
            out[i] = [m.stamp, *m.gyro, *m.accel]
        return out
    blob, offsets, sizes = _pack(blobs)
    out = np.zeros((n, 7), dtype=np.float64)
    done = lib.gcio_decode_imu_batch(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if done != n:
        raise ValueError(f"native imu decode: {done}/{n} messages ok")
    return out


def decode_odom_batch(blobs) -> np.ndarray:
    """list of CDR buffers -> (N, 86)
    [stamp, pos3, quat4, pose_cov36, vel3, omega3, twist_cov36]."""
    lib = _lib()
    n = len(blobs)
    if lib is None:
        out = np.zeros((n, 86))
        for i, b in enumerate(blobs):
            m = cdr.decode_odometry(b)
            out[i, 0] = m.stamp
            out[i, 1:4] = m.position
            out[i, 4:8] = m.quat_xyzw
            out[i, 8:44] = m.pose_cov.reshape(-1)
            out[i, 44:47] = m.vel_body
            out[i, 47:50] = m.omega_body
            out[i, 50:86] = m.twist_cov.reshape(-1)
        return out
    blob, offsets, sizes = _pack(blobs)
    out = np.zeros((n, 86), dtype=np.float64)
    done = lib.gcio_decode_odom_batch(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if done != n:
        raise ValueError(f"native odom decode: {done}/{n} messages ok")
    return out


def have_native_staging() -> bool:
    lib = _lib()
    return lib is not None and hasattr(lib, "gcio_stage_lidar_batch")


def alloc_stage_out(S, n_cap, imu_len, dtype=np.float64) -> dict:
    """Zero-filled output arrays for ``stage_lidar_batch`` (calloc-lazy).
    ``scan_start``/``scan_end`` stay f64 regardless (epoch-second stamps;
    the f32 fast path rebases them inline but keeps full precision)."""
    return {
        "points": np.zeros((S, n_cap, 3), dtype),
        "point_stamps": np.zeros((S, n_cap), dtype),
        "point_weights": np.zeros((S, n_cap), dtype),
        "scan_start": np.zeros(S),
        "scan_end": np.zeros(S),
        "imu_stamps": np.zeros((S, imu_len), dtype),
        "imu_gyro": np.zeros((S, imu_len, 3), dtype),
        "imu_accel": np.zeros((S, imu_len, 3), dtype),
        "odom_pose": np.zeros((S, 6), dtype),
        "odom_cov": np.zeros((S, 6, 6), dtype),
        "odom_vel_body": np.zeros((S, 3), dtype),
        "odom_omega_body": np.zeros((S, 3), dtype),
    }


def stage_lidar_batch(blobs, *, R_bl, t_bl, min_r, max_r, sigma, sentinel,
                      n_cap, raw_cap, imu, imu_len, accel_scale, odom,
                      prev_t=None, out=None, offset=0) -> dict:
    """One native call staging a batch of lidar scans (decode + sentinel +
    range weights + extrinsic + budget resample + IMU windows + closest odom)
    — the single-pass C++ twin of ``io/rosbag.load_scan_records``'s per-scan
    loop, tested for parity against it (tests/test_rosbag_io.py).

    ``imu`` (M, 7) and ``odom`` (N, 86) must be stamp-sorted (the caller
    sorts; bag order is already sorted in practice). ``prev_t``: scan_start
    preceding this batch (None for bag start). Returns the recs dict slices
    plus ``__audit_counts__`` = (nonfinite_total, saturated, missing_odom).

    ``out``/``offset``: optional preallocated output dict (alloc_stage_out,
    sized for the WHOLE bag) written at rows [offset, offset+S) — lets the
    chunked staging loop write each chunk in place instead of concatenating
    (~110 MB of copies per 300 VLP-16 scans).
    """
    lib = _lib()
    S = len(blobs)
    # Zero-copy blob access: an array of borrowed pointers into each bytes
    # object (c_char_p(b) aliases b's buffer; `blobs` stays alive across the
    # call). The previous b"".join pack copied the whole segment (~0.4
    # ms/scan at VLP-16 density).
    u8p = ctypes.POINTER(ctypes.c_uint8)
    bufs = (u8p * S)(*(ctypes.cast(ctypes.c_char_p(b), u8p) for b in blobs))
    sizes = np.asarray([len(b) for b in blobs], dtype=np.int64)
    imu = np.ascontiguousarray(imu, dtype=np.float64)
    odom = np.ascontiguousarray(odom, dtype=np.float64)
    whole = out
    if whole is None:
        out = alloc_stage_out(S, n_cap, imu_len)
    else:
        out = {k: v[offset:offset + S] for k, v in whole.items()
               if not k.startswith("__")}
    audit = np.zeros(3, dtype=np.int64)
    f64p = ctypes.POINTER(ctypes.c_double)

    def P(a):
        return a.ctypes.data_as(f64p)

    R_bl = np.ascontiguousarray(R_bl, dtype=np.float64)
    t_bl = np.ascontiguousarray(t_bl, dtype=np.float64)
    rc = lib.gcio_stage_lidar_batch(
        bufs,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), S,
        P(R_bl), P(t_bl), float(min_r), float(max_r), float(sigma),
        float(sentinel), int(n_cap), int(raw_cap),
        P(imu), imu.shape[0], int(imu_len), float(accel_scale),
        P(odom), odom.shape[0],
        float("nan") if prev_t is None else float(prev_t),
        P(out["points"]), P(out["point_stamps"]), P(out["point_weights"]),
        P(out["scan_start"]), P(out["scan_end"]), P(out["imu_stamps"]),
        P(out["imu_gyro"]), P(out["imu_accel"]), P(out["odom_pose"]),
        P(out["odom_cov"]), P(out["odom_vel_body"]),
        P(out["odom_omega_body"]),
        audit.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != S:
        raise ValueError(f"native lidar staging failed at message {-rc - 1}")
    out["__audit_counts__"] = tuple(int(x) for x in audit)
    return out


def have_native_staging_f32() -> bool:
    lib = _lib()
    return lib is not None and hasattr(lib, "gcio_stage_lidar_batch_f32")


def stage_lidar_batch_f32(blobs, *, R_bl, t_bl, min_r, max_r, sigma,
                          sentinel, n_cap, raw_cap, imu, imu_len,
                          accel_scale, odom, prev_t=None, origin=None,
                          margin=16.0) -> tuple:
    """f32-output staging with INLINE time rebase (the streaming upload
    path: the pipeline consumes float32, so the kernel writes f32 directly
    — staging math stays f64 and rounds once on store, value-identical to
    staging f64 + rebasing + converting host-side; parity-tested in
    tests/test_rosbag_io.py).

    ``origin``: None derives it from this batch's first scan (stamp -
    margin). Returns (recs dict [f32 arrays, f64 rebased scan_start/end],
    origin). ``__audit_counts__`` as in ``stage_lidar_batch``.
    """
    lib = _lib()
    S = len(blobs)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    bufs = (u8p * S)(*(ctypes.cast(ctypes.c_char_p(b), u8p) for b in blobs))
    sizes = np.asarray([len(b) for b in blobs], dtype=np.int64)
    imu = np.ascontiguousarray(imu, dtype=np.float64)
    odom = np.ascontiguousarray(odom, dtype=np.float64)
    out = alloc_stage_out(S, n_cap, imu_len, dtype=np.float32)
    audit = np.zeros(3, dtype=np.int64)
    origin_out = np.zeros(1)
    f64p = ctypes.POINTER(ctypes.c_double)
    f32p = ctypes.POINTER(ctypes.c_float)

    def P(a):
        return a.ctypes.data_as(f64p)

    def P32(a):
        return a.ctypes.data_as(f32p)

    R_bl = np.ascontiguousarray(R_bl, dtype=np.float64)
    t_bl = np.ascontiguousarray(t_bl, dtype=np.float64)
    rc = lib.gcio_stage_lidar_batch_f32(
        bufs,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), S,
        P(R_bl), P(t_bl), float(min_r), float(max_r), float(sigma),
        float(sentinel), int(n_cap), int(raw_cap),
        P(imu), imu.shape[0], int(imu_len), float(accel_scale),
        P(odom), odom.shape[0],
        float("nan") if prev_t is None else float(prev_t),
        float("nan") if origin is None else float(origin), float(margin),
        P(origin_out),
        P32(out["points"]), P32(out["point_stamps"]),
        P32(out["point_weights"]),
        P(out["scan_start"]), P(out["scan_end"]),
        P32(out["imu_stamps"]), P32(out["imu_gyro"]),
        P32(out["imu_accel"]), P32(out["odom_pose"]), P32(out["odom_cov"]),
        P32(out["odom_vel_body"]), P32(out["odom_omega_body"]),
        audit.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != S:
        raise ValueError(f"native f32 lidar staging failed at message "
                         f"{-rc - 1}")
    out["__audit_counts__"] = tuple(int(x) for x in audit)
    return out, float(origin_out[0])


def decode_pointcloud2(buf: bytes, cap: int):
    """One CDR buffer -> (stamp, xyz (n,3) f32, time (n,) f32, ring (n,) i32).

    n <= cap (caller sizes cap to the sensor's max return count).
    """
    lib = _lib()
    if lib is None:
        msg = cdr.decode_pointcloud2(buf)
        f = cdr.pointcloud2_fields(msg, ["x", "y", "z", "time", "t", "ring"])
        n = min(msg.width * msg.height, cap)
        xyz = np.stack([f["x"][:n], f["y"][:n], f["z"][:n]],
                       axis=1).astype(np.float32)
        t = f["time"] if f["time"] is not None else f["t"]
        t = (t[:n].astype(np.float32) if t is not None
             else np.zeros(n, np.float32))
        ring = (f["ring"][:n].astype(np.int32) if f["ring"] is not None
                else np.full(n, -1, np.int32))
        return msg.stamp, xyz, t, ring
    buf_np = np.frombuffer(buf, dtype=np.uint8)
    stamp = np.zeros(1, dtype=np.float64)
    xyz = np.zeros((cap, 3), dtype=np.float32)
    t = np.zeros(cap, dtype=np.float32)
    ring = np.zeros(cap, dtype=np.int32)
    n = lib.gcio_decode_pointcloud2(
        buf_np.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        stamp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ring.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if n < 0:
        raise ValueError("native pointcloud2 decode failed")
    return float(stamp[0]), xyz[:n], t[:n], ring[:n]
