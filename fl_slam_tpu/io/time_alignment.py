"""Stream time-alignment helpers (parity: reference
``frontend/sensors/time_alignment.py`` + ``tools/compute_time_alignment.py``
+ ``tools/align_ground_truth.py``): per-stream offset/drift estimation,
monotonicity checks, and GT time-base alignment."""

from __future__ import annotations

import numpy as np


def monotonicity_report(stamps: np.ndarray) -> dict:
    stamps = np.asarray(stamps, dtype=np.float64)
    d = np.diff(stamps)
    return {
        "n": int(stamps.size),
        "monotonic": bool((d >= 0).all()) if d.size else True,
        "n_backwards": int((d < 0).sum()),
        "min_dt": float(d.min()) if d.size else 0.0,
        "max_dt": float(d.max()) if d.size else 0.0,
        "median_dt": float(np.median(d)) if d.size else 0.0,
    }


def estimate_offset_drift(stamps_a: np.ndarray, stamps_b: np.ndarray) -> dict:
    """Least-squares t_b ~ t_a + offset + drift * (t_a - t_a[0]) over PAIRED
    samples (the i-th stamp of each stream observes the same event — e.g. one
    message's header stamp vs its arrival time). Value-nearest pairing cannot
    observe a constant offset, so pairing is by index; streams are truncated
    to the common length. Returns offset (s) and drift (ppm)."""
    a = np.asarray(stamps_a, dtype=np.float64)
    b = np.asarray(stamps_b, dtype=np.float64)
    n = min(a.size, b.size)
    if n < 2:
        return {"offset_s": 0.0, "drift_ppm": 0.0, "n_pairs": int(n)}
    a, b = a[:n], b[:n]
    A = np.stack([np.ones(n), a - a[0]], axis=1)
    coef, *_ = np.linalg.lstsq(A, b - a, rcond=None)
    return {"offset_s": float(coef[0]), "drift_ppm": float(coef[1] * 1e6),
            "n_pairs": int(n)}


def align_gt_timebase(gt_stamps: np.ndarray, est_stamps: np.ndarray) -> float:
    """Constant time offset mapping the GT clock onto the estimate's
    (parity: align_ground_truth.py). Convention: the recordings start
    together, so the offset is the difference of first stamps (robustified
    by the 5th percentile against leading junk)."""
    gt = np.asarray(gt_stamps, dtype=np.float64)
    est = np.asarray(est_stamps, dtype=np.float64)
    return float(np.percentile(est, 5) - np.percentile(gt, 5))


def overlap_fraction(gt_stamps, est_stamps, offset: float = 0.0) -> float:
    """GT-overlap sanity gate (parity: gt_checks.py)."""
    gt = np.asarray(gt_stamps, dtype=np.float64) + offset
    est = np.asarray(est_stamps, dtype=np.float64)
    lo, hi = max(gt.min(), est.min()), min(gt.max(), est.max())
    span = est.max() - est.min()
    return float(max(hi - lo, 0.0) / max(span, 1e-9))
