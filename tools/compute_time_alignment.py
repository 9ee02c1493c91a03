"""Per-topic time-base forensics for a ROS 2 bag (parity: reference
``tools/compute_time_alignment.py`` + the frontend time_alignment helper).

For each requested topic: header-stamp monotonicity, rate statistics, and
the header-vs-bag-receive clock offset/drift (paired by message index —
value-nearest pairing cannot observe a constant offset). Prints a JSON
report and flags offsets that would break nearest-stamp sensor pairing.

Usage:
  python tools/compute_time_alignment.py BAG_DIR topic [topic ...]
  python tools/compute_time_alignment.py BAG_DIR --all [--max-msgs 2000]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _header_stamp(blob: bytes) -> float:
    """First header stamp of any std_msgs/Header-led message (sec + nsec
    follow the 4-byte CDR encapsulation)."""
    import struct
    if len(blob) < 12 or blob[1] not in (0x01, 0x03):
        return float("nan")
    sec, nsec = struct.unpack_from("<iI", blob, 4)
    return sec + nsec * 1e-9


def analyze_topic(reader, topic: str, max_msgs: int) -> dict:
    from fl_slam_tpu.io.time_alignment import (estimate_offset_drift,
                                               monotonicity_report)
    hdr, rcv = [], []
    for ts, blob in reader.read_topic(topic):
        h = _header_stamp(blob)
        if np.isfinite(h) and h > 0:
            hdr.append(h)
            rcv.append(ts * 1e-9)
        if len(hdr) >= max_msgs:
            break
    if not hdr:
        return {"topic": topic, "n": 0}
    hdr = np.asarray(hdr)
    rcv = np.asarray(rcv)
    rep = {
        "topic": topic,
        "n": int(hdr.size),
        "header_monotonicity": monotonicity_report(hdr),
        "header_vs_receive": estimate_offset_drift(hdr, rcv),
        "rate_hz": float(1.0 / max(np.median(np.diff(hdr)), 1e-9))
        if hdr.size > 1 else 0.0,
    }
    off = rep["header_vs_receive"]["offset_s"]
    rep["flags"] = []
    if abs(off) > 0.5:
        rep["flags"].append(
            f"header clock {off:+.3f} s from bag clock: nearest-stamp "
            "pairing against other topics may mismatch")
    if not rep["header_monotonicity"]["monotonic"]:
        rep["flags"].append("non-monotonic header stamps")
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("topics", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--max-msgs", type=int, default=2000)
    args = ap.parse_args()

    from fl_slam_tpu.io.rosbag import RosbagReader
    reader = RosbagReader(args.bag)
    topics = list(reader.topics()) if args.all else args.topics
    if not topics:
        raise SystemExit("no topics given (use --all to scan every topic)")
    reports = [analyze_topic(reader, t, args.max_msgs) for t in topics]
    # Cross-topic: pairwise first-stamp offsets (what nearest-stamp pairing
    # will actually see).
    firsts = {r["topic"]: r for r in reports if r["n"] > 0}
    cross = {}
    names = list(firsts)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            da = (firsts[a]["header_vs_receive"]["offset_s"]
                  - firsts[b]["header_vs_receive"]["offset_s"])
            cross[f"{a} vs {b}"] = round(da, 6)
    print(json.dumps({"topics": reports,
                      "cross_topic_offset_s": cross}, indent=2))


if __name__ == "__main__":
    main()
