"""Aggregate one steady-state replay scan's device time by SOURCE line.

Every HLO op's xplane metadata carries the Python ``source`` (file:line) that
produced it; summing self-times over one scan window by source attributes the
tiny-op tail directly to repo code — much faster to act on than op names.

Scan windows are anchored on a once-per-scan op (auto-detected: the op name
whose occurrence count is closest to the expected scan count and spread
evenly); the report averages the middle windows to dodge warmup/teardown.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python tools/xplane_by_source.py [trace_dir] [--top N] [--by-op]

Parity: the reference attributes per-stage wall time via MinimalScanTape
timings (fl_slam_poc/backend/pipeline.py:383-394); this is the equivalent
forensic view for the single fused TPU program.
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load_events(trace_dir):
    planes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(planes[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        stat_names = {i: m.name for i, m in p.stat_metadata.items()}
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            evs = []
            for ev in line.events:
                md = p.event_metadata[ev.metadata_id]
                src = ""
                for st in list(ev.stats) + list(md.stats):
                    nm = stat_names.get(st.metadata_id, "")
                    if nm in ("source", "source_info", "tf_op"):
                        v = (st.str_value
                             or stat_names.get(st.ref_value, ""))
                        if v:
                            src = v
                            break
                t0 = (line.timestamp_ns * 1000 + ev.offset_ps) / 1e6  # us
                evs.append((t0, ev.duration_ps / 1e6, md.name, src))
            evs.sort()
            if evs:
                return evs
    raise SystemExit("no TPU 'XLA Ops' line in trace")


def detect_anchor(evs):
    """Pick the op name that best tiles the trace into equal windows."""
    by_name = collections.defaultdict(list)
    for t0, dur, name, _ in evs:
        by_name[name].append(t0)
    span = evs[-1][0] - evs[0][0]
    best, best_score = None, float("inf")
    for name, ts in by_name.items():
        n = len(ts)
        if n < 4 or n > 4096:
            continue
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        mean = sum(gaps) / len(gaps)
        if mean <= 0 or n * mean < span * 0.5:
            continue  # must cover most of the trace
        var = sum((g - mean) ** 2 for g in gaps) / len(gaps)
        cv = (var ** 0.5) / mean
        if cv < best_score:
            best, best_score = name, cv
    return best


def leaf_events(evs):
    """Drop ENCLOSING events (loops/calls that span other ops): keeping them
    double-counts — observed as "busy" > window wall. An event is a leaf
    iff no other event starts strictly inside its span."""
    starts = sorted(t0 for t0, _, _, _ in evs)
    import bisect
    leaves = []
    for t0, dur, name, src in evs:
        i = bisect.bisect_right(starts, t0)
        if i < len(starts) and starts[i] < t0 + dur * 0.999:
            continue
        leaves.append((t0, dur, name, src))
    return leaves if len(leaves) >= len(evs) // 4 else evs


def busy_summary(trace_dir, top=3, by_op=False):
    """Leaf-only device-busy attribution over the middle scan windows.

    Returns {busy_us_per_scan, wall_us_per_scan, busy_frac, anchor,
    windows, top: [(source, us_per_scan), ...]} — the utilization context
    BENCH records carry (round-3 verdict item 7)."""
    evs = leaf_events(load_events(trace_dir))
    anchor = detect_anchor(evs)
    if anchor is None:
        raise RuntimeError("no periodic anchor op found")
    ts = [t0 for t0, _, name, _ in evs if name == anchor]
    n_win = len(ts) - 1
    lo = max(1, n_win // 3)
    hi = max(lo + 1, 2 * n_win // 3)
    windows = [(ts[i], ts[i + 1]) for i in range(lo, hi)]

    agg = collections.Counter()
    cnt = collections.Counter()
    busy = 0.0
    for w0, w1 in windows:
        for t0, dur, name, src in evs:
            if w0 <= t0 < w1:
                key = name.split(".")[0] if by_op else (src or "<no-source>")
                agg[key] += dur
                cnt[key] += 1
                busy += dur
    nw = len(windows)
    wall = sum(w1 - w0 for w0, w1 in windows) / nw
    return {
        "anchor": anchor,
        "windows": nw,
        "n_windows_total": n_win,
        "busy_us_per_scan": busy / nw,
        "wall_us_per_scan": wall,
        "busy_frac": (busy / nw) / wall if wall > 0 else 0.0,
        "top": [(k, round(v / nw, 1), round(cnt[k] / nw, 1))
                for k, v in agg.most_common(top)],
    }


def busy_totals(trace_dir, n_scans, top=3, by_op=False):
    """Whole-trace leaf-busy attribution normalized by the KNOWN scan count.

    The bench traces exactly ONE replay of ``n_scans`` scans, so dividing
    trace totals by ``n_scans`` is arithmetically exact — unlike
    ``busy_summary``'s anchor-window heuristic, which can lock onto an op
    that fires once per k scans and inflate every per-scan number by k
    (the round-4 BENCH carried 6,170 us busy/scan beside a measured 893
    us/scan headline for exactly this reason)."""
    evs = leaf_events(load_events(trace_dir))
    agg = collections.Counter()
    busy = 0.0
    for t0, dur, name, src in evs:
        key = name.split(".")[0] if by_op else (src or "<no-source>")
        agg[key] += dur
        busy += dur
    wall = (evs[-1][0] + evs[-1][1]) - evs[0][0]
    return {
        "n_scans": n_scans,
        "busy_us_per_scan": busy / n_scans,
        "wall_us_per_scan": wall / n_scans,
        "busy_frac": busy / wall if wall > 0 else 0.0,
        "top": [(k, round(v / n_scans, 1), 0.0)
                for k, v in agg.most_common(top)],
    }


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gc_trace"
    top = 40
    by_op = "--by-op" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--top":
            top = int(sys.argv[i + 1])
    s = busy_summary(trace_dir, top=top, by_op=by_op)
    print(f"anchor={s['anchor']}  windows={s['windows']} "
          f"(of {s['n_windows_total']})")
    print(f"device busy per scan: {s['busy_us_per_scan']:.1f} us "
          f"(window wall {s['wall_us_per_scan']:.1f} us, "
          f"busy_frac {s['busy_frac']:.2f})")
    print(f"{'us/scan':>9}  {'ops':>6}  source")
    for key, us, n in s["top"]:
        print(f"{us:9.1f}  {n:6.1f}  {key[:100]}")


if __name__ == "__main__":
    main()
