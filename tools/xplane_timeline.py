"""Print the time-ordered op timeline of one replay scan from an xplane trace.

Usage: python tools/xplane_timeline.py [trace_dir] [--min-us 30]

Shows which ops sit on the serial critical path (big time-order gaps between
consecutive ops = dependency stalls; overlapped ops share wall intervals).
"""

import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gc_trace"
    min_us = 30.0
    for i, a in enumerate(sys.argv):
        if a == "--min-us":
            min_us = float(sys.argv[i + 1])
    planes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(planes[-1], "rb") as fh:
        xs.ParseFromString(fh.read())

    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            evs = []
            for ev in line.events:
                md = p.event_metadata[ev.metadata_id]
                t0 = (line.timestamp_ns * 1000 + ev.offset_ps) / 1e6  # us
                evs.append((t0, ev.duration_ps / 1e6, md.name))
            evs.sort()
            if not evs:
                continue
            # find a steady-state window: take the middle 5% of the trace span
            t_lo = evs[0][0] + (evs[-1][0] - evs[0][0]) * 0.50
            t_hi = evs[0][0] + (evs[-1][0] - evs[0][0]) * 0.56
            sel = [e for e in evs if t_lo <= e[0] <= t_hi and e[1] >= min_us]
            print(f"== {p.name} window {t_hi - t_lo:.0f} us, "
                  f"{len(sel)} ops >= {min_us} us")
            prev_end = None
            for t0, dur, name in sel:
                gap = "" if prev_end is None else f"{t0 - prev_end:+9.1f}"
                prev_end = max(prev_end or 0.0, t0 + dur)
                print(f"t={t0:12.1f} d={dur:8.1f}us gap={gap:>9s}  {name[:95]}")


if __name__ == "__main__":
    main()
