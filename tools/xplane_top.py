"""Print top self-time HLO ops from a jax.profiler xplane trace (dev tool).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/xplane_top.py [trace_dir] [n_scans]

Parses the XSpace protobuf directly (the tensorboard plugin's native parser
is incompatible with the installed TF build). Durations are per whole trace;
pass n_scans to also print per-scan cost.
"""

import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gc_trace"
    n_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    planes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("no xplane.pb under", trace_dir)
        return
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
            agg = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                md = p.event_metadata[ev.metadata_id]
                # strip the %name.1234 instance id -> group by op kind + shape
                m = re.match(r"%([a-z-]+)[.\d]* = ([^ ]+)", md.name)
                key = f"{m.group(1):18s} {m.group(2)[:80]}" if m else md.name[:100]
                agg[key] += ev.duration_ps
                cnt[key] += 1
            tot = sum(agg.values())
            print(f"== {p.name} / {line.name}: total {tot/1e9:.1f} ms "
                  f"({tot/1e9/n_scans:.3f} ms/scan)")
            print(f"{'ms/scan':>9s} {'count':>6s}  op")
            for name, ps in agg.most_common(45):
                print(f"{ps/1e9/n_scans:9.3f} {cnt[name]:6d}  {name}")


if __name__ == "__main__":
    main()
