"""Convert ground-truth trajectory files to the TUM format that
``tools/run_eval.py --gt`` consumes (``timestamp x y z qx qy qz qw``).

Input formats auto-detected:
  - Kimera-Multi GT CSV: ``#timestamp_kf,x,y,z,qw,qx,qy,qz`` (ns stamps)
  - generic CSV with a header naming some of
    ``timestamp/stamp/t, x, y, z, qx, qy, qz, qw`` in any order
  - TUM already (pass-through with stamp-unit normalization)

Stamps > 1e14 are treated as nanoseconds and divided by 1e9.

Parity: reference ``tools/kimera_gt_to_tum.py``.

Usage: python tools/convert_gt.py input.csv output.tum
"""

import sys

import numpy as np


def load_rows(path):
    rows = []
    header = None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            sep = "," if "," in line else None
            parts = [p.strip() for p in line.split(sep)]
            if line.startswith("#") or any(
                    c.isalpha() for c in "".join(parts[:1])):
                # drop a standalone "#" token so header indices line up with
                # data columns
                cand = [p.lstrip("#").lower() for p in parts]
                cand = [p for p in cand if p]
                if any(k in cand for k in ("x", "y", "z")):
                    header = cand
                continue
            try:
                rows.append([float(p) for p in parts])
            except ValueError:
                continue
    return header, np.asarray(rows, dtype=np.float64)


def main():
    if len(sys.argv) != 3:
        print("usage: convert_gt.py <input csv/tum> <output.tum>")
        return 1
    header, rows = load_rows(sys.argv[1])
    if rows.size == 0:
        print("no data rows", file=sys.stderr)
        return 1

    if header is not None:
        def col(*names):
            for n in names:
                if n in header:
                    return header.index(n)
            return None
        it = col("timestamp", "timestamp_kf", "stamp", "t", "time")
        ix, iy, iz = col("x"), col("y"), col("z")
        iqx, iqy, iqz, iqw = col("qx"), col("qy"), col("qz"), col("qw")
        if None in (it, ix, iy, iz, iqx, iqy, iqz, iqw):
            print(f"header {header} missing required columns", file=sys.stderr)
            return 1
        t = rows[:, it]
        xyz = rows[:, [ix, iy, iz]]
        quat = rows[:, [iqx, iqy, iqz, iqw]]
    elif rows.shape[1] == 8:
        # Headerless: TUM order (t x y z qx qy qz qw) vs Kimera
        # (t x y z qw qx qy qz). The two differ only by which column holds
        # qw; for real trajectories |qw| stays near 1 far more often than
        # any vector component (rotations rarely sit near 180 deg for the
        # whole run), so the column with the larger mean |value| is qw.
        t = rows[:, 0]
        w_last = np.abs(rows[:, 7]).mean()
        w_first = np.abs(rows[:, 4]).mean()
        quat = rows[:, 4:8] if w_last >= w_first else rows[:, [5, 6, 7, 4]]
        xyz = rows[:, 1:4]
    else:
        print(f"unrecognized shape {rows.shape}", file=sys.stderr)
        return 1

    if np.median(t) > 1e14:   # nanoseconds
        t = t * 1e-9
    n = np.linalg.norm(quat, axis=1)
    keep = (n > 0.5) & (n < 2.0) & np.isfinite(rows).all(axis=1)[: len(n)]
    t, xyz, quat = t[keep], xyz[keep], quat[keep] / n[keep, None]
    order = np.argsort(t)
    t, xyz, quat = t[order], xyz[order], quat[order]

    with open(sys.argv[2], "w") as fh:
        fh.write("# timestamp x y z qx qy qz qw\n")
        for i in range(len(t)):
            fh.write(f"{t[i]:.9f} {xyz[i,0]:.6f} {xyz[i,1]:.6f} "
                     f"{xyz[i,2]:.6f} {quat[i,0]:.6f} {quat[i,1]:.6f} "
                     f"{quat[i,2]:.6f} {quat[i,3]:.6f}\n")
    print(f"wrote {len(t)} poses to {sys.argv[2]} "
          f"(span {t[-1]-t[0]:.1f} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
