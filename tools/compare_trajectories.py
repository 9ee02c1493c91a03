"""Compare an estimated trajectory against ground truth, with axis-convention
forensics: try every axis permutation x sign hypothesis on the estimate and
report which one aligns best — a large gap between the identity hypothesis
and the best one is the classic frame-swap symptom (x/y swapped, z flipped,
ENU vs NED...).

Parity: reference ``tools/evaluate_trajectory_2d.py`` +
``generate_trajectory_comparison_swaps.py`` + ``diagnose_trajectory_axes.py``
(merged: one report instead of three scripts writing plot sets).

Usage:
  python tools/compare_trajectories.py est.tum gt.tum [--out cmp.png]
      [--align initial|umeyama] [--top 5]
"""

import argparse
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_tum(path):
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) >= 8:
                rows.append([float(p) for p in parts[:8]])
    if not rows:
        raise SystemExit(f"no poses in {path}")
    a = np.asarray(rows)
    return a[:, 0], a[:, 1:4], a[:, 4:8]  # t, xyz, quat xyzw


def pair_by_stamp(t_est, t_gt, max_dt=0.05):
    j = np.argmin(np.abs(t_gt[None, :] - t_est[:, None]), axis=1)
    ok = np.abs(t_gt[j] - t_est) <= max_dt
    return j, ok


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("est")
    ap.add_argument("gt")
    ap.add_argument("--out", default=None, help="comparison PNG")
    ap.add_argument("--align", default="umeyama",
                    choices=("initial", "umeyama"))
    ap.add_argument("--top", type=int, default=5)
    ap.add_argument("--max-dt", type=float, default=0.05)
    args = ap.parse_args()

    from fl_slam_tpu.eval.metrics import align_umeyama
    t_e, p_e, q_e = load_tum(args.est)
    t_g, p_g, q_g = load_tum(args.gt)
    # common time base: allow a constant offset (median of nearest deltas)
    off = np.median(t_g[np.argmin(
        np.abs(t_g[None, :] - t_e[:, None]), axis=1)] - t_e)
    j, ok = pair_by_stamp(t_e + off, t_g, args.max_dt)
    if ok.sum() < 10:
        print(f"only {ok.sum()} pairs within {args.max_dt}s "
              f"(est offset {off:.3f}s) — check time bases", file=sys.stderr)
        return 1
    pe, pg = p_e[ok], p_g[j[ok]]
    print(f"{ok.sum()} paired poses (time offset {off:+.3f} s applied)")

    def rmse_after_align(pts):
        # rigid (R, t) fit est->gt (scale-free Umeyama via metrics helper on
        # position-only pseudo-poses)
        mu_a, mu_b = pts.mean(0), pg.mean(0)
        A, B = pts - mu_a, pg - mu_b
        U, S, Vt = np.linalg.svd(A.T @ B)
        D = np.eye(3)
        D[2, 2] = np.sign(np.linalg.det(U @ Vt))
        R = (U @ D @ Vt).T
        res = (pts - mu_a) @ R.T + mu_b - pg
        return float(np.sqrt((res ** 2).sum(1).mean()))

    results = []
    for perm in itertools.permutations(range(3)):
        for signs in itertools.product((1, -1), repeat=3):
            M = np.zeros((3, 3))
            for i, (p, s) in enumerate(zip(perm, signs)):
                M[i, p] = s
            name = " ".join(f"{'+-'[s < 0]}{'xyz'[p]}"
                            for p, s in zip(perm, signs))
            results.append((rmse_after_align(pe @ M.T), name,
                            np.allclose(M, np.eye(3))))
    results.sort()
    ident = next(r for r in results if r[2])
    print(f"\nidentity axes : {ident[0]:.4f} m RMSE (best rigid alignment)")
    print(f"best hypothesis axes, top {args.top}:")
    for r in results[:args.top]:
        tag = "  <-- identity" if r[2] else ""
        print(f"  {r[1]:12s} {r[0]:.4f} m{tag}")
    # Proper-rotation permutations are rigid-equivalent to identity and tie
    # its RMSE after alignment; only a STRICTLY better hypothesis indicates
    # a convention problem.
    if ident[0] <= results[0][0] * 1.05 + 1e-6:
        print("axes are consistent: the identity mapping is already best")
    elif ident[0] > 2.0 * results[0][0] + 0.05:
        print(f"!! '{results[0][1]}' fits {ident[0]/max(results[0][0],1e-9):.1f}x"
              " better than identity — axis convention mismatch likely")

    # standard metrics at identity
    from fl_slam_tpu.eval.metrics import ate
    def to_pose6(p, q):
        from fl_slam_tpu.io.rosbag import quat_xyzw_to_rotvec
        return np.concatenate(
            [p, np.stack([quat_xyzw_to_rotvec(x) for x in q])], axis=1)
    m = ate(to_pose6(pe, q_e[ok]), to_pose6(pg, q_g[j[ok]]),
            align=args.align)
    print(f"\nATE ({args.align}): trans RMSE {m['trans']['rmse']:.4f} m "
          f"(p95 {m['trans']['p95']:.4f}) | rot RMSE "
          f"{m['rot_deg']['rmse']:.3f} deg")

    if args.out:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axs = plt.subplots(1, 2, figsize=(12, 6))
        axs[0].plot(pg[:, 0], pg[:, 1], "k-", lw=2, label="gt")
        axs[0].plot(pe[:, 0], pe[:, 1], "C0-", lw=1.2, label="est")
        axs[0].set_aspect("equal")
        axs[0].legend()
        axs[0].set_title("XY (as loaded)")
        err = np.linalg.norm(pe - pg, axis=1)
        axs[1].plot(t_e[ok] - t_e[ok][0], err)
        axs[1].set_xlabel("t (s)")
        axs[1].set_ylabel("|err| m (unaligned)")
        fig.savefig(args.out, dpi=120, bbox_inches="tight")
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
