"""Build a Rerun recording (.rrd) from a run's ``splat_export.npz`` (parity:
reference ``tools/build_rerun_from_splat.py``): map points colored by RGB
provenance, covariance ellipsoids, vMF appearance arrows, and the trajectory
replayed over time.

When the ``rerun`` SDK is not installed (it is an optional dependency, as in
the reference), the tool falls back to a static matplotlib 3-D scene PNG with
the same content so a run directory always yields a viewable map artifact.

Usage:
  python tools/build_rerun_from_export.py runs/eval1 [--out runs/eval1/map.rrd]
      [--max-ellipsoids 2000] [--max-arrows 2000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # Honor the env var even against pre-seeded accelerator plugins that
    # override it (this box's axon plugin).
    import jax
    jax.config.update("jax_platforms", "cpu")


def _resolve_npz(path):
    if os.path.isdir(path):
        path = os.path.join(path, "splat_export.npz")
    if not os.path.exists(path):
        raise SystemExit(f"no splat export at {path}")
    return path


def _ellipsoid_axes(covariances):
    """Per-primitive principal half-axes (n, 3) + rotations (n, 3, 3)
    at 1 sigma, via symmetric eigendecomposition."""
    vals, vecs = np.linalg.eigh(covariances)
    return np.sqrt(np.maximum(vals, 1e-12)), vecs


def _vmf_arrows(etas, max_arrows):
    """Primary-lobe vMF arrows: direction = eta/|eta|, length ~ log kappa."""
    eta0 = etas[:, 0:3] if etas.ndim == 2 else etas[:, 0, :]
    kap = np.linalg.norm(eta0, axis=-1)
    keep = np.argsort(-kap)[:max_arrows]
    kap_k = np.maximum(kap[keep], 1e-9)
    dirs = eta0[keep] / kap_k[:, None]
    length = 0.05 + 0.05 * np.log1p(kap_k)
    return keep, dirs * length[:, None]


def build_rrd(d, out, max_ellipsoids, max_arrows):
    import rerun as rr  # type: ignore
    rr.init("fl_slam_tpu_map")
    rr.save(out)
    pos, w = d["positions"], d["weights"]
    rgb8 = np.clip(d["rgb"] * 255.0, 0, 255).astype(np.uint8)
    rr.log("map/points", rr.Points3D(pos, colors=rgb8,
                                     radii=0.02 + 0.0 * w), static=True)
    # Covariance ellipsoids for the heaviest primitives.
    keep = np.argsort(-w)[:max_ellipsoids]
    half, vecs = _ellipsoid_axes(d["covariances"][keep])
    quats = _rot_to_quat_xyzw(vecs)
    rr.log("map/ellipsoids", rr.Ellipsoids3D(
        centers=pos[keep], half_sizes=half,
        quaternions=quats, colors=rgb8[keep]), static=True)
    # vMF appearance arrows.
    akeep, vec = _vmf_arrows(d["etas"], max_arrows)
    rr.log("map/vmf", rr.Arrows3D(origins=pos[akeep], vectors=vec,
                                  colors=rgb8[akeep]), static=True)
    # Trajectory over time.
    if "trajectory" in d:
        traj = d["trajectory"]
        stamps = d.get("stamps", np.arange(len(traj), dtype=np.float64))
        for i, (p, t) in enumerate(zip(traj, stamps)):
            rr.set_time_seconds("t", float(t))
            rr.log("trajectory/pose", rr.Points3D([p[:3]]))
            rr.log("trajectory/path",
                   rr.LineStrips3D([traj[: i + 1, :3]]))
    print(f"[rerun] wrote {out}")


def _rot_to_quat_xyzw(R):
    """(n, 3, 3) rotations -> (n, 4) xyzw quaternions (ellipsoid orientation;
    sign-fixed determinant first)."""
    det = np.linalg.det(R)
    R = R * np.sign(det)[:, None, None]
    t = np.trace(R, axis1=1, axis2=2)
    q = np.zeros((R.shape[0], 4))
    s = np.sqrt(np.maximum(t + 1.0, 1e-12)) * 2.0
    q[:, 3] = 0.25 * s
    q[:, 0] = (R[:, 2, 1] - R[:, 1, 2]) / s
    q[:, 1] = (R[:, 0, 2] - R[:, 2, 0]) / s
    q[:, 2] = (R[:, 1, 0] - R[:, 0, 1]) / s
    n = np.linalg.norm(q, axis=1, keepdims=True)
    return q / np.maximum(n, 1e-12)


def build_mpl(d, out, max_ellipsoids, max_arrows):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    pos, w = d["positions"], d["weights"]
    rgb = np.clip(d["rgb"], 0.0, 1.0)
    fig = plt.figure(figsize=(11, 9))
    ax = fig.add_subplot(111, projection="3d")
    n = min(len(pos), 20000)
    keep = np.argsort(-w)[:n]
    ax.scatter(pos[keep, 0], pos[keep, 1], pos[keep, 2], c=rgb[keep], s=2.0,
               depthshade=False)
    akeep, vec = _vmf_arrows(d["etas"], min(max_arrows, 500))
    ax.quiver(pos[akeep, 0], pos[akeep, 1], pos[akeep, 2],
              vec[:, 0], vec[:, 1], vec[:, 2], color="tab:orange",
              linewidth=0.5)
    if "trajectory" in d:
        t = d["trajectory"]
        ax.plot(t[:, 0], t[:, 1], t[:, 2], "b-", linewidth=2.0,
                label="trajectory")
        ax.legend()
    ax.set_title(f"map: {len(pos)} primitives")
    try:  # equal aspect where supported
        ax.set_box_aspect((1, 1, 0.4))
    except Exception:
        pass
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    print(f"[rerun-fallback] rerun SDK not installed; wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="run directory or splat_export.npz")
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-ellipsoids", type=int, default=2000)
    ap.add_argument("--max-arrows", type=int, default=2000)
    args = ap.parse_args()
    npz_path = _resolve_npz(args.path)
    d = dict(np.load(npz_path))
    try:
        import rerun  # noqa: F401
        out = args.out or os.path.join(os.path.dirname(npz_path), "map.rrd")
        build_rrd(d, out, args.max_ellipsoids, args.max_arrows)
    except ImportError:
        out = args.out or os.path.join(os.path.dirname(npz_path),
                                       "map_scene.png")
        build_mpl(d, out, args.max_ellipsoids, args.max_arrows)


if __name__ == "__main__":
    main()
