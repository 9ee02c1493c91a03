"""Render a ``splat_export.npz`` map to a PNG through the EWA splat renderer
(parity: reference ``tools/view_splat_jaxsplat.py`` — render the exported
primitive map from the trajectory's last pose).

Usage:
  python tools/view_splat.py runs/eval1                      # run directory
  python tools/view_splat.py runs/eval1/splat_export.npz --out map.png
      [--pose-idx -1] [--behind 2.0] [--above 1.0] [--wh 960 720]
      [--fov-deg 70] [--bev]

The camera defaults to a chase view: ``--behind`` meters behind and
``--above`` meters above the selected trajectory pose, pitched down slightly.
``--bev`` instead renders a top-down bird's-eye view of the whole map.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # Honor the env var even against pre-seeded accelerator plugins that
    # override it (this box's axon plugin): without the config update a CPU
    # render hangs trying to initialize an unreachable device.
    import jax
    jax.config.update("jax_platforms", "cpu")


def _resolve_npz(path):
    if os.path.isdir(path):
        path = os.path.join(path, "splat_export.npz")
    if not os.path.exists(path):
        raise SystemExit(f"no splat export at {path}")
    return path


def chase_camera(pose, behind, above, width, height, fov_deg):
    """Camera-to-world pose [t, rotvec] looking along +x of ``pose``."""
    import jax.numpy as jnp
    from fl_slam_tpu.core import se3
    from fl_slam_tpu.render.splat import Camera

    pose = jnp.asarray(pose)
    R_wb = se3.so3_exp(pose[3:6])
    fwd = R_wb[:, 0]
    eye = pose[:3] - behind * fwd + jnp.asarray([0.0, 0.0, above])
    target = pose[:3] + 2.0 * fwd
    # look-at: camera +z toward target, +x right, +y down (pinhole convention)
    z = target - eye
    z = z / jnp.linalg.norm(z)
    up = jnp.asarray([0.0, 0.0, 1.0])
    x = jnp.cross(z, up)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-9)
    y = jnp.cross(z, x)
    R_wc = jnp.stack([x, y, z], axis=1)
    f = 0.5 * width / np.tan(np.radians(fov_deg) / 2.0)
    return Camera(pose_wc=jnp.concatenate([eye, se3.so3_log(R_wc)]),
                  fx=f, fy=f, cx=width / 2.0, cy=height / 2.0,
                  width=width, height=height)


def bev_camera(positions, width, height):
    """Orthographic-ish top-down view over the map extent."""
    import jax.numpy as jnp
    from fl_slam_tpu.core import se3
    from fl_slam_tpu.render.splat import Camera

    lo = np.percentile(positions, 2, axis=0)
    hi = np.percentile(positions, 98, axis=0)
    c = 0.5 * (lo + hi)
    span = max(hi[0] - lo[0], hi[1] - lo[1], 4.0)
    alt = 1.2 * span  # pinhole at altitude ~ span => ~53 deg fov covers it
    eye = jnp.asarray([c[0], c[1], hi[2] + alt])
    # look straight down: camera z = -Z, x = +X world, y = +Y world
    R_wc = jnp.asarray([[1.0, 0.0, 0.0],
                        [0.0, -1.0, 0.0],
                        [0.0, 0.0, -1.0]]).T
    f = 0.5 * width / np.tan(np.radians(53.0) / 2.0)
    return Camera(pose_wc=jnp.concatenate([eye, se3.so3_log(R_wc)]),
                  fx=f, fy=f, cx=width / 2.0, cy=height / 2.0,
                  width=width, height=height)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="run directory or splat_export.npz")
    ap.add_argument("--out", default=None)
    ap.add_argument("--pose-idx", type=int, default=-1)
    ap.add_argument("--behind", type=float, default=2.0)
    ap.add_argument("--above", type=float, default=1.0)
    ap.add_argument("--wh", type=int, nargs=2, default=(960, 720))
    ap.add_argument("--fov-deg", type=float, default=70.0)
    ap.add_argument("--bev", action="store_true")
    ap.add_argument("--max-prims", type=int, default=16384)
    args = ap.parse_args()

    npz_path = _resolve_npz(args.path)
    out = args.out or os.path.join(os.path.dirname(npz_path), "map_render.png")
    d = np.load(npz_path)
    pos, Lam = d["positions"], d["Lambdas"]
    etas, rgb, w = d["etas"], d["rgb"], d["weights"]
    n = pos.shape[0]
    if n == 0:
        raise SystemExit("splat export holds no valid primitives")
    if n > args.max_prims:  # keep the render budget fixed: top by weight
        keep = np.argsort(-w)[: args.max_prims]
        pos, Lam, etas, rgb, w = (a[keep] for a in (pos, Lam, etas, rgb, w))
    if rgb.std() < 1e-3:
        # Lidar-only maps carry a uniform provenance gray; tint by height so
        # the render reads as structure instead of a flat wall.
        z = pos[:, 2]
        zn = (z - np.percentile(z, 5)) / max(
            np.percentile(z, 95) - np.percentile(z, 5), 1e-6)
        zn = np.clip(zn, 0.0, 1.0)[:, None]
        rgb = (np.array([0.20, 0.35, 0.75]) * (1 - zn)
               + np.array([0.95, 0.75, 0.25]) * zn)

    import jax.numpy as jnp
    from fl_slam_tpu.render.splat import render

    W, H = args.wh
    if args.bev or "trajectory" not in d:
        cam = bev_camera(pos, W, H)
    else:
        cam = chase_camera(d["trajectory"][args.pose_idx], args.behind,
                           args.above, W, H, args.fov_deg)
    img, depth = render(jnp.asarray(pos), jnp.asarray(Lam), jnp.asarray(etas),
                        jnp.asarray(rgb), jnp.asarray(w),
                        jnp.ones((pos.shape[0],), bool), cam)
    img = np.asarray(img)
    # Auto-exposure: vMF shading attenuates strongly off-lobe (sensor-facing
    # normals vs an external camera); normalize to the 99th percentile so the
    # geometry reads regardless of lobe alignment.
    p99 = np.percentile(img, 99)
    if 1e-6 < p99 < 0.5:
        img = img / p99 * 0.85
    img8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    try:
        from PIL import Image
        Image.fromarray(img8).save(out)
    except Exception:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imsave(out, img8)
    print(f"[view_splat] {n} prims -> {out} "
          f"({'bev' if args.bev else f'pose {args.pose_idx}'})")


if __name__ == "__main__":
    main()
