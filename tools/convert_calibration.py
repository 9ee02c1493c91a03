"""Convert a Kimera-Multi calibration ``extrinsics.yaml`` (+ optional camera
intrinsics) into the rig calibration JSON that ``tools/run_eval.py
--calibration`` consumes (``io/rosbag.load_calibration`` schema).

Dataset convention (Kimera calibration README): ``T_a_b`` maps frame-b
coordinates into frame a (p_a = T_a_b @ p_b), so the dataset's
``T_baselink_lidar`` IS our ``T_base_lidar`` and ``T_cameralink_cam`` chains
through ``T_baselink_cameralink`` (identity on the Kimera jackal rigs) to our
``T_base_cam``.

Parity: reference ``tools/kimera_calibration_to_gc.py`` (same source YAML,
GC 6-vector output there, 4x4 JSON here because our loader takes matrices).

Usage:
  python tools/convert_calibration.py extrinsics.yaml -o rig.json \
      [--intrinsics camera.yaml | --fx F --fy F --cx C --cy C --wh W H] \
      [--imu-rotvec RX RY RZ]   # override IMU rotation (bag-estimated)
"""

import argparse
import json
import sys

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fl_slam_tpu.io.rosbag import rotvec_to_matrix


def _find_transform(doc: dict, names):
    by_name = {t.get("name"): t for t in doc.get("transforms", [])}
    for n in names:
        if n in by_name:
            T = np.asarray(by_name[n]["T"], dtype=np.float64)
            if T.shape != (4, 4):
                raise ValueError(f"{n}: expected 4x4, got {T.shape}")
            return T, n
    return None, None


def _load_intrinsics_yaml(path):
    import yaml
    with open(path) as fh:
        doc = yaml.safe_load(fh)
    # Kimera/kalibr styles: either flat {fx, fy, cx, cy} or
    # camera_matrix: {data: [fx 0 cx 0 fy cy 0 0 1]} (ROS camera_info yaml),
    # or kalibr cam0: {intrinsics: [fx fy cx cy], resolution: [w h]}.
    if "camera_matrix" in doc:
        k = np.asarray(doc["camera_matrix"]["data"], np.float64).reshape(3, 3)
        return dict(fx=k[0, 0], fy=k[1, 1], cx=k[0, 2], cy=k[1, 2],
                    width=int(doc.get("image_width", 0)),
                    height=int(doc.get("image_height", 0)))
    if "cam0" in doc:
        c = doc["cam0"]
        fx, fy, cx, cy = c["intrinsics"]
        w, h = c.get("resolution", [0, 0])
        return dict(fx=fx, fy=fy, cx=cx, cy=cy, width=int(w), height=int(h))
    keys = ("fx", "fy", "cx", "cy")
    if all(k in doc for k in keys):
        return dict(fx=doc["fx"], fy=doc["fy"], cx=doc["cx"], cy=doc["cy"],
                    width=int(doc.get("width", 0)),
                    height=int(doc.get("height", 0)))
    raise ValueError(f"unrecognized intrinsics yaml schema in {path}")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("extrinsics_yaml")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--intrinsics", help="camera intrinsics yaml (ROS "
                    "camera_info / kalibr / flat fx-fy-cx-cy)")
    ap.add_argument("--fx", type=float)
    ap.add_argument("--fy", type=float)
    ap.add_argument("--cx", type=float)
    ap.add_argument("--cy", type=float)
    ap.add_argument("--wh", type=int, nargs=2, metavar=("W", "H"))
    ap.add_argument("--imu-rotvec", type=float, nargs=3, metavar="R",
                    help="replace the IMU extrinsic ROTATION with this "
                    "rotvec (rad) — e.g. the bag-estimated mount rotation "
                    "from tools/diagnose_frames.py; translation keeps the "
                    "dataset value")
    args = ap.parse_args()

    import yaml
    with open(args.extrinsics_yaml) as fh:
        doc = yaml.safe_load(fh)

    out = {}
    T_bl, name = _find_transform(
        doc, ["T_baselink_lidar", "T_base_lidar", "T_baselink_velodyne"])
    if T_bl is not None:
        out["T_base_lidar"] = T_bl.tolist()
        print(f"T_base_lidar <- {name}")

    T_bc, name = _find_transform(
        doc, ["T_baselink_cam", "T_base_cam", "T_cameralink_cam",
              "T_baselink_camera"])
    if T_bc is not None:
        out["T_base_cam"] = T_bc.tolist()
        print(f"T_base_cam <- {name}")

    T_bi, name = _find_transform(
        doc, ["T_baselink_imu", "T_base_imu", "T_cameralink_gyro"])
    if T_bi is not None:
        if args.imu_rotvec is not None:
            T_bi = T_bi.copy()
            T_bi[:3, :3] = rotvec_to_matrix(args.imu_rotvec)
            print(f"T_base_imu rotation overridden by --imu-rotvec")
        out["T_base_imu"] = T_bi.tolist()
        print(f"T_base_imu <- {name}")

    if args.intrinsics:
        out["intrinsics"] = _load_intrinsics_yaml(args.intrinsics)
    elif args.fx is not None:
        if None in (args.fy, args.cx, args.cy):
            ap.error("--fx requires --fy, --cx and --cy")
        out["intrinsics"] = dict(fx=args.fx, fy=args.fy, cx=args.cx,
                                 cy=args.cy,
                                 width=args.wh[0] if args.wh else 0,
                                 height=args.wh[1] if args.wh else 0)
    if "intrinsics" in out:
        print(f"intrinsics: {out['intrinsics']}")

    if not out:
        print("no recognized transforms found; transform names present:",
              [t.get("name") for t in doc.get("transforms", [])],
              file=sys.stderr)
        return 1

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
