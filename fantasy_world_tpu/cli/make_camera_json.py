"""Generate a camera_data.json trajectory for the inference CLIs.

The reference ships one hand-made example trajectory
(examples/cameras/camera_data.json: 2 keyframe c2w mats + 81 interpolated,
focal_length 500) and otherwise leaves users to produce the JSON themselves
from RE10K-style data. This utility generates the same schema from either

  * a named motion preset (dolly/truck/pedestal/pan/tilt/orbit), or
  * two keyframe c2w matrices, geodesically interpolated (slerp on the
    rotation via quaternions, lerp on the camera center) -- the same
    construction the reference's example file encodes.

Output schema (consumed by hostops/camera.py:cameras_json_to_camera_list,
matching the reference's utils.py:953 ``data["cameras_interp"]``):

    {"focal_length": F, "scale": 1,
     "cameras": [first c2w, last c2w], "cameras_interp": [n c2w 4x4]}

Conventions: OpenCV camera (x right, y down, z forward); c2w maps camera
coords to world; frame 0 is the identity pose (the pipeline re-centers on
the first frame anyway -- hostops/camera.py:get_relative_pose). Distances
are in scene units; with --using_scale the pipeline normalizes scene scale
from MoGe geometry, so presets default to modest sub-unit moves.
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from ..hostops.rotation import mat_to_quat, quat_to_mat


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def _c2w(R=None, t=None):
    m = np.eye(4)
    if R is not None:
        m[:3, :3] = R
    if t is not None:
        m[:3, 3] = t
    return m


def preset_trajectory(motion: str, n: int, distance: float,
                      angle_deg: float) -> np.ndarray:
    """(n, 4, 4) c2w path starting at the identity pose."""
    ts = np.linspace(0.0, 1.0, n)
    ang = np.deg2rad(angle_deg)
    out = []
    for t in ts:
        d = distance * t
        a = ang * t
        if motion == "static":
            m = _c2w()
        elif motion == "dolly_in":
            m = _c2w(t=[0, 0, d])
        elif motion == "dolly_out":
            m = _c2w(t=[0, 0, -d])
        elif motion == "truck_left":
            m = _c2w(t=[-d, 0, 0])
        elif motion == "truck_right":
            m = _c2w(t=[d, 0, 0])
        elif motion == "pedestal_up":
            m = _c2w(t=[0, -d, 0])          # y points down
        elif motion == "pedestal_down":
            m = _c2w(t=[0, d, 0])
        elif motion == "pan_left":
            m = _c2w(R=_rot_y(-a))
        elif motion == "pan_right":
            m = _c2w(R=_rot_y(a))
        elif motion == "tilt_up":
            m = _c2w(R=_rot_x(-a))
        elif motion == "tilt_down":
            m = _c2w(R=_rot_x(a))
        elif motion in ("orbit_left", "orbit_right"):
            # rotate the camera center around a pivot `distance` ahead of
            # the start pose, keeping the pivot centered in view
            sgn = -1.0 if motion == "orbit_left" else 1.0
            pivot = np.array([0, 0, distance])
            R = _rot_y(sgn * a)
            center = pivot - R @ pivot
            m = _c2w(R=R, t=center)
        else:
            raise ValueError(f"unknown motion preset {motion!r}")
        out.append(m)
    return np.stack(out)


def interpolate_keyframes(c2w_a: np.ndarray, c2w_b: np.ndarray,
                          n: int) -> np.ndarray:
    """Geodesic interpolation between two c2w poses: quaternion slerp on
    rotation, linear on camera center. Returns (n, 4, 4) incl. endpoints."""
    qa = mat_to_quat(np.asarray(c2w_a[:3, :3], np.float64)[None])[0]
    qb = mat_to_quat(np.asarray(c2w_b[:3, :3], np.float64)[None])[0]
    if float(np.dot(qa, qb)) < 0.0:          # shorter arc
        qb = -qb
    dot = float(np.clip(np.dot(qa, qb), -1.0, 1.0))
    theta = np.arccos(dot)
    ta, tb = np.asarray(c2w_a[:3, 3]), np.asarray(c2w_b[:3, 3])
    out = []
    for t in np.linspace(0.0, 1.0, n):
        if theta < 1e-8:
            q = (1 - t) * qa + t * qb
        else:
            q = (np.sin((1 - t) * theta) * qa + np.sin(t * theta) * qb) \
                / np.sin(theta)
        q = q / np.linalg.norm(q)
        out.append(_c2w(R=quat_to_mat(q[None])[0], t=(1 - t) * ta + t * tb))
    return np.stack(out)


def build_camera_json(c2w: np.ndarray, focal_length: float) -> dict:
    return {
        "focal_length": float(focal_length),
        "scale": 1,
        "cameras": [c2w[0].tolist(), c2w[-1].tolist()],
        "cameras_interp": [m.tolist() for m in c2w],
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="generate camera_data.json for inference_wan21/22")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--motion", type=str, default="dolly_in",
                   choices=["static", "dolly_in", "dolly_out", "truck_left",
                            "truck_right", "pedestal_up", "pedestal_down",
                            "pan_left", "pan_right", "tilt_up", "tilt_down",
                            "orbit_left", "orbit_right"])
    p.add_argument("--frames", type=int, default=81)
    p.add_argument("--focal_length", type=float, default=500.0)
    p.add_argument("--distance", type=float, default=0.5,
                   help="total translation (scene units) / orbit radius")
    p.add_argument("--angle", type=float, default=20.0,
                   help="total rotation in degrees (pan/tilt/orbit)")
    p.add_argument("--keyframes", type=str, default=None,
                   help="path to a camera_data.json whose 'cameras' "
                        "keyframe pair is re-interpolated to --frames "
                        "(ignores --motion)")
    args = p.parse_args(argv)

    if args.keyframes:
        with open(args.keyframes) as f:
            kf = json.load(f)
        cams = [np.asarray(c, np.float64) for c in kf["cameras"]]
        c2w = interpolate_keyframes(cams[0], cams[-1], args.frames)
        focal = kf.get("focal_length", args.focal_length)
    else:
        c2w = preset_trajectory(args.motion, args.frames, args.distance,
                                args.angle)
        focal = args.focal_length
    with open(args.out, "w") as f:
        json.dump(build_camera_json(c2w, focal), f)
    print(f"wrote {args.out}: {args.frames} poses "
          f"({'keyframes' if args.keyframes else args.motion})")


if __name__ == "__main__":
    main()
