"""Camera ingestion and Plucker ray embedding (host, numpy).

Mirrors the reference host path: camera JSON -> Camera list
(utils.py:896-962), pose-encoding round trip -> relative poses
(dataset_re10k.py:161-178 with zero_t_first_frame) -> Plucker rays
(ray_condition, dataset_re10k.py:77-119).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .geometry import pose_encoding_to_extri_intri


@dataclasses.dataclass
class Camera:
    fx: float
    fy: float
    cx: float
    cy: float
    w2c_mat: np.ndarray      # (4, 4)

    @property
    def c2w_mat(self) -> np.ndarray:
        return np.linalg.inv(self.w2c_mat)

    @classmethod
    def from_entry(cls, entry: Sequence[float]) -> "Camera":
        fx, fy, cx, cy = entry[1:5]
        w2c = np.eye(4)
        w2c[:3, :] = np.asarray(entry[7:], np.float64).reshape(3, 4)
        return cls(fx, fy, cx, cy, w2c)


def cameras_json_to_camera_list(data: dict,
                                image_size: Optional[Tuple[int, int]] = None,
                                K: Optional[np.ndarray] = None) -> List[Camera]:
    """{focal_length, cameras_interp: [16-float c2w...]} -> Camera list."""
    if K is not None:
        fx, fy = float(K[0, 0]), float(K[1, 1])
        cx, cy = float(K[0, 2]), float(K[1, 2])
    else:
        fx = fy = float(data.get("focal_length", 500))
        H, W = image_size
        cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    cams = []
    for idx, c2w in enumerate(data["cameras_interp"]):
        c2w = np.asarray(c2w, np.float64).reshape(4, 4)
        w2c = np.linalg.inv(c2w)
        entry = [idx, fx, fy, cx, cy, 0.0, 0.0] + w2c[:3, :].flatten().tolist()
        cams.append(Camera.from_entry(entry))
    return cams


def cameras_from_extri_intri(extrinsics: np.ndarray, intrinsics: np.ndarray
                             ) -> List[Camera]:
    """(S, 3, 4) + (S, 3, 3) -> Camera list (create_camera_params_from_batch,
    dataset_re10k.py:57-67)."""
    cams = []
    for ext, K in zip(extrinsics, intrinsics):
        w2c = np.eye(4)
        w2c[:3, :] = ext
        cams.append(Camera(float(K[0, 0]), float(K[1, 1]),
                           float(K[0, 2]), float(K[1, 2]), w2c))
    return cams


def get_relative_pose(cams: List[Camera], zero_t_first_frame: bool = True
                      ) -> np.ndarray:
    """First-frame-centric c2w poses (dataset_re10k.py:161-178)."""
    abs_w2cs = [c.w2c_mat for c in cams]
    abs_c2ws = [c.c2w_mat for c in cams]
    cam_to_origin = 0.0 if zero_t_first_frame else float(
        np.linalg.norm(abs_c2ws[0][:3, 3]))
    target = np.array([[1, 0, 0, 0], [0, 1, 0, -cam_to_origin],
                       [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
    abs2rel = target @ abs_w2cs[0]
    poses = [target] + [abs2rel @ c2w for c2w in abs_c2ws[1:]]
    return np.asarray(poses, np.float32)


def ray_condition(K: np.ndarray, c2w: np.ndarray, H: int, W: int) -> np.ndarray:
    """K: (V, 4) [fx fy cx cy] in pixels; c2w: (V, 4, 4). Returns Plucker
    embedding (V, H, W, 6) = [o x d, d] per pixel (half-pixel centers)."""
    V = K.shape[0]
    j, i = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    i = i.reshape(1, H * W) + 0.5
    j = j.reshape(1, H * W) + 0.5
    fx, fy, cx, cy = (K[:, k:k + 1] for k in range(4))
    zs = np.ones_like(i) * np.ones((V, 1), np.float32)
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    dirs = np.stack([np.broadcast_to(xs, (V, H * W)),
                     np.broadcast_to(ys, (V, H * W)),
                     zs], axis=-1)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ np.transpose(c2w[:, :3, :3], (0, 2, 1)).astype(np.float32)
    rays_o = np.broadcast_to(c2w[:, None, :3, 3], rays_d.shape).astype(np.float32)
    rays_dxo = np.cross(rays_o, rays_d)
    plucker = np.concatenate([rays_dxo, rays_d], axis=-1)
    return plucker.reshape(V, H, W, 6)


DEFAULT_CAMERA_ORIGIN = (0, 0.532139961, 0.946026558, 0.5, 0.5, 0, 0,
                         1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0)

_DIRECTION_UPDATES = {
    # index into the 19-float camera entry; w2c translation x is 10/15/18
    "push_in": [(18, -2.0)],
    "pull_out": [(18, +2.0)],
    "move_left": [(10, +2.0)],
    "move_right": [(10, -2.0)],
    "pan_left": [(9, +1.0)],
    "pan_right": [(9, -1.0)],
    "orbit_left": [(9, +1.0), (15, -1.0)],
    "orbit_right": [(9, -1.0), (15, +1.0)],
}


def generate_camera_coordinates(direction: str, length: int,
                                speed: float = 1 / 54,
                                origin=DEFAULT_CAMERA_ORIGIN,
                                cameras_interp=None):
    """Direction string -> per-frame 19-float camera entries
    (wan22 wan_video_camera_controller.py:191-229).

    The reference's generator loop never appends inside the while body (its
    ``coordinates.append`` sits after the loop), which hangs for length > 2;
    here the intended per-frame accumulation is implemented. The
    cameras_interp branch (the one the shipped CLI uses) matches exactly:
    entry i keeps the origin header and swaps in the interpolated w2c.
    """
    if direction not in _DIRECTION_UPDATES and cameras_interp is None:
        raise ValueError(f"unknown camera direction {direction!r}")
    coordinates = [list(origin)]
    if cameras_interp is None:
        while len(coordinates) < length:
            coor = coordinates[-1].copy()
            for idx, mult in _DIRECTION_UPDATES[direction]:
                coor[idx] += speed * mult
            coordinates.append(coor)
    else:
        assert len(cameras_interp) == length
        for i in range(1, length):
            coor = np.array(coordinates[0], np.float64)
            coor[-12:] = np.asarray(cameras_interp[i], np.float64)
            coordinates.append(coor.tolist())
    return coordinates


def process_pose_file(cam_entries, width: int = 672, height: int = 384,
                      original_pose_width: int = 1280,
                      original_pose_height: int = 720,
                      return_poses: bool = False):
    """19-float camera entries -> Plucker embedding (1, V, H, W, 6)
    (wan_video_camera_controller.py:152-188): aspect-corrected fx/fy,
    relative first-frame-centric poses (the controller's
    get_relative_pose hardcodes cam_to_origin=0, :93-108)."""
    if return_poses:
        return cam_entries
    cams = [Camera.from_entry(e) for e in cam_entries]
    sample_ratio = width / height
    pose_ratio = original_pose_width / original_pose_height
    if pose_ratio > sample_ratio:
        resized_w = height * pose_ratio
        for c in cams:
            c.fx = resized_w * c.fx / width
    else:
        resized_h = width / pose_ratio
        for c in cams:
            c.fy = resized_h * c.fy / height
    K = np.asarray([[c.fx * width, c.fy * height, c.cx * width, c.cy * height]
                    for c in cams], np.float32)
    c2w = get_relative_pose(cams, zero_t_first_frame=True)
    return ray_condition(K, c2w, height, width)[None]


def plucker_from_pose_encoding(pose_enc: np.ndarray,
                               image_size_hw: Tuple[int, int]) -> np.ndarray:
    """pose_enc (S, 9) -> Plucker video (1, S, H, W, 6).

    Mirrors get_plucker_embedding_direct_from_cam_params (dataset_re10k.py:
    248-304) with the inference config: relative poses, zero-t first frame,
    no fxy rescale, stride 1. Note the reference multiplies the (pixel)
    intrinsics by the sample size again -- a trained-in quirk kept as-is.
    """
    H, W = image_size_hw
    extr, intr = pose_encoding_to_extri_intri(pose_enc, image_size_hw)
    cams = cameras_from_extri_intri(extr, intr)
    K = np.asarray([[c.fx * W, c.fy * H, c.cx * W, c.cy * H] for c in cams],
                   np.float32)
    c2w = get_relative_pose(cams, zero_t_first_frame=True)
    plucker = ray_condition(K, c2w, H, W)
    return plucker[None]
