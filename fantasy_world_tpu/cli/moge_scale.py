"""MoGe-based scene scale normalization (inference_wan21.py:247-274).

The MoGe-2 monocular geometry model provides a metric depth prior for the
first frame; its world points set the scene scale that the camera
trajectory is normalized by. The JAX MoGe port lives in
fantasy_world_tpu.models.moge; until its weights are available this module
degrades to identity scale with a warning.
"""
from __future__ import annotations

import numpy as np

from ..hostops.geometry import normalize_scene, depth_to_world_coords_points


def moge_scale_normalize(image01: np.ndarray, extrinsics: np.ndarray,
                         intrinsics: np.ndarray,
                         moge_infer=None) -> np.ndarray:
    """image01: (H, W, 3) in [0,1]; extrinsics (S, 4, 4) w2c; intrinsics
    (S, 3, 3). Returns rebased+scaled (S, 4, 4) extrinsics."""
    if moge_infer is None:
        try:
            from ..models.moge.infer import default_moge_infer, _DEFAULT
            if _DEFAULT["params"] is not None:
                moge_infer = default_moge_infer
        except Exception:
            moge_infer = None
    if moge_infer is None:
        print("[warn] MoGe unavailable; skipping scale normalization")
        S = extrinsics.shape[0]
        out = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
        out[:, :3, :] = extrinsics[:, :3, :]
        from ..hostops.geometry import closed_form_inverse_se3
        first_inv = closed_form_inverse_se3(out[:1])[0]
        return (out @ first_inv[None]).astype(np.float32)

    pred = moge_infer(image01)
    depth = np.asarray(pred["depth"], np.float32)
    depth[~np.isfinite(depth)] = 0
    world, _, mask = depth_to_world_coords_points(
        depth, extrinsics[0, :3, :], intrinsics[0])
    if "mask" in pred:
        mask = mask & np.asarray(pred["mask"], bool)
    return normalize_scene(extrinsics[:, :3, :], world, mask)
