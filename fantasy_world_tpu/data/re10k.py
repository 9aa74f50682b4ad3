"""RealEstate10K pose processing: pose files / pose encodings -> Plucker.

Re-design of diffsynth_wan21/data/dataset_re10k.py:122-304 (identical copy
exists in diffsynth_wan22) in pure numpy. The inference entry point
(`get_plucker_embedding_direct_from_cam_params`) is also reachable through
hostops/camera.plucker_from_pose_encoding; this class adds the
training-era surface: RE10K txt camera files, strided frame sampling,
fx/fy rescale for aspect-ratio-mismatched sources, frame shuffling, and
horizontal flip (flipped pixel-ray grid).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..hostops.camera import (Camera, cameras_from_extri_intri,
                              get_relative_pose, ray_condition)
from ..hostops.geometry import pose_encoding_to_extri_intri


def load_re10k_cameras(pose_file: str) -> List[Camera]:
    """RE10K txt format: optional youtube-url first line, then per-frame
    ``ts fx fy cx cy k1 k2 r00..r23`` rows (dataset_re10k.py:181-190)."""
    with open(pose_file) as f:
        lines = f.readlines()
    if "youtube" in lines[0]:
        lines = lines[1:]
    cams = []
    for line in lines:
        entry = [float(x) for x in line.strip().split(" ")]
        cams.append(Camera.from_entry(entry))
    return cams


class RealEstate10KPoseProcessor:
    """Numpy port of the reference processor (dataset_re10k.py:122-304).

    sample_size is (H, W); intrinsics in the source files are normalized
    and get re-scaled by the sample size (the reference then multiplies by
    sample size AGAIN inside the embedding call -- a trained-in quirk that
    both paths keep).
    """

    def __init__(self, sample_stride: int = 4, minimum_sample_stride: int = 1,
                 sample_n_frames: int = 16, relative_pose: bool = False,
                 zero_t_first_frame: bool = False,
                 sample_size: Sequence[int] = (256, 384),
                 rescale_fxy: bool = False, shuffle_frames: bool = False,
                 use_flip: bool = False, is_i2v: bool = False,
                 rng: Optional[np.random.Generator] = None):
        self.sample_stride = sample_stride
        self.minimum_sample_stride = minimum_sample_stride
        self.sample_n_frames = sample_n_frames
        self.relative_pose = relative_pose
        self.zero_t_first_frame = zero_t_first_frame
        self.sample_size = (tuple(sample_size)
                            if not isinstance(sample_size, int)
                            else (sample_size, sample_size))
        self.sample_wh_ratio = self.sample_size[1] / self.sample_size[0]
        self.rescale_fxy = rescale_fxy
        self.shuffle_frames = shuffle_frames
        self.use_flip = use_flip
        self.is_i2v = is_i2v
        self.rng = rng or np.random.default_rng()

    # -- frame selection ----------------------------------------------------

    def sample_frame_indices(self, total_frames: int) -> np.ndarray:
        """Strided uniform sampling with stride backoff
        (dataset_re10k.py:195-216)."""
        assert total_frames >= self.sample_n_frames
        stride = self.sample_stride
        if total_frames < self.sample_n_frames * stride:
            max_stride = total_frames // self.sample_n_frames
            stride = int(self.rng.integers(self.minimum_sample_stride,
                                           max_stride + 1))
        end = min(self.sample_n_frames * stride, total_frames)
        idx = np.linspace(0, end - 1, self.sample_n_frames, dtype=int)
        if self.shuffle_frames:
            idx = idx[self.rng.permutation(self.sample_n_frames)]
        return idx

    # -- intrinsics bookkeeping ----------------------------------------------

    def _rescale(self, cams: List[Camera], image_wh: Optional[Tuple[int, int]]):
        """fx/fy correction when the source aspect ratio differs from the
        sample size (dataset_re10k.py:218-228)."""
        if not self.rescale_fxy or image_wh is None:
            return
        ori_w, ori_h = image_wh
        ori_ratio = ori_w / ori_h
        if ori_ratio > self.sample_wh_ratio:
            resized_w = self.sample_size[0] * ori_ratio
            for c in cams:
                c.fx = resized_w * c.fx / self.sample_size[1]
        else:
            resized_h = self.sample_size[1] / ori_ratio
            for c in cams:
                c.fy = resized_h * c.fy / self.sample_size[0]

    def _embed(self, cams: List[Camera], flip: bool) -> np.ndarray:
        H, W = self.sample_size
        K = np.asarray([[c.fx * W, c.fy * H, c.cx * W, c.cy * H]
                        for c in cams], np.float32)
        if self.relative_pose:
            c2w = get_relative_pose(cams, self.zero_t_first_frame)
        else:
            c2w = np.asarray([c.c2w_mat for c in cams], np.float32)
        plucker = ray_condition(K, c2w, H, W)
        if flip:
            # flipped pixel grid == reversed x traversal of the ray image
            plucker = plucker[:, :, ::-1]
        return plucker[None]                        # (1, V, H, W, 6)

    # -- public API -----------------------------------------------------------

    def get_plucker_embedding(self, pose_file: str,
                              image_wh: Optional[Tuple[int, int]] = None
                              ) -> np.ndarray:
        cams = load_re10k_cameras(pose_file)
        idx = self.sample_frame_indices(len(cams))
        cams = [cams[i] for i in idx]
        self._rescale(cams, image_wh)
        flip = bool(self.use_flip and self.rng.random() < 0.5)
        return self._embed(cams, flip)

    def get_plucker_embedding_direct_from_cam_params(
            self, pose_enc: np.ndarray, image_size: Tuple[int, int],
            image_wh: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """pose_enc (S, 9) absT_quaR_FoV -> (1, S', H, W, 6)
        (dataset_re10k.py:248-304)."""
        extr, intr = pose_encoding_to_extri_intri(np.asarray(pose_enc),
                                                  image_size)
        cams = cameras_from_extri_intri(extr, intr)
        idx = self.sample_frame_indices(len(cams))
        cams = [cams[i] for i in idx]
        self._rescale(cams, image_wh)
        return self._embed(cams, flip=False)
