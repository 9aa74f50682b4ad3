"""Data-path parity: RE10K pose processor and video helpers."""
import os

import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity

RE10K_HEADER = "https://www.youtube.com/watch?v=synthetic\n"


def _write_pose_file(path, n=40, seed=0):
    rng = np.random.default_rng(seed)
    lines = [RE10K_HEADER]
    for i in range(n):
        fx, fy = 0.9 + 0.01 * i, 0.95
        cx, cy = 0.5, 0.5
        # a smooth forward-moving camera with slight rotation
        angle = 0.02 * i
        R = np.array([[np.cos(angle), 0, np.sin(angle)],
                      [0, 1, 0],
                      [-np.sin(angle), 0, np.cos(angle)]])
        t = np.array([0.05 * i, 0.01 * i, 0.1 * i])
        w2c = np.concatenate([R, t[:, None]], axis=1)   # (3, 4)
        row = [i * 1000, fx, fy, cx, cy, 0.0, 0.0] + w2c.flatten().tolist()
        lines.append(" ".join(str(x) for x in row) + "\n")
    with open(path, "w") as f:
        f.writelines(lines)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_re10k_plucker_parity(tmp_path):
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.data.dataset_re10k import (
        RealEstate10KPoseProcessor as RefProc)
    from fantasy_world_tpu.data.re10k import RealEstate10KPoseProcessor

    pose_file = os.path.join(tmp_path, "poses.txt")
    _write_pose_file(pose_file)

    # __new__ assembly avoids the torchvision pixel transforms the pose
    # path never touches (dataset_re10k.py:147-158)
    ref = RefProc.__new__(RefProc)
    ref.relative_pose = True
    ref.zero_t_first_frame = True
    ref.sample_stride = 4
    ref.minimum_sample_stride = 1
    ref.sample_n_frames = 8
    ref.return_clip_name = False
    ref.is_i2v = True
    ref.sample_size = (48, 64)
    ref.sample_wh_ratio = 64 / 48
    ref.rescale_fxy = False
    ref.shuffle_frames = False
    ref.use_flip = False

    ours = RealEstate10KPoseProcessor(
        sample_stride=4, sample_n_frames=8, relative_pose=True,
        zero_t_first_frame=True, sample_size=(48, 64), is_i2v=True)

    ref_emb = ref.get_plucker_embedding(pose_file).numpy()
    our_emb = ours.get_plucker_embedding(pose_file)
    assert our_emb.shape == ref_emb.shape == (1, 8, 48, 64, 6)
    np.testing.assert_allclose(our_emb, ref_emb, rtol=1e-4, atol=1e-5)


def test_video_helpers(tmp_path):
    from PIL import Image
    from fantasy_world_tpu.data.video import (VideoData, crop_and_resize,
                                              split_file_name)

    # natural sort
    assert (split_file_name("img2.png") < split_file_name("img10.png"))

    rng = np.random.default_rng(0)
    folder = os.path.join(tmp_path, "frames")
    os.makedirs(folder)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (30, 40, 3), np.uint8
                                     )).save(os.path.join(folder, f"{i}.png"))

    vd = VideoData(image_folder=folder, height=16, width=24)
    assert len(vd) == 5
    assert vd[0].shape == (16, 24, 3)
    assert vd.shape() == (16, 24)

    img = rng.integers(0, 255, (30, 60, 3), np.uint8)
    out = crop_and_resize(img, 20, 20)
    assert out.shape == (20, 20, 3)
