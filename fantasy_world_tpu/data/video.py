"""Video / image-folder IO helpers (host side).

Re-design of diffsynth_wan21/data/video.py:7-146: lazy frame readers for
mp4s and image folders with natural-sort, center-crop-and-resize to a
target shape, and mp4/png writers. imageio is an optional dependency --
readers raise a clear error if it is absent (the TPU image ships without
ffmpeg bindings in some profiles).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def _imageio():
    try:
        import imageio
        return imageio
    except ImportError as e:                         # pragma: no cover
        raise ImportError("video IO requires imageio; install it or use an "
                          "image folder") from e


class LowMemoryVideo:
    """Lazy mp4 frame reader (video.py:7-18)."""

    def __init__(self, file_name):
        self.reader = _imageio().get_reader(file_name)

    def __len__(self):
        return self.reader.count_frames()

    def __getitem__(self, item) -> np.ndarray:
        return np.asarray(self.reader.get_data(item))[..., :3]

    def __del__(self):
        try:
            self.reader.close()
        except Exception:
            pass


def split_file_name(file_name: str) -> tuple:
    """Natural sort key: digit runs compare numerically (video.py:21-37)."""
    result: List = []
    number = -1
    for ch in file_name:
        if "0" <= ch <= "9":
            number = (0 if number == -1 else number) * 10 + ord(ch) - ord("0")
        else:
            if number != -1:
                result.append(number)
                number = -1
            result.append(ch)
    if number != -1:
        result.append(number)
    return tuple(result)


def search_for_images(folder: str) -> List[str]:
    files = [f for f in os.listdir(folder)
             if f.endswith(".jpg") or f.endswith(".png")]
    files = sorted(files, key=split_file_name)
    return [os.path.join(folder, f) for f in files]


class LowMemoryImageFolder:
    def __init__(self, folder: str, file_list: Optional[List[str]] = None):
        if file_list is None:
            self.file_list = search_for_images(folder)
        else:
            self.file_list = [os.path.join(folder, f) for f in file_list]

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, item) -> np.ndarray:
        from PIL import Image
        return np.asarray(Image.open(self.file_list[item]).convert("RGB"))


def crop_and_resize(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """Aspect-preserving center crop then resize (video.py:65-78)."""
    from PIL import Image
    image_height, image_width = image.shape[:2]
    if image_height / image_width < height / width:
        cropped_width = int(image_height / height * width)
        left = (image_width - cropped_width) // 2
        image = image[:, left:left + cropped_width]
    else:
        cropped_height = int(image_width / width * height)
        top = (image_height - cropped_height) // 2
        image = image[top:top + cropped_height, :]
    return np.asarray(Image.fromarray(image).resize((width, height)))


class VideoData:
    """Uniform frame access over a video file or image folder
    (video.py:81-135); frames returned as (H, W, 3) uint8 numpy."""

    def __init__(self, video_file=None, image_folder=None, height=None,
                 width=None, **kwargs):
        if video_file is not None:
            self.data = LowMemoryVideo(video_file, **kwargs)
        elif image_folder is not None:
            self.data = LowMemoryImageFolder(image_folder, **kwargs)
        else:
            raise ValueError("Cannot open video or image folder")
        self.length = None
        self.height, self.width = height, width

    def set_length(self, length):
        self.length = length

    def set_shape(self, height, width):
        self.height, self.width = height, width

    def __len__(self):
        return len(self.data) if self.length is None else self.length

    def shape(self):
        if self.height is not None and self.width is not None:
            return self.height, self.width
        return self[0].shape[:2]

    def __getitem__(self, item) -> np.ndarray:
        frame = self.data[item]
        if self.height is not None and self.width is not None:
            if frame.shape[:2] != (self.height, self.width):
                frame = crop_and_resize(frame, self.height, self.width)
        return frame

    def raw_data(self) -> List[np.ndarray]:
        return [self[i] for i in range(len(self))]

    def save_images(self, folder):
        from PIL import Image
        os.makedirs(folder, exist_ok=True)
        for i in range(len(self)):
            Image.fromarray(self[i]).save(os.path.join(folder, f"{i}.png"))


def save_video(frames, save_path, fps, quality=9, ffmpeg_params=None):
    writer = _imageio().get_writer(save_path, fps=fps, quality=quality,
                                   ffmpeg_params=ffmpeg_params)
    for frame in frames:
        writer.append_data(np.asarray(frame))
    writer.close()


def save_frames(frames, save_path):
    from PIL import Image
    os.makedirs(save_path, exist_ok=True)
    for i, frame in enumerate(frames):
        Image.fromarray(np.asarray(frame)).save(
            os.path.join(save_path, f"{i}.png"))
