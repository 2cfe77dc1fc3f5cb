"""Video assembly for novel-pose / novel-view sweeps.

Behavioral reference: ``images_to_video`` at
``lib/run_nerf_helpers.py:32-40`` and the video wiring in the legacy
``test`` (run_nerf_batch.py:283-296) — frames matching a suffix/prefix are
sorted and written as a low-fps video next to the images.
"""

from __future__ import annotations

import os
from typing import List, Optional

import cv2
import numpy as np


def images_to_video(
    image_folder: str,
    video_name: str,
    images: List[str],
    fps: int = 1,
) -> Optional[str]:
    """Write ``<image_folder>/<video_name>.avi`` from the listed frames
    (MJPG — the reference's fourcc-0 .wmv depends on Windows codecs)."""
    if not images:
        return None
    first = cv2.imread(os.path.join(image_folder, images[0]))
    if first is None:
        return None
    h, w = first.shape[:2]
    path = os.path.join(image_folder, video_name + ".avi")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h)
    )
    for name in images:
        frame = cv2.imread(os.path.join(image_folder, name))
        if frame is None:
            continue
        writer.write(cv2.resize(frame, (w, h)))
    writer.release()
    return path


def frames_to_video_bytes(frames: np.ndarray, fps: int = 3) -> bytes:
    """(N, H, W, 3) float [0,1] RGB frames -> MJPG ``.avi`` bytes (the
    serving layer's video response; same codec as
    :func:`images_to_video`)."""
    import tempfile

    frames = np.asarray(frames)
    h, w = frames.shape[1:3]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.avi")
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h)
        )
        for f in frames:
            rgb = (np.clip(f, 0.0, 1.0) * 255).astype(np.uint8)
            writer.write(cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        writer.release()
        with open(path, "rb") as fh:
            return fh.read()


def write_sweep_videos(savedir: str, novel_pose_suffix: str = "_03.png",
                       novel_view_prefix: str = "frame0000") -> None:
    """The legacy test()'s video outputs (run_nerf_batch.py:283-296)."""
    images = sorted(
        f for f in os.listdir(savedir) if f.endswith(novel_pose_suffix)
    )
    images_to_video(savedir, "novel_pose", images, fps=1)
    images = sorted(
        f for f in os.listdir(savedir) if f.startswith(novel_view_prefix)
    )
    images_to_video(savedir, "novel_view", images, fps=3)
