"""mp4 -> tensor preprocessing (reference: dataset_processor/mp42tensor.py).

Decodes a video, resizes the short side to `target_short` (240p by default),
converts to RGB float tensor [C, T, H, W] scaled to [-1, 1], and saves in
torch `.pt` format. Threaded batch driver mirrors the reference.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np


def video_to_tensor(path: str, target_short: Optional[int] = 240,
                    max_frames: Optional[int] = None) -> np.ndarray:
    """Decode mp4 -> float32 [C, T, H, W] in [-1, 1]
    (reference: mp42tensor.py resize + /127.5 - 1 convention)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"Cannot open video: {path}")
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if target_short:
            h, w = frame.shape[:2]
            if min(h, w) > target_short:
                scale = target_short / min(h, w)
                frame = cv2.resize(
                    frame, (int(round(w * scale)), int(round(h * scale))),
                    interpolation=cv2.INTER_AREA)
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"No frames decoded from {path}")
    arr = np.stack(frames).astype(np.float32) / 127.5 - 1.0  # [T, H, W, C]
    return arr.transpose(3, 0, 1, 2)  # [C, T, H, W]


def convert_dir(input_dir: str, output_dir: str,
                target_short: Optional[int] = 240,
                max_frames: Optional[int] = None,
                num_workers: int = 8) -> List[str]:
    """Threaded mp4 dir -> .pt dir (reference uses a thread pool likewise)."""
    from .dataset_loader import save_tensor

    os.makedirs(output_dir, exist_ok=True)
    videos = sorted(f for f in os.listdir(input_dir)
                    if f.lower().endswith((".mp4", ".mov", ".mkv", ".avi")))

    def one(name: str) -> str:
        out = os.path.join(output_dir, os.path.splitext(name)[0] + ".pt")
        arr = video_to_tensor(os.path.join(input_dir, name), target_short,
                              max_frames)
        save_tensor(out, arr)
        return out

    with ThreadPoolExecutor(num_workers) as ex:
        return list(ex.map(one, videos))


def tensor_to_video(arr: np.ndarray, path: str, fps: int = 24) -> None:
    """[C, T, H, W] in [-1, 1] -> mp4."""
    import cv2

    c, t, h, w = arr.shape
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    frames = ((arr.transpose(1, 2, 3, 0) + 1.0) * 127.5).clip(0, 255)
    for f in frames.astype(np.uint8):
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
