"""Video tensor dataset: sorted `.pt` dir -> (array, filename)
(reference: dataset_processor/dataset_loader.py:9-25).

Tensors are stored in torch's pickle format by the preprocessing tools;
loaded host-side to numpy (torch is a host-only dependency here).
"""
from __future__ import annotations

import os
from typing import Iterator, List, Tuple

import numpy as np


class VideoTensorDataset:
    def __init__(self, tensor_dir: str):
        self.tensor_dir = tensor_dir
        self.files: List[str] = sorted(
            f for f in os.listdir(tensor_dir) if f.endswith(".pt"))

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        import torch

        path = os.path.join(self.tensor_dir, self.files[idx])
        t = torch.load(path, map_location="cpu", weights_only=True)
        return t.float().numpy(), self.files[idx]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, str]]:
        for i in range(len(self)):
            yield self[i]


def save_tensor(path: str, arr: np.ndarray) -> None:
    """Save in the reference's torch format so artifacts interoperate."""
    import torch

    torch.save(torch.from_numpy(np.asarray(arr)), path)
