"""Scene-path dataset utilities.

Counterparts of the reference ``SimpleDataLoader``
(`/root/reference/utils/dataloader.py:7-56` — round-robin shuffled path
batches driving scene iteration) and ``ChildrenPathDataset`` /
``get_files_with_suffix`` (`utils/datasets/datasets.py:425-512`).
"""
from __future__ import annotations

import glob
import os
import random
from typing import List, Optional


def get_files_with_suffix(root: str, suffix: str) -> List[str]:
    """Recursive suffix glob (`datasets.py:425-443`)."""
    if os.path.isfile(root):
        return [root] if root.endswith(suffix) else []
    return sorted(
        glob.glob(os.path.join(root, "**", f"*{suffix}"), recursive=True)
    )


class ChildrenPathDataset:
    """Enumerate child scene paths with fallbacks (`datasets.py:446-512`):
    prefer scene-instance JSONs, fall back to GLB stages, then to treating
    the path itself as a single procedural preset name."""

    def __init__(self, path: str, shuffle: bool = True, seed: int = 42):
        self.path = path
        self.items: List[str] = (
            get_files_with_suffix(path, ".scene_instance.json")
            or get_files_with_suffix(path, ".glb")
            or [path]
        )
        self.shuffle = shuffle
        self._rng = random.Random(seed)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i % len(self.items)]


class SimpleDataLoader:
    """Round-robin shuffled batches of ``num`` paths (`dataloader.py:7-56`).
    Each ``next(num)`` returns the next batch, reshuffling at epoch ends —
    the engine of scene iteration / domain randomisation."""

    def __init__(self, dataset, batch_size: Optional[int] = None,
                 shuffle: bool = True, seed: int = 42):
        self.dataset = dataset
        self.batch = batch_size
        self.shuffle = shuffle
        self._rng = random.Random(seed)
        self._order: List[int] = []
        self._pos = 0
        self._reshuffle()

    def _reshuffle(self):
        self._order = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(self._order)
        self._pos = 0

    def next(self, num: Optional[int] = None) -> List:
        num = num if num is not None else (self.batch or 1)
        out = []
        for _ in range(num):
            if self._pos >= len(self._order):
                self._reshuffle()
            out.append(self.dataset[self._order[self._pos]])
            self._pos += 1
        return out
