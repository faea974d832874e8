"""Replay memory (reference dataset/memory.py:4-28).

The reference appends transformed support tensors and replays the WHOLE
memory every fine-tune epoch (eval/language_eval.py:256-258).  The TPU
engine needs static shapes, so the store is a preallocated padded buffer
plus a valid-count; the engine consumes (data, labels, count) directly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class ReplayMemory:
    def __init__(self, max_items: int, img_shape: Tuple[int, ...]):
        self.max_items = max_items
        self.data = np.zeros((max_items,) + tuple(img_shape), np.float32)
        self.labels = np.zeros((max_items,), np.int32)
        self.count = 0

    def __len__(self):
        return self.count

    def additems(self, data: np.ndarray, labels: np.ndarray) -> None:
        n = data.shape[0]
        assert self.count + n <= self.max_items, "replay memory overflow"
        self.data[self.count:self.count + n] = data
        self.labels[self.count:self.count + n] = labels
        self.count += n

    def mask(self) -> np.ndarray:
        m = np.zeros((self.max_items,), np.float32)
        m[: self.count] = 1.0
        return m
