"""Host->device input pipeline with background prefetch.

The reference overlaps augmentation with training via DataLoader worker
processes (train_supervised.py:50-51); here augmentation is on-device, so
the pipeline's job is: shuffle -> native batch gather (data/native.py) ->
async host->HBM copy one step ahead of the training loop.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from . import native


class PrefetchLoader:
    """Iterates (device_x_u8, device_y) batches with N-deep prefetch."""

    def __init__(self, imgs: np.ndarray, labels: np.ndarray,
                 batch_size: int, rng: np.random.RandomState,
                 drop_last: bool = True, depth: int = 2,
                 device_put=None):
        import jax
        self.imgs = np.ascontiguousarray(imgs)
        self.labels = np.asarray(labels, np.int32)
        self.batch_size = batch_size
        self.rng = rng
        self.drop_last = drop_last
        self.depth = depth
        self.device_put = device_put or jax.device_put

    def __len__(self):
        n = len(self.labels)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def epoch(self) -> Iterator[Tuple]:
        import jax.numpy as jnp
        n = len(self.labels)
        order = self.rng.permutation(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def producer():
            for i in range(0, end, self.batch_size):
                if stop.is_set():
                    return
                idxs = order[i:i + self.batch_size]
                x = native.gather_u8(self.imgs, idxs)
                y = self.labels[idxs]
                # start the host->device copy ahead of consumption
                q.put((self.device_put(jnp.asarray(x)),
                       self.device_put(jnp.asarray(y))))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
