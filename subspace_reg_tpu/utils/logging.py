"""Observability: meters + a lightweight metric writer.

The reference logs pretraining scalars with ``tensorboard_logger``
(train_supervised.py:148,172-178).  This writer emits JSONL (always) and
best-effort TensorBoard event files when a TB backend is importable — the
scalar names match the reference (train_acc / train_loss / test_acc /
test_acc_top5 / test_loss).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class AverageMeter:
    """Reference eval/util.py:9-24."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class MetricWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:  # optional TensorBoard backend
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def log_value(self, name: str, value, step: int) -> None:
        rec = {"name": name, "value": float(value), "step": int(step),
               "ts": time.time()}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(name, float(value), int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
