"""Structured training metrics — the reference's observability is SB3's
tensorboard logging (``transport1Dppo.py:88`` ``tensorboard_log="./tb/"``) and
print statements. Here: a JSONL stream (always) plus optional TensorBoard
scalars, fed from host callbacks — never from inside jitted code.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricsLogger:
    """``log(step, {"mean_reward": ...})`` → metrics.jsonl (+ TensorBoard).

    Usable as the ``callback`` of ``PPOTrainer.train`` via :meth:`callback`.
    """

    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from flax.metrics.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, metrics: dict) -> None:
        row = {"step": int(step), "walltime": time.time() - self._t0}
        for k, v in metrics.items():
            v = float(np.asarray(v))
            row[k] = v
            if self._tb is not None:
                self._tb.scalar(k, v, step)
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def callback(self, it: int, metrics: dict) -> None:
        self.log(it, metrics)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
