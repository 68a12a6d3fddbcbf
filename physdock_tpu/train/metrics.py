"""Training metrics logging.

The reference logs scalars through Uni-Core's TensorBoard hook
(tasks/unicore_train/__init__.py:177-190).  Here: a dependency-free JSONL
scalar log (one line per step) plus optional TensorBoard export when
tensorflow happens to be available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, log_dir: str, flush_every: int = 20):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "scalars.jsonl")
        self._f = open(self.path, "a")
        self._n = 0
        self.flush_every = flush_every
        self._tb = None
        try:  # optional TensorBoard writer
            from flax.metrics import tensorboard

            self._tb = tensorboard.SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._n += 1
        if self._n % self.flush_every == 0:
            self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.scalar(k, float(v), step)

    def close(self) -> None:
        self._f.flush()
        self._f.close()
