"""JSONL metrics logging (SURVEY.md S5.5).

Reference mechanism: optimizer ``messages`` progress lines + notebook plots.
Plan: structured JSONL (ELBO, grad norm, RMSE, iters/sec/chip, samples/s) so
every bench/train entry point emits machine-readable trajectories.
"""

from __future__ import annotations

import json
import time
from typing import Optional

import numpy as np

__all__ = ["MetricsLogger"]


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, *, echo: bool = False):
        self.path = path
        self.echo = echo
        self._fh = open(path, "a") if path else None
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "wall_time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            v = np.asarray(v)
            rec[k] = v.item() if v.ndim == 0 else v.tolist()
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line)

    def close(self):
        if self._fh:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
