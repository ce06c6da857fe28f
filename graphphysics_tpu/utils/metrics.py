"""Metrics utilities: online meter + CSV logger.

``AverageValueMeter`` ports the reference ``graphphysics/utils/meter.py:22-58``;
``CSVMetricsLogger`` is the offline replacement for the reference's W&B
logging (network logging stays optional and pluggable).
"""

from __future__ import annotations

import csv
import math
import os
import time
from typing import Dict, Optional


class AverageValueMeter:
    """Online mean/std of scalar observations (Welford-ish via sums)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.n = 0
        self.sum = 0.0
        self.var = 0.0
        self.val = 0.0
        self.mean = math.nan
        self.std = math.nan

    def add(self, value: float, n: int = 1):
        self.val = value
        self.sum += value * n
        self.var += value * value * n
        self.n += n
        if self.n == 0:
            self.mean, self.std = math.nan, math.nan
        elif self.n == 1:
            self.mean, self.std = self.sum, math.inf
        else:
            self.mean = self.sum / self.n
            var = (self.var - self.n * self.mean * self.mean) / (self.n - 1.0)
            self.std = math.sqrt(max(var, 0.0))

    def value(self):
        return self.mean, self.std


class CSVMetricsLogger:
    """CSV metrics sink. The header grows as new metric keys appear: the file
    is rewritten with the widened header (files are small); appending to an
    existing file (resume) adopts its header instead of duplicating it."""

    def __init__(self, path: str):
        self.path = path
        self._fields = ["time", "epoch", "step"]
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if os.path.exists(path):
            with open(path, newline="") as f:
                reader = csv.reader(f)
                header = next(reader, None)
            if header:
                self._fields = list(header)

    def _rewrite_with_fields(self):
        rows = []
        if os.path.exists(self.path):
            with open(self.path, newline="") as f:
                rows = list(csv.DictReader(f))
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields, extrasaction="ignore")
            w.writeheader()
            for r in rows:
                w.writerow(r)

    def log(self, epoch: int, step: int, metrics: Dict[str, float]):
        new_fields = [k for k in metrics if k not in self._fields]
        if new_fields or not os.path.exists(self.path):
            self._fields.extend(new_fields)
            self._rewrite_with_fields()
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields, extrasaction="ignore")
            row = {"time": f"{time.time():.3f}", "epoch": epoch, "step": step}
            row.update(metrics)
            w.writerow(row)


class WandbLogger:
    """Optional W&B sink, matching the reference's logging role
    (``train.py:203-230``); silently disabled when wandb is unavailable."""

    def __init__(self, project: str, config: Optional[dict] = None,
                 run_id: Optional[str] = None):
        try:
            import wandb  # noqa: F401

            self._wandb = wandb
            self.run = wandb.init(
                project=project, config=config, id=run_id,
                resume="allow" if run_id else None,
            )
            self.run_id = self.run.id
        except Exception:
            self._wandb = None
            self.run = None
            self.run_id = None

    def log(self, metrics: Dict[str, float], step: Optional[int] = None):
        if self.run is not None:
            self.run.log(metrics, step=step)
