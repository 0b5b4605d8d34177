"""Observability: per-epoch scalar logging (CSV always; TensorBoard when available).

The reference writes ~30 TensorBoard scalars per epoch plus CSV result rows
(``train_pointnet-attention.py:280-309``, ``test_pointnet_att_segmen.py:272-284``).
Here a single MetricsLogger handles both sinks; the CSV is the source of truth (no
torch dependency required), TB events are best-effort.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, logdir: str, name: str = "train", tensorboard: bool = True):
        self.logdir = os.path.join(logdir, name)
        os.makedirs(self.logdir, exist_ok=True)
        self._csv_path = os.path.join(self.logdir, "scalars.csv")
        new = not os.path.exists(self._csv_path)
        self._csv = open(self._csv_path, "a", newline="")
        self._writer = csv.writer(self._csv)
        if new:
            self._writer.writerow(["wall_time", "step", "tag", "value"])
        self._tb = None
        if tensorboard:
            try:  # torch ships a TB writer in this environment; optional otherwise
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(self.logdir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._writer.writerow([f"{time.time():.3f}", step, tag, float(value)])
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def scalars(self, values: Dict[str, float], step: int) -> None:
        for k, v in values.items():
            self.scalar(k, v, step)

    def flush(self) -> None:
        self._csv.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._csv.close()
        if self._tb is not None:
            self._tb.close()


def append_results_csv(path: str, row: Dict, field_order: Optional[list] = None) -> None:
    """Append one evaluation-result row (IoU-results-v2.csv style,
    test_pointnet_att_segmen.py:272-284)."""
    exists = os.path.exists(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fields = field_order or list(row.keys())
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        if not exists:
            w.writeheader()
        w.writerow({k: row.get(k) for k in fields})
