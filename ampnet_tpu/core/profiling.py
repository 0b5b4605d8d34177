"""Tracing, step timing, and energy accounting.

The reference's observability is wall-clock prints plus optional codecarbon
``@track_emissions`` decorators (``baseline/test_segmentation.py:25``,
``rnn/test_pointnet_gru_segmen.py:28``; SURVEY.md §5). TPU-native equivalents:

* ``trace(logdir)`` — ``jax.profiler`` trace context producing TensorBoard-viewable
  profiles (op-level timeline, HBM traffic, MXU utilization);
* ``StepTimer`` — steady-state step statistics with correct device synchronization;
* ``EnergyTracker`` — codecarbon-style energy/CO₂ accounting from wall time ×
  configurable per-device power draw (an estimate — TPU power telemetry isn't
  exposed to user code the way RAPL is on CPUs).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall times with a blocking sync on each boundary."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            import jax

            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self, skip_warmup: int = 1) -> Dict[str, float]:
        if not self.times:  # zero-step (aborted) runs report, not crash
            return {"steps": 0}
        ts = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            "steps": len(self.times),
            "mean_ms": float(ts.mean() * 1e3),
            "median_ms": float(np.median(ts) * 1e3),
            "p95_ms": float(np.percentile(ts, 95) * 1e3),
            "min_ms": float(ts.min() * 1e3),
        }


@dataclass
class EnergyTracker:
    """Estimated energy/CO₂ for a run (codecarbon-equivalent output schema).

    device_watts defaults to a v5e-class accelerator board estimate; pass your own
    measured figure for real accounting. carbon_intensity in kgCO₂/kWh.
    """

    device_watts: float = 200.0
    n_devices: int = 1
    host_watts: float = 40.0
    carbon_intensity: float = 0.4
    _start: float = field(default=0.0, repr=False)
    elapsed_s: float = 0.0

    def __enter__(self) -> "EnergyTracker":
        self._start = time.time()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed_s += time.time() - self._start

    @property
    def energy_kwh(self) -> float:
        watts = self.device_watts * self.n_devices + self.host_watts
        return watts * self.elapsed_s / 3600.0 / 1000.0

    @property
    def emissions_kg(self) -> float:
        return self.energy_kwh * self.carbon_intensity

    def report(self) -> Dict[str, float]:
        return {
            "duration_s": round(self.elapsed_s, 3),
            "energy_kwh": self.energy_kwh,
            "emissions_kgco2": self.emissions_kg,
            "device_watts_assumed": self.device_watts,
            "n_devices": self.n_devices,
        }

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)
