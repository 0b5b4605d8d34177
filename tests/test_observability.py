"""Tests for plotting, profiling/energy, and the sliding-window scanner."""

import os

import numpy as np
import pytest

from ampnet_tpu.core.plotting import (
    plot_predictions_vs_truth,
    plot_training_curves,
    plot_windows,
)
from ampnet_tpu.core.profiling import EnergyTracker, StepTimer
from ampnet_tpu.ops.sliding_window import scan_for_towers, sliding_window_scan


class TestPlotting:
    def test_pred_vs_truth(self, tmp_path, rng):
        pts = rng.normal(size=(500, 3))
        preds = rng.integers(0, 5, 500)
        targets = rng.integers(0, 5, 500)
        p = plot_predictions_vs_truth(pts, preds, targets, save_to=str(tmp_path / "p.png"))
        assert os.path.getsize(p) > 1000

    def test_windows_plot(self, tmp_path, rng):
        pts = rng.normal(size=(400, 2))
        assign = rng.integers(0, 4, 400)
        p = plot_windows(pts, assign, save_to=str(tmp_path / "w.png"))
        assert os.path.getsize(p) > 1000

    def test_histograms(self, tmp_path, rng):
        from ampnet_tpu.core.plotting import (
            plot_class_counts,
            plot_class_histograms,
            plot_histogram,
            plot_histogram_2d,
        )

        p = plot_histogram(rng.normal(size=1000), save_to=str(tmp_path / "h.png"))
        assert os.path.getsize(p) > 1000
        p = plot_histogram_2d(rng.uniform(size=500), rng.uniform(size=500),
                              save_to=str(tmp_path / "h2.png"))
        assert os.path.getsize(p) > 1000
        labels = rng.integers(0, 5, 2000)
        probs = rng.dirichlet(np.ones(5), 2000).astype(np.float32)
        p = plot_class_histograms(labels, probs, save_to=str(tmp_path / "ch.png"))
        assert os.path.getsize(p) > 1000
        p = plot_class_histograms(labels, save_to=str(tmp_path / "ch2.png"))
        assert os.path.getsize(p) > 1000
        p = plot_class_counts(
            {"gt": np.bincount(labels, minlength=5),
             "pred": np.bincount(labels[::-1], minlength=5)},
            save_to=str(tmp_path / "cc.png"),
        )
        assert os.path.getsize(p) > 1000

    def test_tb_histogram_writer(self, tmp_path, rng):
        from ampnet_tpu.core.logging import MetricsLogger
        from ampnet_tpu.core.plotting import log_histogram_to_tensorboard

        lg = MetricsLogger(str(tmp_path), "t")
        log_histogram_to_tensorboard(lg, "conf", rng.uniform(size=256), 1)
        lg.close()
        assert any(f.startswith("events") for f in os.listdir(tmp_path / "t"))

    def test_training_curves(self, tmp_path):
        csv = tmp_path / "scalars.csv"
        csv.write_text(
            "wall_time,step,tag,value\n"
            + "".join(f"0,{e},loss,{1.0 / (e + 1)}\n0,{e},miou,{e / 10}\n" for e in range(5))
        )
        p = plot_training_curves(str(csv), save_to=str(tmp_path / "c.png"))
        assert os.path.getsize(p) > 1000


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        for _ in range(3):
            t.start()
            t.stop()
        s = t.summary()
        assert s["steps"] == 3 and s["mean_ms"] >= 0

    def test_energy_tracker(self, tmp_path):
        with EnergyTracker(device_watts=100, n_devices=2) as e:
            pass
        e.elapsed_s = 3600.0  # pretend one hour
        r = e.report()
        assert r["energy_kwh"] == pytest.approx((100 * 2 + 40) / 1000.0)
        assert r["emissions_kgco2"] == pytest.approx(0.24 * 0.4, abs=1e-6)
        e.save(str(tmp_path / "emissions.json"))
        assert os.path.exists(tmp_path / "emissions.json")

    def test_trace_writes_profile(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from ampnet_tpu.core.profiling import trace

        with trace(str(tmp_path / "prof")):
            jnp.ones((8, 8)).sum().block_until_ready()
        found = []
        for root, _, files in os.walk(tmp_path / "prof"):
            found += files
        assert found  # profiler produced event files


class TestSlidingWindow:
    def test_finds_separated_towers(self, rng):
        def blob(cx, cy, n=50):
            pts = np.zeros((4, n))
            pts[0] = cx + rng.normal(0, 2, n)
            pts[1] = cy + rng.normal(0, 2, n)
            pts[2] = rng.uniform(0, 30, n)
            pts[3] = 15
            return pts

        pc = np.concatenate([blob(10, 10), blob(80, 80)], axis=1)
        windows, centers = scan_for_towers(pc, window_size=(20.0, 20.0))
        assert windows is not None
        got_centers = np.array(list(centers.values()))
        # both towers found, centers near the blobs
        d0 = np.abs(got_centers - [10, 10]).sum(axis=1).min()
        d1 = np.abs(got_centers - [80, 80]).sum(axis=1).min()
        assert d0 < 10 and d1 < 10

    def test_small_cloud_single_window(self, rng):
        pc = np.zeros((4, 30))
        pc[0] = rng.uniform(0, 5, 30)
        pc[1] = rng.uniform(0, 5, 30)
        windows, centers = sliding_window_scan(pc, window_size=(20.0, 20.0))
        assert list(windows) == [0]
        assert windows[0].shape[1] == 30

    def test_sparse_returns_none(self, rng):
        pc = np.zeros((4, 5))
        windows, centers = sliding_window_scan(pc, window_size=(20.0, 20.0), min_points=10)
        assert windows is None

    def test_no_towers(self, rng):
        pc = np.zeros((4, 100))
        pc[3] = 5
        windows, _ = scan_for_towers(pc)
        assert windows is None
