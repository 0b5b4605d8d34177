"""Epoch-driver tests: fit/eval/checkpoint/resume on an in-memory synthetic dataset."""

import numpy as np
import pytest

from ampnet_tpu.core.config import AMPNetConfig, ModelConfig, TrainConfig
from ampnet_tpu.data.pipeline import PaddedBatcher
from ampnet_tpu.data.synthetic import synthetic_scene
from ampnet_tpu.models.amp import AMPNetSegmenter
from ampnet_tpu.train.trainer import Trainer


class MemoryDataset:
    """Windowed samples kept in memory (same sample contract as the disk datasets)."""

    def __init__(self, n_items=6, n_windows=3, n_points=96, seed=0):
        rng = np.random.default_rng(seed)
        from ampnet_tpu.data.schema import remap_segmentation_labels

        self.samples = []
        for i in range(n_items):
            pts, lbl = [], []
            for _ in range(n_windows):
                sc = synthetic_scene(rng, n_points=n_points)[:n_points]
                f = np.concatenate([sc[:, 0:3], sc[:, 4:10]], axis=1).astype(np.float32)
                f[:, 0] = f[:, 0] * 2 - 1
                f[:, 1] = f[:, 1] * 2 - 1
                pts.append(f)
                lbl.append(np.asarray(remap_segmentation_labels(sc[:, 3])))
            pts = np.stack(pts)
            self.samples.append(
                {
                    "points": pts,
                    "labels": np.stack(lbl).astype(np.int32),
                    "centroids": pts[:, :, :2].mean(axis=1).astype(np.float32),
                    "name": f"mem{i}",
                }
            )

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    cfg = AMPNetConfig(train=TrainConfig(batch_size=3, learning_rate=3e-3, epochs=2))
    ds = MemoryDataset()
    train = PaddedBatcher(ds, 3, n_points=96, max_windows=4, seed=0, prefetch=0)
    val = PaddedBatcher(ds, 3, n_points=96, max_windows=4, seed=1, prefetch=0)
    wd = str(tmp_path_factory.mktemp("work"))
    return Trainer(cfg, AMPNetSegmenter(cfg.model), train, val, wd, name="t")


def test_fit_and_checkpoint(trainer):
    history = trainer.fit(epochs=2)
    assert len(history["train"]) == 2 and len(history["val"]) == 2
    for m in history["train"]:
        assert np.isfinite(m["loss"])
        assert "iou_tower" in m and "miou" in m and "accuracy" in m
    # best-val checkpoint must exist after an epoch that improved val loss
    assert trainer.ckpt.exists("t_best")
    meta = trainer.ckpt.load_meta("t_best")
    assert meta["task"] == "segmentation"
    assert meta["config"]["train"]["batch_size"] == 3
    # CSV logs written
    import os

    assert os.path.getsize(os.path.join(trainer.log_train.logdir, "scalars.csv")) > 0


def test_async_checkpoint_matches_sync(tmp_path):
    """The async writer (device-copy snapshot + background fetch/write) must land
    byte-identical checkpoints to the reference-style inline save, even while the
    donating train step keeps reusing the live state buffers."""
    import jax

    ds = MemoryDataset()
    params = {}
    for mode in (True, False):
        cfg = AMPNetConfig(
            train=TrainConfig(
                batch_size=3, learning_rate=3e-3, epochs=2, async_checkpoint=mode
            )
        )
        wd = str(tmp_path / ("async" if mode else "sync"))
        t = Trainer(
            cfg,
            AMPNetSegmenter(cfg.model),
            PaddedBatcher(ds, 3, n_points=96, max_windows=4, seed=0, prefetch=0),
            PaddedBatcher(ds, 3, n_points=96, max_windows=4, seed=1, prefetch=0),
            wd,
            name="t",
        )
        t.fit(epochs=2)  # fit() drains the writer before returning
        assert t.ckpt.exists("t_best")
        restored, meta = t.ckpt.restore("t_best", t.state)
        params[mode] = (jax.device_get(restored.params), meta)
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), params[True][0], params[False][0]
    )
    assert max(jax.tree.leaves(diffs)) == 0.0
    assert params[True][1]["accuracy"] == params[False][1]["accuracy"]


def test_async_writer_coalesces_and_surfaces_errors(tmp_path):
    """save_async queues per-name (newest wins) and read paths drain the queue;
    a failing write re-raises from wait()."""
    from ampnet_tpu.core.checkpoint import CheckpointManager

    class FakeState:
        def __init__(self, v):
            self.params = {"w": np.full((4,), v, np.float32)}
            self.batch_stats = {}
            self.opt_state = {}
            self.step = np.asarray(v)
            self.epoch = np.asarray(v)
            self.lr_scale = np.asarray(1.0, np.float32)

    mgr = CheckpointManager(str(tmp_path / "ck"))
    for v in (1, 2, 3):  # rapid-fire: later queued states supersede earlier ones
        mgr.save_async("best", FakeState(v))
    mgr.wait()
    assert mgr.exists("best")
    restored, _ = CheckpointManagerRestoreHelper(mgr, FakeState(0))
    assert float(restored["params"]["w"][0]) == 3.0
    assert int(np.asarray(restored["step"])) == 3

    bad = FakeState(9)
    bad.params = {"w": object()}  # unserializable leaf -> writer thread fails
    mgr.save_async("best", bad)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        mgr.wait()
    mgr.wait()  # error is consumed; manager stays usable
    mgr.save_async("best", FakeState(5))
    mgr.wait()


def CheckpointManagerRestoreHelper(mgr, template_state):
    """restore() needs a .replace()-style state; read the raw payload instead."""
    import orbax.checkpoint as ocp

    payload = mgr._payload(template_state)
    restored = ocp.PyTreeCheckpointer().restore(
        mgr.path("best") + "/state", item=payload
    )
    return restored, mgr.load_meta("best")


def test_resume_restores_state(trainer):
    import jax

    state_before = jax.device_get(trainer.state.params)
    step_before = int(trainer.state.step)
    # a fresh trainer resumes from the best checkpoint
    cfg = trainer.cfg
    ds = MemoryDataset()
    t2 = Trainer(
        cfg,
        AMPNetSegmenter(cfg.model),
        PaddedBatcher(ds, 3, n_points=96, max_windows=4, prefetch=0),
        None,
        trainer.workdir,
        name="t",
    )
    assert t2.resume()
    # restored params equal the checkpointed ones (which came from `trainer`)
    restored = jax.device_get(t2.state.params)
    ref = jax.device_get(trainer.ckpt.restore("t_best", trainer.state)[0].params)
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), restored, ref)
    assert max(jax.tree.leaves(diffs)) == 0.0
    assert step_before >= int(t2.state.step) >= 0
