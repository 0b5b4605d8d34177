"""Whole-epoch lax.scan dispatch (train/epoch.py): trajectory identity with the
per-step device-cache path, Trainer integration, and the mesh variant."""

import numpy as np
import pytest

from ampnet_tpu.core.config import AMPNetConfig, ModelConfig, TrainConfig
from ampnet_tpu.data.device_cache import DeviceCachedBatcher
from ampnet_tpu.data.pipeline import PaddedBatcher, to_device_batch
from ampnet_tpu.models.amp import AMPNetSegmenter
from ampnet_tpu.train.trainer import Trainer

from tests.test_trainer import MemoryDataset


@pytest.fixture(scope="module")
def cfg():
    return AMPNetConfig(train=TrainConfig(batch_size=3, learning_rate=3e-3, epochs=2))


def _mk_trainer(cfg, tmpdir, epoch_dispatch, seed=0, mesh=None, drop_last=True,
                n_items=7, batch_size=3):
    ds = MemoryDataset(n_items=n_items)
    kw = dict(n_points=96, max_windows=4, prefetch=0, drop_last=drop_last)
    if mesh is not None:
        kw["pad_to_multiple"] = mesh.devices.size
    train = DeviceCachedBatcher(PaddedBatcher(ds, batch_size, seed=seed, **kw), mesh=mesh)
    val = DeviceCachedBatcher(PaddedBatcher(ds, batch_size, seed=seed + 1, **kw), mesh=mesh)
    return Trainer(
        cfg, AMPNetSegmenter(cfg.model), train, val, tmpdir, name="t",
        mesh=mesh, epoch_dispatch=epoch_dispatch,
    )


def _losses(history):
    return [m["loss"] for m in history["train"]] + [m["loss"] for m in history["val"]]


def test_trajectory_matches_per_step(cfg, tmp_path):
    """Seeded fit() must produce bit-identical metrics with and without the
    fused epoch program when batches are uniform (drop_last)."""
    h_step = _mk_trainer(cfg, str(tmp_path / "a"), "off").fit(2)
    h_scan = _mk_trainer(cfg, str(tmp_path / "b"), "auto").fit(2)
    np.testing.assert_allclose(_losses(h_step), _losses(h_scan), rtol=0, atol=0)
    for ms, mf in zip(h_step["train"], h_scan["train"]):
        assert ms.keys() == mf.keys()
        np.testing.assert_allclose(
            [ms["miou"], ms["accuracy"]], [mf["miou"], mf["accuracy"]], atol=0
        )


def test_ragged_last_batch_runs(cfg, tmp_path):
    """drop_last=False: the fused path pads the last batch to full width
    (replicate entries, labels −1). Not bit-identical to the per-step path —
    the padded windows join BN batch statistics — but must train fine."""
    h = _mk_trainer(cfg, str(tmp_path), "auto", drop_last=False).fit(2)
    assert len(h["train"]) == 2
    assert all(np.isfinite(m["loss"]) for m in h["train"] + h["val"])


def test_epoch_dispatch_used(cfg, tmp_path):
    tr = _mk_trainer(cfg, str(tmp_path), "auto")
    assert tr._use_epoch_dispatch(tr.train_data)
    tr.fit(1)
    assert tr._epoch_fns  # the scan programs were actually built


def test_host_batcher_falls_back(cfg, tmp_path):
    ds = MemoryDataset()
    train = PaddedBatcher(ds, 3, n_points=96, max_windows=4, prefetch=0)
    tr = Trainer(cfg, AMPNetSegmenter(cfg.model), train, None, str(tmp_path), name="t")
    assert not tr._use_epoch_dispatch(tr.train_data)


def test_mesh_epoch_dispatch_matches_single_device(cfg, tmp_path):
    from ampnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    # batch size divisible by the mesh so neither arm pads (padding would
    # change BN statistics and the T-Net regularizer, not a sharding effect)
    h1 = _mk_trainer(cfg, str(tmp_path / "s"), "auto", n_items=16, batch_size=8).fit(1)
    h8 = _mk_trainer(
        cfg, str(tmp_path / "m"), "auto", mesh=mesh, n_items=16, batch_size=8
    ).fit(1)
    # same batches, same math up to reduction order across shards (the val
    # loss compounds one train step of psum-order noise through the params)
    np.testing.assert_allclose(_losses(h1), _losses(h8), rtol=1e-3)


def test_resume_continues_under_epoch_dispatch(cfg, tmp_path):
    """Checkpoint resume works with the fused epoch path: counters restore,
    training continues, and the step counter keeps advancing (augmentation RNG
    and LR schedule key off state.step)."""
    t1 = _mk_trainer(cfg, str(tmp_path), "auto")
    t1.fit(2)
    step_after_2 = int(np.asarray(t1.state.step))
    t2 = _mk_trainer(cfg, str(tmp_path), "auto")
    assert t2.resume()
    assert t2.epoch == int(np.asarray(t2.state.epoch))
    h = t2.fit(4)  # continues from the restored epoch
    assert len(h["train"]) >= 1
    # steps continue strictly PAST the pre-resume count (a silent counter
    # reset would break the augmentation RNG and LR schedule)
    assert int(np.asarray(t2.state.step)) > step_after_2
    assert all(np.isfinite(m["loss"]) for m in h["train"])


def test_epoch_index_matrix_pad_multiple_not_dividing_batch():
    """pad_to_multiple that doesn't divide batch_size: full batches round UP
    past batch_size — the matrix must still be rectangular."""
    ds = MemoryDataset(n_items=8)
    b = DeviceCachedBatcher(
        PaddedBatcher(ds, 6, n_points=96, max_windows=4, prefetch=0,
                      drop_last=False, pad_to_multiple=4)
    )
    idxs, pads, names = b.epoch_index_matrix()
    assert idxs.shape == (2, 8) and pads.shape == (2, 8)  # 6 -> 8, 2 -> 8
    assert pads[0].sum() == 2 and pads[1].sum() == 6


def test_epoch_index_matrix_rectangular():
    ds = MemoryDataset(n_items=7)
    b = DeviceCachedBatcher(
        PaddedBatcher(ds, 3, n_points=96, max_windows=4, prefetch=0, drop_last=False)
    )
    idxs, pads, names = b.epoch_index_matrix()
    assert idxs.shape == (3, 3) and pads.shape == (3, 3)
    assert pads[-1].sum() == 2  # 7 = 3+3+1 -> last batch padded by 2
    assert len(names) == 3 and all(len(n) == 3 for n in names)
    # iterator path must agree with the matrix path on epoch ordering
    b2 = DeviceCachedBatcher(
        PaddedBatcher(ds, 3, n_points=96, max_windows=4, prefetch=0, drop_last=False)
    )
    it_names = [bt["names"] for bt in b2]
    flat_matrix = [n for row in names for n in row if not n.startswith("<pad:")]
    flat_iter = [n for row in it_names for n in row if not n.startswith("<pad:")]
    assert flat_matrix == flat_iter
