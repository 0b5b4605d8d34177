"""Device-resident data cache: batch-for-batch parity with the host pipeline,
pad semantics, mesh sharding, and an identical seeded training trajectory.

The reference re-collates every batch on every epoch (DataLoader workers,
train_pointnet-attention.py:95-106); DeviceCachedBatcher keeps the padded
dataset in device memory and gathers batches on device instead."""

import jax
import numpy as np
import pytest

from ampnet_tpu.data.device_cache import (
    DeviceCachedBatcher,
    estimate_cache_bytes,
    maybe_device_cache,
)
from ampnet_tpu.data.pipeline import PaddedBatcher, SingleCloudBatcher, to_device_batch


class _ListDataset:
    """In-memory windowed dataset; every window already has exactly n_points
    points, so the host path draws no resampling randomness and the cache must
    reproduce its batches bit-for-bit."""

    def __init__(self, n_samples=7, n_points=32, max_w=3, seed=0, cls=False):
        rng = np.random.default_rng(seed)
        self.samples = []
        for i in range(n_samples):
            w = int(rng.integers(1, max_w + 1))
            s = {
                "points": rng.normal(size=(w, n_points, 9)).astype(np.float32),
                "labels": rng.integers(0, 5, size=(w, n_points)).astype(np.int64),
                "centroids": rng.normal(size=(w, 2)).astype(np.float32),
                "name": f"s{i}",
            }
            if cls:
                s["cls_label"] = np.int64(i % 2)
            self.samples.append(s)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def _assert_batches_equal(a, b):
    assert a["names"] == b["names"]
    for k in ("points", "labels", "centroids", "cls_label"):
        if k in a or k in b:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


@pytest.mark.parametrize("drop_last", [True, False])
def test_parity_with_host_batcher(drop_last):
    ds = _ListDataset()
    kw = dict(batch_size=3, n_points=32, max_windows=3, seed=5, drop_last=drop_last)
    host = PaddedBatcher(ds, prefetch=0, **kw)
    cached = DeviceCachedBatcher(PaddedBatcher(ds, prefetch=0, **kw))
    for _ in range(2):  # two epochs: different shuffles, both must match
        for hb, cb in zip(host, cached, strict=True):
            _assert_batches_equal(hb, cb)


def test_pad_to_multiple_marks_padding():
    ds = _ListDataset(n_samples=5)
    kw = dict(batch_size=4, n_points=32, max_windows=3, drop_last=False, pad_to_multiple=4)
    host = PaddedBatcher(ds, prefetch=0, **kw)
    cached = DeviceCachedBatcher(PaddedBatcher(ds, prefetch=0, **kw))
    for hb, cb in zip(host, cached, strict=True):
        _assert_batches_equal(hb, cb)
        assert cb["points"].shape[0] % 4 == 0
    # the padded tail entries are loss-ignored
    last = list(cached)[-1]
    assert (np.asarray(last["labels"])[1:] == -1).all()


def test_single_cloud_batcher_wrap():
    class _Flat:
        def __init__(self):
            rng = np.random.default_rng(3)
            self.s = [
                {
                    "points": rng.normal(size=(16, 9)).astype(np.float32),
                    "labels": rng.integers(0, 5, size=(16,)).astype(np.int64),
                    "name": f"c{i}",
                }
                for i in range(4)
            ]

        def __len__(self):
            return len(self.s)

        def __getitem__(self, i):
            return self.s[i]

    ds = _Flat()
    kw = dict(batch_size=2, n_points=16, seed=1)
    host = SingleCloudBatcher(ds, **kw, prefetch=0)
    cached = DeviceCachedBatcher(SingleCloudBatcher(ds, **kw, prefetch=0))
    for hb, cb in zip(host, cached, strict=True):
        _assert_batches_equal(hb, cb)


def test_cls_label_cached():
    ds = _ListDataset(cls=True)
    kw = dict(batch_size=3, n_points=32, max_windows=3, seed=2)
    host = PaddedBatcher(ds, prefetch=0, **kw)
    cached = DeviceCachedBatcher(PaddedBatcher(ds, prefetch=0, **kw))
    for hb, cb in zip(host, cached, strict=True):
        _assert_batches_equal(hb, cb)


def test_mesh_sharded_gather_parity():
    from ampnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    ds = _ListDataset(n_samples=16)
    kw = dict(batch_size=8, n_points=32, max_windows=3, seed=9)
    host = PaddedBatcher(ds, prefetch=0, **kw)
    cached = DeviceCachedBatcher(PaddedBatcher(ds, prefetch=0, **kw), mesh=mesh)
    for hb, cb in zip(host, cached, strict=True):
        _assert_batches_equal(hb, cb)
        shard_shapes = {s.data.shape[0] for s in cb["points"].addressable_shards}
        assert shard_shapes == {1}  # 8 clouds over 8 chips


def test_to_device_batch_passthrough():
    ds = _ListDataset(n_samples=4)
    cached = DeviceCachedBatcher(
        PaddedBatcher(ds, batch_size=2, n_points=32, max_windows=3, prefetch=0)
    )
    b = next(iter(cached))
    dev = to_device_batch(b)
    assert dev["points"] is b["points"]  # no host round-trip


def test_training_trajectory_identical():
    """Seeded end-to-end training must be bit-identical host vs device cache
    (augmentation randomness lives in the step, not the pipeline)."""
    from ampnet_tpu.core.config import AMPNetConfig, ModelConfig, TrainConfig
    from ampnet_tpu.models.amp import AMPNetSegmenter
    from ampnet_tpu.train.state import create_train_state
    from ampnet_tpu.train.step import make_step_fns

    cfg = AMPNetConfig(model=ModelConfig(), train=TrainConfig(learning_rate=1e-3))
    ds = _ListDataset(n_samples=6, n_points=32)
    kw = dict(batch_size=3, n_points=32, max_windows=3, seed=4)
    losses = {}
    for mode in ("host", "cache"):
        batcher = PaddedBatcher(ds, prefetch=0, **kw)
        if mode == "cache":
            batcher = DeviceCachedBatcher(batcher)
        model = AMPNetSegmenter(cfg.model)
        sample = to_device_batch(next(iter(batcher)))
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample, steps_per_epoch=2)
        train_step, _ = make_step_fns(cfg, augment=True)
        ls = []
        for _ in range(2):
            for batch in batcher:
                state, m = train_step(state, to_device_batch(batch))
                ls.append(float(m["loss"]))
        losses[mode] = ls
    np.testing.assert_allclose(losses["host"], losses["cache"], rtol=0, atol=0)


def test_epoch_indices_invariants_fuzz():
    """Property sweep over (n, batch_size, pad_multiple, drop_last): every
    epoch's index matrix is rectangular, covers each kept sample exactly once,
    and marks exactly the replicated entries as padding."""
    rng = np.random.default_rng(123)
    for _ in range(40):
        n = int(rng.integers(1, 12))
        bs = int(rng.integers(1, 7))
        m = int(rng.integers(1, 5))
        drop_last = bool(rng.integers(0, 2)) and n >= bs
        ds = _ListDataset(n_samples=n, n_points=8)
        b = DeviceCachedBatcher(
            PaddedBatcher(ds, bs, n_points=8, max_windows=3, prefetch=0,
                          drop_last=drop_last, pad_to_multiple=m)
        )
        idxs, pads, names = b.epoch_index_matrix()
        cfgmsg = f"n={n} bs={bs} m={m} drop_last={drop_last}"
        assert idxs.shape == pads.shape, cfgmsg
        if idxs.shape[0]:
            assert idxs.shape[1] % m == 0, cfgmsg
            assert idxs.shape[1] >= bs, cfgmsg
        real = idxs[~pads].tolist()
        if drop_last:
            # a subset of distinct samples, one batch-multiple's worth
            assert len(real) == len(b) * bs, cfgmsg
            assert len(set(real)) == len(real), cfgmsg
        else:
            # every sample exactly once
            assert sorted(real) == list(range(n)), cfgmsg
        assert (idxs >= 0).all() and (idxs < n).all(), cfgmsg


def test_maybe_device_cache_policy():
    ds = _ListDataset(n_samples=4)
    mk = lambda: PaddedBatcher(ds, batch_size=2, n_points=32, max_windows=3, prefetch=0)
    assert isinstance(maybe_device_cache(mk(), mode="on"), DeviceCachedBatcher)
    assert isinstance(maybe_device_cache(mk(), mode="off"), PaddedBatcher)
    assert maybe_device_cache(None, mode="on") is None
    # auto with a tiny limit falls back to the host batcher
    small = maybe_device_cache(mk(), mode="auto", limit_bytes=10)
    assert isinstance(small, PaddedBatcher)
    est = estimate_cache_bytes(mk())
    assert est > 0
    with pytest.raises(MemoryError):
        DeviceCachedBatcher(mk(), limit_bytes=10)
    with pytest.raises(ValueError):
        maybe_device_cache(mk(), mode="bogus")


def test_repeats_oversampling_host_and_cache_agree():
    """PaddedBatcher.repeats (rare-class oversampling): sample i appears
    repeats[i] times per epoch, batch counts follow the repeated total, the
    device cache stores each sample ONCE but repeats the epoch ORDER, and both
    sides draw the identical shuffled sequence (same seeded rng)."""
    ds = _ListDataset(n_samples=5, n_points=16, max_w=2)
    reps = np.array([1, 3, 1, 2, 1])
    host = PaddedBatcher(ds, 2, n_points=16, max_windows=2, seed=3,
                         prefetch=0, drop_last=False, repeats=reps)
    assert len(host) == (reps.sum() + 1) // 2
    names_host = [n for b in host for n in b["names"]]
    from collections import Counter
    c = Counter(n for n in names_host if not n.startswith("<pad:"))
    assert c == {"s0": 1, "s1": 3, "s2": 1, "s3": 2, "s4": 1}

    cached = DeviceCachedBatcher(
        PaddedBatcher(ds, 2, n_points=16, max_windows=2, seed=3,
                      prefetch=0, drop_last=False, repeats=reps))
    # the cache holds each sample once; the epoch order repeats
    assert len(cached.names) == len(ds)
    assert len(cached) == len(host)
    names_cache = [n for b in cached for n in b["names"]]
    assert names_cache == names_host
    # whole-epoch scan matrix covers the same repeated total
    idxs, pads, _ = cached.epoch_index_matrix()
    assert int((~pads).sum()) == int(reps.sum())

    with pytest.raises(ValueError, match="repeats"):
        PaddedBatcher(ds, 2, repeats=np.array([1, 2]))  # wrong length
    with pytest.raises(ValueError, match="repeats"):
        PaddedBatcher(ds, 2, repeats=np.zeros(5, int))  # non-positive
