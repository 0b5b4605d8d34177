"""Dataset + batching pipeline tests over reference-format artifacts."""

import os

import numpy as np
import pytest

from ampnet_tpu.data.datasets import (
    CloudDataset,
    EvalCloudDataset,
    WindowedCloudDataset,
)
from ampnet_tpu.data.io_utils import load_cloud, read_split_list, save_cloud, write_split_list
from ampnet_tpu.data.pipeline import PaddedBatcher, pad_windowed_sample
from ampnet_tpu.data.synthetic import synthetic_scene


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    """Reference-format artifacts: kmeans_<f>.pt windowed tensors + <f>.pkl clouds."""
    torch = pytest.importorskip("torch")
    d = tmp_path_factory.mktemp("artifacts")
    rng = np.random.default_rng(7)
    names = []
    for i, w in enumerate([1, 2, 4]):
        scenes = [synthetic_scene(rng, n_points=300, with_noise_classes=True) for _ in range(w)]
        stack = np.stack([s[:300] for s in scenes], axis=2)  # [N, 13, W]
        name = f"tower_sample{i}"
        torch.save(torch.from_numpy(stack), os.path.join(d, f"kmeans_{name}.pt"))
        save_cloud(os.path.join(d, f"{name}.pkl"), scenes[0])
        names.append(name)
    return str(d), names


class TestWindowedCloudDataset:
    def test_shapes_and_labels(self, artifact_dir):
        d, names = artifact_dir
        ds = WindowedCloudDataset(d, [n + ".pt" for n in names])
        s = ds[2]
        w, n, f = s["points"].shape
        assert f == 9 and w == 4
        assert s["labels"].shape == (w, n)
        assert s["centroids"].shape == (w, 2)
        assert set(np.unique(s["labels"])) <= {0, 1, 2, 3, 4}

    def test_noise_dropped(self, artifact_dir):
        d, names = artifact_dir
        ds = WindowedCloudDataset(d, names)
        raw = load_cloud(os.path.join(d, f"kmeans_{names[0]}.pt"))
        n_noise = np.isin(raw[:, 3, :], [30, 7, 2, 8, 13]).any(axis=1).sum()
        s = ds[0]
        assert s["points"].shape[1] == raw.shape[0] - n_noise

    def test_xy_rescaled(self, artifact_dir):
        d, names = artifact_dir
        s = WindowedCloudDataset(d, names)[0]
        assert s["points"][..., 0].min() >= -1.001 and s["points"][..., 0].max() <= 1.001

    def test_cls_label(self, artifact_dir):
        d, names = artifact_dir
        ds = WindowedCloudDataset(d, names, task="classification")
        assert ds[0]["cls_label"] == 1  # synthetic scenes contain towers


class TestFixedCloudDataset:
    def test_resampling_down_and_up(self, artifact_dir):
        d, names = artifact_dir
        for npts in (64, 1024):
            ds = CloudDataset(d, [n + ".pkl" for n in names], number_of_points=npts)
            s = ds[0]
            assert s["points"].shape == (npts, 9)
            assert s["labels"].shape == (npts,)

    def test_seven_feature_mode(self, artifact_dir):
        d, names = artifact_dir
        ds = CloudDataset(
            d, [n + ".pkl" for n in names], number_of_points=64, feature_mode="seven",
            task="classification",
        )
        s = ds[0]
        assert s["points"].shape == (64, 7)
        assert s["cls_label"] == 1  # 'tower_' filename prefix


class TestPaddedBatcher:
    def _ds(self, artifact_dir):
        d, names = artifact_dir
        return WindowedCloudDataset(d, names)

    def test_batch_shapes(self, artifact_dir):
        ds = self._ds(artifact_dir)
        b = next(iter(PaddedBatcher(ds, 3, n_points=128, max_windows=5, drop_last=False)))
        assert b["points"].shape == (3, 5, 128, 9)
        assert b["labels"].shape == (3, 5, 128)
        assert b["centroids"].shape == (3, 5, 2)
        assert len(b["names"]) == 3

    def test_padded_windows_are_replicated_and_masked(self, artifact_dir):
        ds = self._ds(artifact_dir)
        s = pad_windowed_sample(ds[0], 64, 5, np.random.default_rng(0))  # 1 real window
        # replicate padding copies the last real window's points
        np.testing.assert_array_equal(s["points"][1], s["points"][0])
        np.testing.assert_array_equal(s["centroids"][1], s["centroids"][0])
        assert (s["labels"][1:] == -1).all()
        assert (s["labels"][0] >= 0).all()

    def test_window_cap(self, artifact_dir):
        ds = self._ds(artifact_dir)
        s = pad_windowed_sample(ds[2], 64, 2, np.random.default_rng(0))  # 4 real → cap 2
        assert s["points"].shape[0] == 2

    def test_drop_last(self, artifact_dir):
        ds = self._ds(artifact_dir)
        assert len(PaddedBatcher(ds, 2, drop_last=True)) == 1
        assert len(PaddedBatcher(ds, 2, drop_last=False)) == 2

    def test_prefetch_equals_sync(self, artifact_dir):
        ds = self._ds(artifact_dir)
        a = list(PaddedBatcher(ds, 1, n_points=64, shuffle=False, seed=5, prefetch=2))
        b = list(PaddedBatcher(ds, 1, n_points=64, shuffle=False, seed=5, prefetch=0))
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["points"], y["points"])

    def test_epochs_reshuffle(self, artifact_dir):
        ds = self._ds(artifact_dir)
        batcher = PaddedBatcher(ds, 3, n_points=32, shuffle=True, drop_last=False, seed=1)
        e1 = next(iter(batcher))["names"]
        e2 = next(iter(batcher))["names"]
        assert sorted(e1) == sorted(e2)


def test_split_list_roundtrip(tmp_path):
    p = str(tmp_path / "train_seg_files.txt")
    write_split_list(p, ["a.pt", "b.pt"])
    assert read_split_list(p) == ["a.pt", "b.pt"]


def test_test_cloud_dataset(artifact_dir):
    d, names = artifact_dir
    ds = EvalCloudDataset(d, [n + ".pkl" for n in names])
    s = ds[0]
    assert s["points"].shape[1] == 9
    assert s["labels"].shape[0] == s["points"].shape[0]
    assert s["raw_class"].shape[0] == s["points"].shape[0]


def test_pad_to_multiple(artifact_dir):
    d, names = artifact_dir
    ds = WindowedCloudDataset(d, names)  # 3 samples
    batcher = PaddedBatcher(ds, 3, n_points=32, max_windows=2, drop_last=False,
                            pad_to_multiple=8, shuffle=False, prefetch=0)
    b = next(iter(batcher))
    assert b["points"].shape[0] == 8
    # padded clouds: replicated points, all labels -1, tagged names
    assert (b["labels"][3:] == -1).all()
    assert all(n.startswith("<pad:") for n in b["names"][3:])
    np.testing.assert_array_equal(b["points"][3], b["points"][0])


def test_worker_pool_loading_matches(artifact_dir):
    d, names = artifact_dir
    ds = WindowedCloudDataset(d, names)
    a = list(PaddedBatcher(ds, 1, n_points=64, shuffle=False, seed=3, prefetch=0))
    b = list(PaddedBatcher(ds, 1, n_points=64, shuffle=False, seed=3, prefetch=0,
                           workers=2))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["points"], y["points"])
        np.testing.assert_array_equal(x["labels"], y["labels"])


class _IndexDataset:
    """Samples carry their identity so shard coverage is checkable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "points": rng.normal(size=(2, 16, 9)).astype(np.float32),
            "labels": np.full((2, 16), i % 5, np.int32),
            "centroids": rng.normal(size=(2, 2)).astype(np.float32),
            "name": f"s{i}",
        }


class TestHostShardedBatcher:
    def test_hosts_partition_each_global_batch(self):
        from ampnet_tpu.data.pipeline import HostShardedBatcher

        n, gb, hosts = 23, 8, 4
        shards = [
            HostShardedBatcher(_IndexDataset(n), gb, host_id=h, host_count=hosts,
                               n_points=16, max_windows=2, seed=3, prefetch=0)
            for h in range(hosts)
        ]
        per_host = [list(s) for s in shards]
        n_batches = n // gb
        assert all(len(p) == n_batches for p in per_host)
        seen = set()
        for b in range(n_batches):
            batch_names = []
            for p in per_host:
                assert p[b]["points"].shape == (gb // hosts, 2, 16, 9)
                batch_names += p[b]["names"]
            # the union of host slices is one full global batch, no overlap
            assert len(set(batch_names)) == gb
            assert not (set(batch_names) & seen)
            seen |= set(batch_names)
        assert len(seen) == n_batches * gb  # epoch coverage (drop_last trim)

    def test_single_host_degenerates_to_padded_batcher(self):
        from ampnet_tpu.data.pipeline import HostShardedBatcher

        ds = _IndexDataset(12)
        a = PaddedBatcher(ds, 4, n_points=16, max_windows=2, seed=1, prefetch=0)
        b = HostShardedBatcher(ds, 4, host_id=0, host_count=1,
                               n_points=16, max_windows=2, seed=1, prefetch=0)
        for ba, bb in zip(a, b):
            np.testing.assert_array_equal(ba["points"], bb["points"])
            assert ba["names"] == bb["names"]

    def test_global_device_batch_matches_device_put(self):
        import jax

        from ampnet_tpu.data.pipeline import HostShardedBatcher, global_device_batch
        from ampnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(4)
        ds = _IndexDataset(8)
        sb = HostShardedBatcher(ds, 8, host_id=0, host_count=1,
                                n_points=16, max_windows=2, seed=0, prefetch=0)
        local = next(iter(sb))
        g = global_device_batch(local, mesh)
        assert g["points"].shape == (8, 2, 16, 9)
        np.testing.assert_array_equal(np.asarray(g["points"]), local["points"])
        assert len(g["points"].sharding.device_set) == 4


def test_abandoned_prefetch_iterator_stops_producer(artifact_dir):
    """Peeking one batch (Trainer.__init__ does next(iter(...))) must not leave
    the prefetch producer thread alive filling the queue."""
    import gc
    import threading
    import time as _time

    d, names = artifact_dir
    ds = WindowedCloudDataset(d, [n + ".pt" for n in names])
    before = threading.active_count()
    it = iter(PaddedBatcher(ds, 1, n_points=64, max_windows=2, prefetch=2))
    next(it)
    del it
    gc.collect()
    deadline = _time.time() + 5
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() == before


def test_prefetch_sentinel_survives_full_queue():
    """Regression: when the producer finished while the prefetch queue was FULL
    (consumer mid-batch on a slow device step), the end-of-epoch sentinel was
    dropped and the consumer deadlocked on q.get() after draining the queue.
    Deterministic repro: n_batches == prefetch depth and a consumer that only
    starts draining after the producer has exhausted the dataset."""
    import threading
    import time

    from ampnet_tpu.data.pipeline import PaddedBatcher

    # batch_size 1 -> 4 batches, prefetch 3: consume ONE batch (starting the
    # producer), then stall — the producer enqueues the remaining 3 (queue
    # full) and exhausts, so its sentinel hits a full queue.
    n = 4
    b = PaddedBatcher(_IndexDataset(n), 1, n_points=16, max_windows=2,
                      shuffle=False, seed=0, prefetch=3)
    got = []

    def consume():
        it = iter(b)
        got.append(next(it)["names"])  # starts the producer thread
        time.sleep(1.0)  # producer fills the queue and finishes
        for batch in it:
            got.append(batch["names"])

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=20.0)
    assert not t.is_alive(), "prefetch consumer deadlocked waiting for sentinel"
    assert len(got) == n
