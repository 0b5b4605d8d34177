"""Host input pipeline: padded static-shape batches with background prefetch.

Replaces DataLoader + ``collate_seq_padd``/``collate_cls_padd``
(``pointNet/collate_fns.py:4-113``). Contract of every emitted batch::

    points     [B, W, N, F] float32  — windows replicate-padded to W=max_windows
    labels     [B, W, N]    int32    — padded windows are all −1 (loss-ignored)
    centroids  [B, W, 2]    float32  — replicate-padded
    cls_label  [B]          int32    — only for classification tasks
    names      list[str]             — host-side only

Point-axis resampling uses ONE index list shared across a cloud's windows, exactly
like the reference collate (``collate_fns.py:33-41`` indexes the [N, dims, W] array on
the first axis). Batches are produced by a daemon thread into a bounded queue so host
preprocessing overlaps device compute (the TPU-side analog of DataLoader workers).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np

_POOL_DATASET = None


def _pool_init(dataset):
    global _POOL_DATASET
    _POOL_DATASET = dataset


def _pool_get(i):
    return _POOL_DATASET[i]


def pad_windowed_sample(
    sample: Dict[str, np.ndarray],
    n_points: int,
    max_windows: int,
    rng: np.random.Generator,
) -> Dict[str, np.ndarray]:
    """Resample the point axis to ``n_points`` and replicate-pad windows to
    ``max_windows`` (collate_seq_padd semantics)."""
    pts, lbl, cent = sample["points"], sample["labels"], sample["centroids"]
    w, n, f = pts.shape

    if n < n_points:  # sample WITH replacement (torch.randint path)
        idx = rng.integers(0, n, n_points)
    elif n > n_points:  # sample WITHOUT replacement (random.sample path)
        idx = rng.permutation(n)[:n_points]
    else:
        idx = None
    if idx is not None:
        pts, lbl = pts[:, idx, :], lbl[:, idx]

    if w > max_windows:
        pts, lbl, cent = pts[:max_windows], lbl[:max_windows], cent[:max_windows]
        w = max_windows
    if w < max_windows:
        reps = max_windows - w
        pts = np.concatenate([pts, np.repeat(pts[-1:], reps, axis=0)], axis=0)
        cent = np.concatenate([cent, np.repeat(cent[-1:], reps, axis=0)], axis=0)
        lbl = np.concatenate([lbl, np.full((reps, n_points), -1, lbl.dtype)], axis=0)

    out = dict(sample, points=pts, labels=lbl, centroids=cent)
    return out


class PaddedBatcher:
    """Iterable over static-shape batches with optional background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        n_points: int = 2048,
        max_windows: int = 9,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        pad_to_multiple: int = 1,
        workers: int = 0,
        repeats=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.n_points = n_points
        self.max_windows = max_windows
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.pad_to_multiple = pad_to_multiple
        # worker processes for sample loading (the reference's DataLoader
        # num_workers / mp.Pool host parallelism); 0 = load in the prefetch thread
        self.workers = workers
        self._pool = None
        self.epoch = 0
        # per-sample epoch multiplicities (rare-class oversampling): sample i
        # appears repeats[i] times in every epoch's order before shuffling.
        # Integer and fixed across epochs, so batch counts (and the device
        # cache's whole-epoch scan shapes) stay static. None = all ones.
        if repeats is not None:
            repeats = np.asarray(repeats, np.int64)
            if repeats.shape != (len(dataset),) or (repeats < 1).any():
                raise ValueError(
                    "repeats must hold one positive int per dataset sample"
                )
        self.repeats = repeats

    def _base_indices(self) -> np.ndarray:
        """Epoch index pool before shuffling: each sample at its multiplicity."""
        if self.repeats is None:
            return np.arange(len(self.dataset))
        return np.repeat(np.arange(len(self.dataset)), self.repeats)

    def _load_samples(self, idxs):
        if self.workers <= 0:
            return [self.dataset[int(i)] for i in idxs]
        if self._pool is None:
            import multiprocessing as mp

            self._pool = mp.get_context("fork").Pool(
                self.workers, initializer=_pool_init, initargs=(self.dataset,)
            )
        return self._pool.map(_pool_get, [int(i) for i in idxs])

    def _pad_batch_to_multiple(self, batch):
        """Pad a short batch up to a multiple of `pad_to_multiple` clouds by
        replicating earlier samples with all labels −1 — loss-ignored and
        attention-masked, so data-parallel sharding always divides evenly."""
        m = self.pad_to_multiple
        b = batch["points"].shape[0]
        if m <= 1 or b % m == 0:
            return batch
        reps = m - b % m
        idx = np.arange(reps) % b
        out = dict(batch)
        for k in ("points", "centroids"):
            out[k] = np.concatenate([batch[k], batch[k][idx]], axis=0)
        pad_lbl = np.full_like(batch["labels"][idx], -1)
        out["labels"] = np.concatenate([batch["labels"], pad_lbl], axis=0)
        if "cls_label" in batch:
            # padded clouds carry no classification loss/metric weight either
            # (weighted CE ignore_index + confusion both drop −1 targets)
            pad_cls = np.full_like(batch["cls_label"][idx], -1)
            out["cls_label"] = np.concatenate([batch["cls_label"], pad_cls], axis=0)
        out["names"] = batch["names"] + [f"<pad:{batch['names'][i]}>" for i in idx]
        return out

    def __len__(self) -> int:
        n = len(self._base_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self, rng: np.random.Generator) -> np.ndarray:
        """Sample order for one epoch; subclasses shard this across hosts."""
        order = self._base_indices()
        if self.shuffle:
            rng.shuffle(order)
        return order

    def _make_batches(self, rng: np.random.Generator) -> Iterator[Dict]:
        order = self._epoch_order(rng)
        n_batches = len(self)
        for b in range(n_batches):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            samples = [
                pad_windowed_sample(s, self.n_points, self.max_windows, rng)
                for s in self._load_samples(idxs)
            ]
            batch = {
                "points": np.stack([s["points"] for s in samples]),
                "labels": np.stack([s["labels"] for s in samples]),
                "centroids": np.stack([s["centroids"] for s in samples]),
                "names": [s["name"] for s in samples],
            }
            if "cls_label" in samples[0]:
                batch["cls_label"] = np.asarray([s["cls_label"] for s in samples])
            yield self._pad_batch_to_multiple(batch)

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        if self.prefetch <= 0:
            yield from self._make_batches(rng)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        err: list = []

        def producer():
            try:
                for batch in self._make_batches(rng):
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except Exception as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                # the sentinel must be delivered even when the queue is full at
                # producer exit (consumer mid-batch on a slow device step): a
                # dropped sentinel deadlocks the consumer's q.get() after it
                # drains the remaining batches. Keep trying until delivered or
                # the consumer abandons the iterator (stop set).
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                try:
                    item = q.get(timeout=1.0)
                except queue.Empty:
                    # producer died without a sentinel (crash path): don't hang
                    if not t.is_alive():
                        break
                    continue
                if item is sentinel:
                    break
                yield item
        finally:
            # an abandoned iterator (e.g. a single next() to peek a sample)
            # must not leave the producer thread alive filling the queue
            stop.set()
        if err:
            raise err[0]


class SingleCloudBatcher(PaddedBatcher):
    """Batcher for whole-cloud datasets (CloudDataset): presents each cloud as a
    one-window sample so the same [B, W, N, F] contract serves the baseline models
    (replaces the default torch collate used by baseline/train_segmentation.py)."""

    def __init__(self, dataset, batch_size, n_points=4096, **kw):
        kw.pop("max_windows", None)
        super().__init__(dataset, batch_size, n_points=n_points, max_windows=1, **kw)

    def _make_batches(self, rng: np.random.Generator) -> Iterator[Dict]:
        order = self._epoch_order(rng)
        for b in range(len(self)):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            samples = []
            for s in self._load_samples(idxs):
                pts, lbl = s["points"][None], s["labels"][None]  # [1, N, F], [1, N]
                cent = pts[:, :, :2].mean(axis=1)
                samples.append(dict(s, points=pts, labels=lbl, centroids=cent))
            samples = [
                pad_windowed_sample(s, self.n_points, 1, rng) for s in samples
            ]
            batch = {
                "points": np.stack([s["points"] for s in samples]),
                "labels": np.stack([s["labels"] for s in samples]),
                "centroids": np.stack([s["centroids"] for s in samples]),
                "names": [s["name"] for s in samples],
            }
            if "cls_label" in samples[0]:
                batch["cls_label"] = np.asarray([s["cls_label"] for s in samples])
            yield self._pad_batch_to_multiple(batch)


class HostShardedBatcher(PaddedBatcher):
    """Per-host shard loading for multi-host (multi-process) training.

    The reference has no distributed backend at all (SURVEY §2.6); this is the
    TPU-native input side of it: every host draws the SAME seeded global epoch
    permutation, then loads only its ``1/host_count`` interleaved slice of each
    global batch — so a GB-scale dataset never materializes on one host and the
    union of all hosts' batches is exactly the single-host epoch. Pair with
    ``global_device_batch`` to assemble the global jax.Array
    (``jax.make_array_from_process_local_data``) for a pjit-sharded train step.

    ``host_id``/``host_count`` default to ``jax.process_index()/count()`` so the
    same code runs single-host (1/1) and multi-host unchanged.
    """

    def __init__(
        self,
        dataset,
        global_batch_size: int,
        host_id: int = None,
        host_count: int = None,
        **kw,
    ):
        if host_id is None or host_count is None:
            import jax

            host_id = jax.process_index() if host_id is None else host_id
            host_count = jax.process_count() if host_count is None else host_count
        if global_batch_size % host_count:
            raise ValueError(
                f"global_batch_size {global_batch_size} not divisible by "
                f"host_count {host_count}"
            )
        if kw.get("drop_last") is False:
            # a partial global batch cannot be split evenly across hosts, and
            # jax.make_array_from_process_local_data requires equal per-host
            # contributions — pad the dataset (pad_to_multiple) instead
            raise ValueError("HostShardedBatcher requires drop_last=True")
        self.host_id = host_id
        self.host_count = host_count
        self.global_batch_size = global_batch_size
        super().__init__(dataset, batch_size=global_batch_size // host_count, **kw)

    def __len__(self) -> int:
        return len(self._base_indices()) // self.global_batch_size

    def _epoch_order(self, rng: np.random.Generator) -> np.ndarray:
        # identical global permutation on every host (same seed+epoch), then an
        # interleaved per-host slice of each global batch
        order = super()._epoch_order(rng)
        n = len(self) * self.global_batch_size
        order = order[:n].reshape(-1, self.host_count, self.batch_size)
        return order[:, self.host_id].reshape(-1)


def global_device_batch(local_batch: Dict, mesh) -> Dict:
    """Assemble a GLOBAL batch-sharded jax.Array from this host's local batch.

    Each host contributes its HostShardedBatcher slice; the result behaves like a
    device_put of the concatenated global batch sharded over the mesh's 'data'
    axis (single-host this degenerates to exactly that)."""
    import jax

    from ampnet_tpu.parallel.mesh import batch_sharding

    sh = batch_sharding(mesh)
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.make_array_from_process_local_data(sh, v)
    return out


def to_device_batch(batch: Dict, mesh=None) -> Dict:
    """Move the array fields of a host batch onto the device(s). Fields that are
    already jax.Arrays (DeviceCachedBatcher output) pass through untouched —
    they were gathered on device with the right sharding."""
    import jax
    import jax.numpy as jnp

    out = {k: v for k, v in batch.items() if isinstance(v, jax.Array)}
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    if mesh is not None:
        from ampnet_tpu.parallel.mesh import batch_sharding

        sh = batch_sharding(mesh)
        out.update({k: jax.device_put(v, sh) for k, v in arrays.items()})
    else:
        out.update({k: jnp.asarray(v) for k, v in arrays.items()})
    return out
