"""Device-resident training data: pad once, upload once, gather batches on device.

The reference re-loads and re-collates every batch from disk on every epoch
through DataLoader workers (``train_pointnet-attention.py:95-106``); its input
cost is paid ``epochs x steps`` times. On this framework the padded dataset is
small — the flagship geometry is ``[clouds, 9, 2048, 9]`` float32, ~0.6 MB per
cloud — while the measured end-to-end hardware training wall is host input on a
1-core VM (device step 45 ms, epoch wall ~3x that). The TPU-native fix is to
keep the *dataset* in HBM instead of re-staging batches:

* every sample is padded to the static ``[W, N, F]`` shape ONCE (reusing the
  exact ``pad_windowed_sample`` / ``SingleCloudBatcher`` semantics of the host
  path), stacked, and uploaded a single time;
* each training step then gathers its batch on device from the cached arrays —
  per-step host work collapses to producing a ``[B]`` int32 index vector;
* augmentation already runs on device inside the jitted train step, so epochs
  need nothing else from the host.

Under a mesh the cache is replicated (it is MBs, parameters-sized) and the
gather is jitted with the batch output sharded over ``'data'`` — each chip
gathers its own shard locally, no collectives.

Semantics vs the host ``PaddedBatcher``: identical batches (same seed, same
epoch order, same padding) whenever stored windows already have ``n_points``
points — the universal case for balanced-k-means artifacts. Clouds whose point
count differs are resampled ONCE at cache build (host path re-draws per epoch);
that per-epoch resampling noise is the only behavioral difference and is
documented here rather than silently changed.
"""

from __future__ import annotations

import copy
import sys
from typing import Dict, Iterator, Optional

import numpy as np

# refuse to cache datasets that would not comfortably fit next to the model +
# activations in HBM (v5e has 16 GB); the CLI falls back to the host path
DEFAULT_LIMIT_BYTES = 4 * 1024**3


def estimate_cache_bytes(batcher) -> int:
    """Padded size of the whole dataset: one padded sample x dataset length."""
    n = len(batcher.dataset)
    if n == 0:
        return 0
    loader = _single_sample_loader(batcher)
    rng = np.random.default_rng(batcher.seed)
    first = next(iter(loader._make_batches(rng)))
    per = sum(v.nbytes for v in first.values() if isinstance(v, np.ndarray))
    return per * n


def _single_sample_loader(batcher):
    """A shallow copy of the host batcher that emits one padded sample per batch
    in dataset order — reuses the exact padding semantics of the wrapped class
    (PaddedBatcher or SingleCloudBatcher)."""
    loader = copy.copy(batcher)
    loader.batch_size = 1
    loader.shuffle = False
    loader.drop_last = False
    loader.pad_to_multiple = 1
    loader.prefetch = 0
    # the cache stores each sample exactly ONCE — oversampling multiplicities
    # apply to the epoch order (DeviceCachedBatcher._epoch_indices), not here
    loader.repeats = None
    # one-sample batches gain nothing from a worker pool (pool.map over a
    # single index per batch) — and a copied pool would leak its processes
    loader.workers = 0
    loader._pool = None
    return loader


def gather_batch(data: Dict, idx, pad_mask):
    """On-device batch gather from the cache; replicated pad entries get all
    targets −1 so the weighted-CE ignore_index and the confusion matrix drop
    them (seg labels like ``PaddedBatcher._pad_batch_to_multiple``; cls_label
    too — duplicated clouds must not carry classification loss/metric weight).
    Pure, jit/scan-composable."""
    import jax.numpy as jnp

    out = {k: v[idx] for k, v in data.items()}
    for key in ("labels", "cls_label"):
        if key in out:
            t = out[key]
            m = pad_mask.reshape((-1,) + (1,) * (t.ndim - 1))
            out[key] = jnp.where(m, jnp.asarray(-1, t.dtype), t)
    return out


class DeviceCachedBatcher:
    """Wrap a ``PaddedBatcher``/``SingleCloudBatcher``; serve its batches from a
    device-resident cache via an on-device gather."""

    def __init__(self, inner, mesh=None, limit_bytes: int = DEFAULT_LIMIT_BYTES):
        from ampnet_tpu.data.pipeline import HostShardedBatcher

        if isinstance(inner, HostShardedBatcher):
            # each host sees only its 1/host_count slice — caching that slice
            # would silently change the epoch distribution; multi-host input
            # stays on the host pipeline
            raise ValueError("DeviceCachedBatcher does not support HostShardedBatcher")
        self.inner = inner
        self.mesh = mesh
        self.batch_size = inner.batch_size
        self.n_points = inner.n_points
        self.max_windows = getattr(inner, "max_windows", 1)
        self.seed = inner.seed
        self.shuffle = inner.shuffle
        self.drop_last = inner.drop_last
        self.pad_to_multiple = inner.pad_to_multiple
        self.epoch = inner.epoch
        # rare-class oversampling multiplicities: the CACHE stores each sample
        # once; only the epoch ORDER repeats (pipeline.py PaddedBatcher.repeats)
        self.repeats = getattr(inner, "repeats", None)
        self.names: list = []
        self._build(limit_bytes)

    # -- cache build ---------------------------------------------------------
    def _build(self, limit_bytes: int) -> None:
        import jax
        import jax.numpy as jnp

        loader = _single_sample_loader(self.inner)
        rng = np.random.default_rng(self.seed)  # fixed-at-build resampling
        parts = []
        for b in loader._make_batches(rng):
            self.names.append(b["names"][0])
            parts.append({k: v for k, v in b.items() if isinstance(v, np.ndarray)})
        if not parts:
            self._data = {}
            self._gather = None
            return
        host = {
            k: np.concatenate([p[k] for p in parts], axis=0) for k in parts[0]
        }
        nbytes = sum(v.nbytes for v in host.values())
        if nbytes > limit_bytes:
            raise MemoryError(
                f"device cache would be {nbytes / 2**20:.0f} MiB "
                f"(> limit {limit_bytes / 2**20:.0f} MiB)"
            )
        if self.mesh is not None:
            from ampnet_tpu.parallel.mesh import replicate_sharding

            repl = replicate_sharding(self.mesh)
            self._data = {k: jax.device_put(v, repl) for k, v in host.items()}
        else:
            self._data = {k: jnp.asarray(v) for k, v in host.items()}
        self._gather = self._make_gather()

    def _make_gather(self):
        import jax

        gather = gather_batch
        if self.mesh is None:
            return jax.jit(gather)
        from ampnet_tpu.parallel.mesh import batch_sharding, replicate_sharding

        repl = replicate_sharding(self.mesh)
        dsh = batch_sharding(self.mesh)
        # cache replicated, index + batch sharded over 'data': each chip
        # gathers its own shard locally, zero collectives
        return jax.jit(gather, in_shardings=(repl, dsh, dsh), out_shardings=dsh)

    # -- batcher protocol ----------------------------------------------------
    def _base_indices(self) -> np.ndarray:
        if self.repeats is None:
            return np.arange(len(self.names))
        return np.repeat(np.arange(len(self.names)), self.repeats)

    def __len__(self) -> int:
        n = len(self._base_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self, pad_to: Optional[int] = None):
        """Per-batch (idx, pad, names) for one epoch — advances the epoch
        counter with the same rng semantics as the host batcher. ``pad_to``
        additionally pads every batch to a fixed width (whole-epoch scan needs
        rectangular [S, B]); pad entries replicate earlier samples and are
        marked True (labels forced to −1 by the gather)."""
        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        order = self._base_indices()
        if self.shuffle:
            rng.shuffle(order)
        out = []
        for b in range(len(self)):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            pad = np.zeros(len(idx), bool)
            names = [self.names[i] for i in idx]
            m = self.pad_to_multiple
            width = len(idx)
            if m > 1 and width % m:
                width += m - width % m
            if pad_to is not None:
                width = max(width, pad_to)
            if width > len(idx):
                reps = width - len(idx)
                extra = idx[np.arange(reps) % len(idx)]
                idx = np.concatenate([idx, extra])
                pad = np.concatenate([pad, np.ones(reps, bool)])
                names = names + [f"<pad:{self.names[i]}>" for i in extra]
            out.append((idx.astype(np.int32), pad, names))
        return out

    def epoch_index_matrix(self):
        """Rectangular ``(idxs [S, B], pads [S, B], names)`` for a whole-epoch
        ``lax.scan`` dispatch (train/epoch.py)."""
        # rectangular width: batch_size rounded up to the pad multiple (a full
        # batch whose size is not a multiple pads past batch_size)
        m = max(self.pad_to_multiple, 1)
        width = -(-self.batch_size // m) * m
        batches = self._epoch_indices(pad_to=width)
        if not batches:
            return (
                np.zeros((0, self.batch_size), np.int32),
                np.zeros((0, self.batch_size), bool),
                [],
            )
        idxs = np.stack([b[0] for b in batches])
        pads = np.stack([b[1] for b in batches])
        names = [b[2] for b in batches]
        return idxs, pads, names

    def __iter__(self) -> Iterator[Dict]:
        import jax.numpy as jnp

        for idx, pad, names in self._epoch_indices():
            batch = dict(
                self._gather(self._data, jnp.asarray(idx), jnp.asarray(pad))
            )
            batch["names"] = names
            yield batch


def maybe_device_cache(
    batcher,
    mesh=None,
    mode: str = "auto",
    limit_bytes: int = DEFAULT_LIMIT_BYTES,
) -> Optional[object]:
    """CLI policy: 'on' caches (error if too big), 'off' returns the host
    batcher, 'auto' caches when the padded dataset fits under ``limit_bytes``."""
    if mode == "off" or batcher is None:
        return batcher
    if mode not in ("on", "auto"):
        raise ValueError(f"device_cache mode {mode!r} (want on/off/auto)")
    if mode == "auto":
        from ampnet_tpu.data.pipeline import HostShardedBatcher

        if isinstance(batcher, HostShardedBatcher):
            # best-effort policy: multi-host input stays on the host pipeline
            return batcher
        est = estimate_cache_bytes(batcher)
        if est > limit_bytes:
            print(
                f"device cache skipped: dataset ~{est / 2**20:.0f} MiB "
                f"> {limit_bytes / 2**20:.0f} MiB; using host pipeline",
                file=sys.stderr,
            )
            return batcher
    else:  # mode == 'on': same incompatibility, but explicit — explain, don't crash
        from ampnet_tpu.data.pipeline import HostShardedBatcher

        if isinstance(batcher, HostShardedBatcher):
            print(
                "--device_cache on ignored: multi-host input stays on the host "
                "pipeline (each host sees only its shard; caching it would "
                "change the epoch distribution)",
                file=sys.stderr,
            )
            return batcher
    return DeviceCachedBatcher(batcher, mesh=mesh, limit_bytes=limit_bytes)
