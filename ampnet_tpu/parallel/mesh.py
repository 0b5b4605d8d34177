"""Device mesh + sharded train/eval steps (GSPMD data parallelism).

The reference has NO distributed backend at all (SURVEY.md §2.6) — single process,
single device. The TPU-native scaling story (SURVEY.md §5):

* the batch axis ``B`` (clouds) is the shardable axis — each chip encodes its shard of
  clouds (all their windows), so the heavy ``[B*W, N, C]`` encoder matmuls are purely
  local;
* cross-window attention needs only each cloud's own ≤W window tokens → also local
  under batch sharding (no resharding between encoder and attention);
* the only collectives are the gradient/metric all-reduces XLA inserts automatically
  for the replicated parameters — these ride ICI.

We express this with ``jax.jit`` + ``NamedSharding`` constraints over a 1-D
``Mesh('data')`` and let the GSPMD partitioner insert the psums — idiomatic pjit-style
DP, not a port of any NCCL pattern. A ``'model'`` mesh axis is accepted for forward
compatibility (TP is unnecessary at ≤1M params but the mesh leaves the option open).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ampnet_tpu.core.config import AMPNetConfig


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, ...] = ("data",),
) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axis_names) > 1:
        arr = arr.reshape((len(devices) // 1, 1))  # trailing model axis of size 1
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (cloud/batch) axis across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Place a host batch onto the mesh, sharded over the leading axis."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def make_sharded_step_fns(cfg: AMPNetConfig, mesh: Mesh, augment: bool = True,
                          teacher=None):
    """Data-parallel versions of train/eval steps.

    State (params/opt/batch_stats) is replicated; batches are sharded over 'data'.
    XLA all-reduces the gradients (ICI) because the replicated output sharding of the
    parameters forces a psum of the per-shard contributions. A distillation
    ``teacher`` (train/distill.py) traces as replicated constants — each shard
    runs the teacher on its own batch shard, no collective added.
    """
    from ampnet_tpu.train.step import make_step_fns

    train_step, eval_step = make_step_fns(cfg, augment=augment, teacher=teacher)
    repl = replicate_sharding(mesh)
    data = batch_sharding(mesh)

    sharded_train = jax.jit(
        train_step.__wrapped__ if hasattr(train_step, "__wrapped__") else train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )
    sharded_eval = jax.jit(
        eval_step.__wrapped__ if hasattr(eval_step, "__wrapped__") else eval_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
    )
    return sharded_train, sharded_eval


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicate_sharding(mesh))
