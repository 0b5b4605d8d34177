"""Whole-epoch dispatch: ``lax.scan`` over the device-resident dataset.

With the dataset cached in HBM (``data/device_cache.py``), the only remaining
per-step host cost is dispatching one XLA program per batch — on a
remote-relay transport each dispatch carries real latency. The TPU-native
answer is compiler-friendly control flow: scan the jitted step body over the
epoch's ``[S, B]`` index matrix so an ENTIRE epoch (gather → augment → forward
→ backward → Adam, ×S steps) is ONE program call, and its stacked per-step
metrics come back in one fetch.

The reference's training loop is the opposite extreme — one Python-side
encoder launch per window per batch (``train_pointnet-attention.py:396-424``).

Trajectory equivalence: the scan carries the same TrainState the per-step path
carries, and the in-step augmentation PRNG is derived from ``state.step``
(``train/step.py``), so seeded runs are bit-identical to the per-step device
-cache path (asserted in tests/test_epoch_dispatch.py).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax

from ampnet_tpu.data.device_cache import gather_batch as _gather


def _unwrap(step_fn: Callable) -> Callable:
    body = getattr(step_fn, "__wrapped__", None)
    if body is None:
        raise ValueError(
            "epoch dispatch needs the raw step body; got a step function "
            "without __wrapped__ (not produced by jax.jit)"
        )
    return body


def make_epoch_fns(
    train_step: Callable,
    eval_step: Callable,
    mesh=None,
) -> Tuple[Callable, Callable]:
    """Build jitted (train_epoch, eval_epoch) from the session's jitted step fns.

    ``train_epoch(state, data, idxs, pads) -> (state, metrics[S, ...])``
    ``eval_epoch(state, data, idxs, pads) -> metrics[S, ...]``

    where ``data`` is the device cache dict, ``idxs`` is ``[S, B]`` int32 and
    ``pads`` ``[S, B]`` bool (True = replicated pad entry, loss-ignored).
    Under a mesh: state/cache replicated, index matrices sharded over 'data'
    along the batch column, metrics replicated — identical shardings to the
    per-step path, so gradients still all-reduce over ICI inside the scan.
    """
    t_body = _unwrap(train_step)
    e_body = _unwrap(eval_step)

    def train_epoch(state, data, idxs, pads):
        def body(st, inp):
            idx, pad = inp
            st, metrics = t_body(st, _gather(data, idx, pad))
            return st, metrics

        return jax.lax.scan(body, state, (idxs, pads))

    def eval_epoch(state, data, idxs, pads):
        def body(_, inp):
            idx, pad = inp
            metrics, _ = e_body(state, _gather(data, idx, pad))
            return None, metrics

        _, metrics = jax.lax.scan(body, None, (idxs, pads))
        return metrics

    if mesh is None:
        return (
            jax.jit(train_epoch, donate_argnums=0),
            jax.jit(eval_epoch),
        )

    from ampnet_tpu.parallel.mesh import batch_sharding, replicate_sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = replicate_sharding(mesh)
    col = NamedSharding(mesh, P(None, "data"))  # [S, B] sharded along B
    return (
        jax.jit(
            train_epoch,
            in_shardings=(repl, repl, col, col),
            out_shardings=(repl, repl),
            donate_argnums=0,
        ),
        jax.jit(
            eval_epoch,
            in_shardings=(repl, repl, col, col),
            out_shardings=repl,
        ),
    )
