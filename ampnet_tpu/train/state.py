"""Train state: params + batch stats + one Adam with the reference's LR schedule.

The reference runs TWO Adam optimizers with identical hyperparameters and identical
MultiStepLR schedules — one for the encoder, one for the attention head
(``train_pointnet-attention.py:140-149``). Adam is elementwise, so two identically
configured Adams over disjoint parameter groups are mathematically one Adam over the
union; we keep a single optax chain (one less state tree to shard) and preserve the
two-group structure in the checkpoint payload instead (see core/checkpoint.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from ampnet_tpu.core.config import AMPNetConfig


class AMPTrainState(train_state.TrainState):
    batch_stats: Any = None
    rng: jax.Array = struct.field(default=None)
    epoch: jnp.ndarray = struct.field(default=None)
    # multiplies Adam's updates — the plateau LR decay knob
    # (reference adjust_learning_rate, utils/utils.py:459-470)
    lr_scale: jnp.ndarray = struct.field(default=None)

    def apply_gradients(self, *, grads, **kwargs):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        if self.lr_scale is not None:
            updates = jax.tree.map(lambda u: u * self.lr_scale, updates)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state, **kwargs
        )


def multistep_adam(
    learning_rate: float,
    milestones,
    gamma: float,
    steps_per_epoch: int,
) -> optax.GradientTransformation:
    """Adam + epoch-milestone LR decay (MultiStepLR semantics,
    train_pointnet-attention.py:144-149), expressed as a step-count schedule."""
    spe = max(int(steps_per_epoch), 1)
    # always a schedule (even when constant) so the optimizer state pytree has one
    # stable structure across train/restore regardless of steps_per_epoch
    schedule = optax.piecewise_constant_schedule(
        init_value=learning_rate,
        boundaries_and_scales={int(m) * spe: gamma for m in (milestones or ())},
    )
    return optax.adam(schedule)


def create_train_state(
    cfg: AMPNetConfig,
    model,
    rng: jax.Array,
    sample_batch: Dict[str, jnp.ndarray],
    steps_per_epoch: int = 0,
    tx: Optional[optax.GradientTransformation] = None,
    apply_fn: Optional[Callable] = None,
) -> AMPTrainState:
    init_rng, state_rng = jax.random.split(rng)
    # mixed-width distillation: the batch may carry a wider schema than this
    # model consumes (geom teacher columns); init with the model's own prefix
    # so the student's first layer has its configured width (train/step.py
    # _forward slices identically)
    points = sample_batch["points"]
    width = int(cfg.data.num_features + cfg.data.extra_features)
    if points.shape[-1] > width:
        points = points[..., :width]
    variables = model.init(
        {"params": init_rng, "dropout": init_rng},
        points,
        sample_batch.get("centroids"),
        sample_batch.get("window_pad_mask"),
        train=False,
    )
    if tx is None:
        t = cfg.train
        tx = multistep_adam(t.learning_rate, t.lr_milestones, t.lr_gamma, steps_per_epoch)
    return AMPTrainState.create(
        apply_fn=apply_fn or model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
        rng=state_rng,
        epoch=jnp.zeros((), jnp.int32),
        lr_scale=jnp.ones((), jnp.float32),
    )


def clone_state(state: AMPTrainState) -> AMPTrainState:
    """Deep-copy every array leaf of a train state.

    ``train_step`` donates its input state (buffers update in place on device);
    callers that need to keep the pre-step state alive — A/B experiments, tests
    sharing a fixture, optimizer-state inspection — must clone first.
    """
    return jax.tree.map(
        lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x, state
    )
