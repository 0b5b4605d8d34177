"""Jitted steps for the classification task (binary tower detection).

Reference semantics: NLL/CE with EFS/INS/ISNS class weights
(``baseline/train_classification.py:138-143,179``; AMP variant
``train_pointnet-attention.py:115-135``), T-Net regularizer, accuracy +
precision/recall/F1 computed from the confusion matrix at evaluation
(``baseline/test_classification.py:136-167``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ampnet_tpu.core.config import AMPNetConfig
from ampnet_tpu.core.metrics import confusion_matrix
from ampnet_tpu.ops.augment import rotate_z
from ampnet_tpu.train.losses import orthogonality_regularizer, weighted_cross_entropy
from ampnet_tpu.train.step import window_pad_mask_from_labels


def make_cls_step_fns(
    cfg: AMPNetConfig,
    class_weights: Optional[np.ndarray] = None,
    num_out: int = 2,
    augment: bool = True,
) -> Tuple[Callable, Callable]:
    cw = jnp.asarray(class_weights, jnp.float32) if class_weights is not None else None
    reg_w = cfg.train.reg_weight

    def forward(state, params, batch_stats, batch, train, dropout_rng):
        pad_mask = batch.get("window_pad_mask")
        if pad_mask is None and "labels" in batch:
            pad_mask = window_pad_mask_from_labels(batch["labels"])
        out = state.apply_fn(
            {"params": params, "batch_stats": batch_stats},
            batch["points"],
            batch.get("centroids"),
            pad_mask,
            batch.get("point_mask"),
            train=train,
            rngs={"dropout": dropout_rng} if dropout_rng is not None else None,
            mutable=["batch_stats"] if train else False,
        )
        if train:
            (logits, t_feat, _), updates = out
            return logits, t_feat, updates["batch_stats"]
        logits, t_feat, _ = out
        return logits, t_feat, batch_stats

    @jax.jit
    def train_step(state, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        k_rot, k_drop = jax.random.split(rng)
        points = rotate_z(batch["points"], key=k_rot) if augment else batch["points"]
        aug = dict(batch, points=points)

        def loss_fn(params):
            logits, t_feat, new_stats = forward(state, params, state.batch_stats, aug, True, k_drop)
            ce = weighted_cross_entropy(logits, aug["cls_label"], cw)
            loss = ce + reg_w * orthogonality_regularizer(t_feat)
            return loss, (ce, logits, new_stats)

        (loss, (ce, logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(preds, batch["cls_label"], num_out)
        return state, {"loss": loss, "ce_loss": ce, "confusion": cm}

    @jax.jit
    def eval_step(state, batch):
        logits, _, _ = forward(state, state.params, state.batch_stats, batch, False, None)
        ce = weighted_cross_entropy(logits, batch["cls_label"], cw)
        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(preds, batch["cls_label"], num_out)
        # positive-class probability for PR curves (test_classification.py AUC)
        pos_prob = jax.nn.softmax(logits, axis=-1)[..., 1]
        return {"loss": ce, "ce_loss": ce, "confusion": cm, "pos_prob": pos_prob}, preds

    return train_step, eval_step


def binary_metrics_from_confusion(cm: np.ndarray) -> Dict[str, float]:
    """precision / recall / F1 / accuracy for the positive (tower) class, like the
    reference tester (baseline/test_classification.py:136-167)."""
    tn, fp, fn, tp = cm[0, 0], cm[0, 1], cm[1, 0], cm[1, 1]
    precision = tp / max(tp + fp, 1e-9)
    recall = tp / max(tp + fn, 1e-9)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {
        "accuracy": float((tp + tn) / max(cm.sum(), 1e-9)),
        "precision": float(precision),
        "recall": float(recall),
        "f1": float(f1),
    }
