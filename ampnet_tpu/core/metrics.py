"""Jittable segmentation/classification metrics.

Semantics match the reference exactly (``utils/get_metrics.py``):

* per-class IoU = TP / (TP + FN + FP)                       (get_metrics.py:6-17)
* accuracy = mean(pred == target) over un-padded points     (get_metrics.py:20-31)
* class-weight schemes EFS / INS / ISNS / sklearn           (get_metrics.py:34-77)

Everything here is a pure function over arrays; the confusion matrix is computed as a
one-hot matmul so it rides the MXU instead of host-side scatter loops. Padded points are
excluded with an explicit boolean mask (the reference uses target == -1 sentinels,
``rm_padding`` in utils; we keep -1 in the data layer and derive the mask once).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    num_classes: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Confusion matrix  cm[t, p] = #points with target t predicted p.

    Implemented as onehot(targets)^T @ onehot(preds): a [N, C]x[N, C] matmul that XLA
    tiles onto the MXU — fast for the ~600k-point batches this model sees.
    """
    preds = preds.reshape(-1)
    targets = targets.reshape(-1)
    if mask is None:
        mask = targets >= 0
    mask = mask.reshape(-1)
    t1 = jax.nn.one_hot(jnp.where(mask, targets, 0), num_classes, dtype=jnp.float32)
    p1 = jax.nn.one_hot(jnp.where(mask, preds, 0), num_classes, dtype=jnp.float32)
    t1 = t1 * mask[:, None].astype(jnp.float32)
    return jnp.einsum("nc,nd->cd", t1, p1, preferred_element_type=jnp.float32)


def iou_from_confusion(cm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class IoU = TP / (TP + FN + FP) and a validity flag (union > 0).

    Matches reference get_iou_obj (utils/get_metrics.py:6-17): gt_positive = TP+FN,
    fp = detected − TP, IoU = TP / (gt_positive + fp).
    """
    tp = jnp.diagonal(cm)
    fn = cm.sum(axis=1) - tp
    fp = cm.sum(axis=0) - tp
    union = tp + fn + fp
    valid = union > 0
    iou = jnp.where(valid, tp / jnp.maximum(union, 1.0), 0.0)
    return iou, valid


def iou_per_class(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    num_classes: int,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return iou_from_confusion(confusion_matrix(preds, targets, num_classes, mask))


def mean_iou(iou: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """mIoU over classes present in the data (reference averages only present classes,
    test_pointnet_att_segmen.py:186-219)."""
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, iou, 0.0).sum() / n


def accuracy(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    preds = preds.reshape(-1)
    targets = targets.reshape(-1)
    if mask is None:
        mask = targets >= 0
    mask = mask.reshape(-1).astype(jnp.float32)
    correct = (preds == targets).astype(jnp.float32) * mask
    return correct.sum() / jnp.maximum(mask.sum(), 1.0)


def balanced_accuracy(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    num_classes: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Macro-averaged recall over classes present — matches
    sklearn.balanced_accuracy_score used at get_metrics.py:28."""
    cm = confusion_matrix(preds, targets, num_classes, mask)
    tp = jnp.diagonal(cm)
    support = cm.sum(axis=1)
    present = support > 0
    recall = jnp.where(present, tp / jnp.maximum(support, 1.0), 0.0)
    return recall.sum() / jnp.maximum(present.sum(), 1)


def segmentation_metrics(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    num_classes: int,
    mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """One fused pass producing every per-epoch scalar the reference logs
    (train_pointnet-attention.py:280-309)."""
    cm = confusion_matrix(preds, targets, num_classes, mask)
    iou, valid = iou_from_confusion(cm)
    tp = jnp.diagonal(cm)
    total = jnp.maximum(cm.sum(), 1.0)
    return {
        "confusion": cm,
        "iou": iou,
        "iou_valid": valid,
        "miou": mean_iou(iou, valid),
        "accuracy": tp.sum() / total,
    }


# ----------------------------------------------------------------------------------
# Class weighting schemes (reference utils/get_metrics.py:34-77)
# ----------------------------------------------------------------------------------


def weights_effective_num_of_samples(samples_per_cls, beta: float) -> np.ndarray:
    """'EFS' — Cui et al. effective number of samples (get_metrics.py:34-39)."""
    samples_per_cls = np.asarray(samples_per_cls, dtype=np.float64)
    effective = 1.0 - np.power(beta, samples_per_cls)
    w = (1.0 - beta) / effective
    return (w / w.sum()).astype(np.float32)


def weights_inverse_num_of_samples(samples_per_cls, power: float = 1.0) -> np.ndarray:
    """'INS' (power=1) / 'ISNS' (power=0.5) — get_metrics.py:42-45."""
    samples_per_cls = np.asarray(samples_per_cls, dtype=np.float64)
    w = 1.0 / np.power(samples_per_cls, power)
    return (w / w.sum()).astype(np.float32)


def weights_sklearn(samples_per_cls) -> np.ndarray:
    """'sklearn' balanced weights — get_metrics.py:48-51."""
    samples_per_cls = np.asarray(samples_per_cls, dtype=np.float64)
    n = len(samples_per_cls)
    w = samples_per_cls.sum() / (n * samples_per_cls)
    return (w / w.sum()).astype(np.float32)


def get_class_weights(method: str, samples_per_cls, beta: float = 0.999):
    """Dispatch matching get_weights4class (get_metrics.py:54-77).
    Returns None for unknown methods, like the reference."""
    if method == "EFS":
        return weights_effective_num_of_samples(samples_per_cls, beta)
    if method == "INS":
        return weights_inverse_num_of_samples(samples_per_cls, 1.0)
    if method == "ISNS":
        return weights_inverse_num_of_samples(samples_per_cls, 0.5)
    if method == "sklearn":
        return weights_sklearn(samples_per_cls)
    return None


def weights_for_samples(class_weights: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample weight lookup (get_weights4sample, get_metrics.py:80-98) — a gather
    instead of the reference's one-hot/repeat dance."""
    return jnp.take(class_weights, labels.reshape(-1), axis=0)
