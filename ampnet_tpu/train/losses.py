"""Loss functions with torch-parity semantics.

* ``weighted_cross_entropy`` reproduces torch
  ``CrossEntropyLoss(weight=w, reduction='mean', ignore_index=-1)`` exactly
  (reference ``train_pointnet-attention.py:138``): per-point CE scaled by the target's
  class weight, summed, divided by the **sum of the weights** of non-ignored targets
  (not the count — the torch weighted-mean quirk).
* ``orthogonality_regularizer`` is the T-Net feature-transform regularizer
  ``‖I − A·Aᵀ‖_F`` (``train_pointnet-attention.py:463-467``). The reference applies it
  to the last window's transforms only (its Python loop overwrites ``feat_transform``
  each iteration); here it covers every window's transform — strictly more signal at
  identical cost, since the matrices are already materialized.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _per_point_ce(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray],
    ignore_index: int,
) -> tuple:
    """Flattened per-point (ce, weight) with torch CrossEntropyLoss semantics;
    weight is 0 for ignored targets."""
    num_classes = logits.shape[-1]
    logits = logits.reshape(-1, num_classes).astype(jnp.float32)
    targets = targets.reshape(-1)
    valid = targets != ignore_index
    safe_t = jnp.where(valid, targets, 0)

    logz = jnp.log(jnp.sum(jnp.exp(logits - logits.max(-1, keepdims=True)), axis=-1))
    logp = jnp.take_along_axis(logits - logits.max(-1, keepdims=True), safe_t[:, None], axis=-1)[
        :, 0
    ] - logz
    ce = -logp

    if class_weights is None:
        w = valid.astype(jnp.float32)
    else:
        w = jnp.take(class_weights.astype(jnp.float32), safe_t) * valid.astype(jnp.float32)
    return ce, w


def weighted_cross_entropy_parts(
    logits: jnp.ndarray,  # [..., C]
    targets: jnp.ndarray,  # [...], int, ignore_index marks padding
    class_weights: Optional[jnp.ndarray] = None,  # [C]
    ignore_index: int = -1,
) -> tuple:
    """(numerator, weight_sum) of the torch weighted mean: ``Σ ce·w`` and ``Σ w``.

    Exposed separately so gradient accumulation can normalize every micro-batch
    by the GLOBAL weight sum (train/step.py): the weight sum depends only on the
    targets, so it is known before any forward pass, and ``Σ_k ∇(N_k / W_total)``
    is exactly the full-batch CE gradient even when micro-batches carry unequal
    valid-weight mass."""
    ce, w = _per_point_ce(logits, targets, class_weights, ignore_index)
    return (ce * w).sum(), w.sum()


def weighted_focal_parts(
    logits: jnp.ndarray,  # [..., C]
    targets: jnp.ndarray,  # [...], int, ignore_index marks padding
    class_weights: Optional[jnp.ndarray] = None,  # [C]
    gamma: float = 2.0,
    ignore_index: int = -1,
) -> tuple:
    """(numerator, weight_sum) of the α-weighted focal loss (Lin et al. 2017):
    per-point CE modulated by ``(1 − p_t)^γ`` so well-classified points fade and
    the gradient concentrates on hard/rare ones (tower ≈ 1 % of points on the
    hard benchmark — BASELINE.md). No reference counterpart (the reference's
    only imbalance lever is fixed CE weights, train_pointnet-attention.py:127).

    The denominator is the SAME label-only weight sum as the CE path, so
    ``γ = 0`` reduces exactly to ``weighted_cross_entropy_parts`` and the
    grad-accumulation global-normalizer argument carries over unchanged."""
    ce, w = _per_point_ce(logits, targets, class_weights, ignore_index)
    pt = jnp.exp(-ce)  # probability of the true class
    # clip keeps the γ<1 gradient finite at pt→1; value impact ≤1e-12·ce
    mod = jnp.power(jnp.clip(1.0 - pt, 1e-12, 1.0), jnp.float32(gamma))
    return (mod * ce * w).sum(), w.sum()


def weighted_focal(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
    ignore_index: int = -1,
) -> jnp.ndarray:
    num, den = weighted_focal_parts(logits, targets, class_weights, gamma, ignore_index)
    return num / jnp.maximum(den, 1e-12)


def cross_entropy_weight_sum(
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """The denominator of the torch weighted mean, from targets alone."""
    targets = targets.reshape(-1)
    valid = targets != ignore_index
    if class_weights is None:
        return valid.astype(jnp.float32).sum()
    safe_t = jnp.where(valid, targets, 0)
    w = jnp.take(class_weights.astype(jnp.float32), safe_t) * valid.astype(jnp.float32)
    return w.sum()


def weighted_cross_entropy(
    logits: jnp.ndarray,  # [..., C]
    targets: jnp.ndarray,  # [...], int, ignore_index marks padding
    class_weights: Optional[jnp.ndarray] = None,  # [C]
    ignore_index: int = -1,
) -> jnp.ndarray:
    num, den = weighted_cross_entropy_parts(logits, targets, class_weights, ignore_index)
    return num / jnp.maximum(den, 1e-12)


def distillation_kl_parts(
    student_logits: jnp.ndarray,  # [..., C]
    teacher_probs: jnp.ndarray,  # [..., C], tempered + ensemble-averaged
    targets: jnp.ndarray,  # [...], int, ignore_index marks padding
    temperature: float = 1.0,
    ignore_index: int = -1,
) -> tuple:
    """(numerator, valid_count) of the knowledge-distillation term (Hinton et
    al. 2015): ``T² · KL(p_T ‖ p_S^T)`` per non-ignored point, where
    ``p_S^T = softmax(student_logits / T)`` and ``teacher_probs`` come in
    already tempered (and ensemble-averaged — train/distill.py). The T² factor
    keeps the soft-target gradient magnitude comparable to the hard-CE term
    across temperatures. The count denominator depends only on the targets,
    so gradient accumulation can normalize every micro-batch by the GLOBAL
    count, exactly as the CE path does (train/step.py). Unweighted over valid
    points by design: class weighting belongs to the hard-label term; the
    teacher's soft distribution already encodes its class beliefs.

    No reference counterpart — its closest mechanism is the GRU trainer's
    latent-weight reuse (pointnetAtt.py:212-258), a weight-transfer scheme,
    not a teacher objective."""
    num_classes = student_logits.shape[-1]
    t = jnp.float32(temperature)
    lg = student_logits.reshape(-1, num_classes).astype(jnp.float32) / t
    tp = teacher_probs.reshape(-1, num_classes).astype(jnp.float32)
    valid = (targets.reshape(-1) != ignore_index).astype(jnp.float32)
    logp_s = jax.nn.log_softmax(lg, axis=-1)
    # p·log p with the p→0 limit handled by clipping inside the log only
    kl = (tp * (jnp.log(jnp.clip(tp, 1e-12, 1.0)) - logp_s)).sum(-1)
    return (kl * valid).sum() * t * t, valid.sum()


def distillation_kl(
    student_logits: jnp.ndarray,
    teacher_probs: jnp.ndarray,
    targets: jnp.ndarray,
    temperature: float = 1.0,
    ignore_index: int = -1,
) -> jnp.ndarray:
    num, den = distillation_kl_parts(
        student_logits, teacher_probs, targets, temperature, ignore_index
    )
    return num / jnp.maximum(den, 1.0)


def orthogonality_regularizer(transforms: jnp.ndarray) -> jnp.ndarray:
    """Frobenius norm of (I − A·Aᵀ) over a stack of [..., D, D] matrices — one number,
    like torch.norm over the full batch (train_pointnet-attention.py:463-464)."""
    d = transforms.shape[-1]
    a = transforms.reshape(-1, d, d).astype(jnp.float32)
    eye = jnp.eye(d, dtype=jnp.float32)
    diff = eye - jnp.einsum("bij,bkj->bik", a, a, preferred_element_type=jnp.float32)
    # guarded sqrt: our T-Nets zero-init to the exact identity, where sqrt'(0)=inf
    return jnp.sqrt(jnp.sum(jnp.square(diff)) + 1e-12)
