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

import jax.numpy as jnp


def weighted_cross_entropy(
    logits: jnp.ndarray,  # [..., C]
    targets: jnp.ndarray,  # [...], int, ignore_index marks padding
    class_weights: Optional[jnp.ndarray] = None,  # [C]
    ignore_index: int = -1,
) -> jnp.ndarray:
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
    return (ce * w).sum() / jnp.maximum(w.sum(), 1e-12)


def orthogonality_regularizer(transforms: jnp.ndarray) -> jnp.ndarray:
    """Frobenius norm of (I − A·Aᵀ) over a stack of [..., D, D] matrices — one number,
    like torch.norm over the full batch (train_pointnet-attention.py:463-464)."""
    d = transforms.shape[-1]
    a = transforms.reshape(-1, d, d).astype(jnp.float32)
    eye = jnp.eye(d, dtype=jnp.float32)
    diff = eye - jnp.einsum("bij,bkj->bik", a, a, preferred_element_type=jnp.float32)
    # guarded sqrt: our T-Nets zero-init to the exact identity, where sqrt'(0)=inf
    return jnp.sqrt(jnp.sum(jnp.square(diff)) + 1e-12)
