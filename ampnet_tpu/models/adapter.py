"""Adapters giving the single-window baseline models the AMP call signature
``(points, centroids, window_pad_mask, point_mask, train)`` so trainers, step
functions and inference are model-agnostic (the pluggable-architecture seam the
reference implements by copy-pasting whole training scripts — SURVEY.md §3.5)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ampnet_tpu.models.pointnet import ClassificationPointNet, SegmentationPointNet


class SingleWindowSegmenter(nn.Module):
    """Wraps a whole-cloud SegmentationPointNet as a [B, W, N, F] model. Windows are
    folded into the batch; no cross-window context (that's the point of the
    baseline — baseline/train_segmentation.py)."""

    num_classes: int = 5
    variant: str = "light"
    point_dim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, centroids=None, window_pad_mask=None, point_mask=None,
                 train: bool = False):
        squeeze = points.ndim == 4
        if squeeze:
            b, w, n, f = points.shape
            x = points.reshape(b * w, n, f)
            pmask = point_mask.reshape(b * w, n) if point_mask is not None else None
        else:
            x = points
            pmask = point_mask
        logits, t_feat = SegmentationPointNet(
            self.num_classes, self.variant, self.point_dim, self.dtype, name="net"
        )(x, pmask, train=train)
        if squeeze:
            logits = logits.reshape(b, w, n, -1)
            t_feat = t_feat.reshape(b, w, *t_feat.shape[1:])
        return logits, t_feat, None


class SingleWindowClassifier(nn.Module):
    """Wraps ClassificationPointNet; multi-window inputs are classified from the
    first (only real) window."""

    num_classes: int = 2
    variant: str = "light"
    point_dim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, centroids=None, window_pad_mask=None, point_mask=None,
                 train: bool = False):
        if points.ndim == 4:
            points = points[:, 0]
            point_mask = point_mask[:, 0] if point_mask is not None else None
        logp, t_feat = ClassificationPointNet(
            self.num_classes, self.variant, self.point_dim, dtype=self.dtype, name="net"
        )(points, point_mask, train=train)
        return logp, t_feat, None
