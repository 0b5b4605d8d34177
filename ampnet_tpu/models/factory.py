"""Model factory: one constructor for every architecture × task combination the
reference spreads over six training scripts (SURVEY.md §2.4)."""

from __future__ import annotations

import dataclasses

from ampnet_tpu.core.config import AMPNetConfig
from ampnet_tpu.models.adapter import SingleWindowClassifier, SingleWindowSegmenter
from ampnet_tpu.models.amp import AMPNetClassifier, AMPNetSegmenter

ARCHS = ("attention", "gru", "baseline", "classic", "pointnet2")


def build_model(cfg: AMPNetConfig, arch: str = "attention", task: str = "segmentation",
                num_cls_out: int = 2):
    """arch: 'attention' (AMP-Net), 'gru' (sequential windows), 'baseline'
    (light single-window PointNet), 'classic' (original 1024-d PointNet)."""
    if arch not in ARCHS:
        raise ValueError(f"unknown arch {arch!r}; expected one of {ARCHS}")
    mcfg = cfg.model
    if arch in ("attention", "gru"):
        mcfg = dataclasses.replace(mcfg, context=arch)
        if task == "segmentation":
            return AMPNetSegmenter(mcfg)
        return AMPNetClassifier(mcfg, num_out=num_cls_out)
    if arch == "pointnet2":
        from ampnet_tpu.models.pointnet2 import PointNet2Segmenter

        if task != "segmentation":
            raise ValueError("pointnet2 supports segmentation only")
        return PointNet2Segmenter(mcfg.num_classes, dtype=mcfg.dtype)
    variant = "light" if arch == "baseline" else "classic"
    point_dim = 2 if variant == "light" else 3
    if task == "segmentation":
        return SingleWindowSegmenter(mcfg.num_classes, variant, point_dim, mcfg.dtype)
    return SingleWindowClassifier(num_cls_out, variant, point_dim, mcfg.dtype)
