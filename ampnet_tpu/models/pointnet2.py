"""PointNet++ (set abstraction + feature propagation), TPU-native.

The reference ships a ``pointnet_2`` comparison model that is DEAD CODE in its
snapshot — it imports ``pointNet_2.models.pointnet2_utils`` which does not exist
(``pointNet/model/pointnetAtt.py:4,282-322``), yet the paper's results figure
compares against it. Here it is a complete, runnable implementation with the same
architecture hyperparameters (SA(1024, 0.1, 32, [32,32,64]) → SA(256, 0.2, 32,
[64,64,128]) → SA(64, 0.4, 32, [128,128,256]) → FP stacks → per-point head) built
from the published PointNet++ design, static-shape throughout:

* farthest point sampling is the jitted ``lax.fori_loop`` FPS (ops/sampling.py),
  vmapped over the batch;
* ball query is the standard vectorized formulation: index-ordered membership via
  one [S, N] distance matrix, out-of-radius slots replaced by the group's first
  member — no data-dependent shapes;
* grouping is a gather; the per-group MLPs are batched matmuls + masked BN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ampnet_tpu.models.layers import MaskedBatchNorm
from ampnet_tpu.ops.sampling import farthest_point_sampling


def _sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # a [..., n, 3], b [..., m, 3] -> [..., n, m]
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1)
    return a2 + b2[..., None, :] - 2 * jnp.einsum("...nd,...md->...nm", a, b)


def ball_query(
    centers: jnp.ndarray,  # [B, S, 3]
    xyz: jnp.ndarray,  # [B, N, 3]
    radius: float,
    nsample: int,
) -> jnp.ndarray:  # [B, S, nsample] indices into N
    n = xyz.shape[1]
    d2 = _sqdist(centers, xyz)  # [B, S, N]
    idx = jnp.broadcast_to(jnp.arange(n), d2.shape)
    idx = jnp.where(d2 <= radius * radius, idx, n)  # out-of-ball → sentinel N
    idx = jnp.sort(idx, axis=-1)[..., :nsample]
    first = idx[..., :1]
    # centers always include themselves (distance 0) so `first` < n
    return jnp.where(idx == n, first, idx)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B, N, C], idx [B, ...] → [B, ..., C]."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


class SetAbstraction(nn.Module):
    """FPS downsample + ball-query grouping + shared MLP + max pool."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False
    bn_momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: Optional[jnp.ndarray], train: bool = False):
        # xyz [B, N, 3]; feats [B, N, C] or None
        if self.group_all:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            grouped_xyz = xyz[:, None] - new_xyz[:, :, None]  # [B, 1, N, 3]
            grouped = (
                jnp.concatenate([grouped_xyz, feats[:, None]], axis=-1)
                if feats is not None
                else grouped_xyz
            )
        else:
            fps_idx = jax.vmap(lambda p: farthest_point_sampling(p, self.npoint))(xyz)
            new_xyz = gather_points(xyz, fps_idx)  # [B, S, 3]
            idx = ball_query(new_xyz, xyz, self.radius, self.nsample)  # [B, S, ns]
            grouped_xyz = gather_points(xyz, idx) - new_xyz[:, :, None]  # relative
            if feats is not None:
                grouped = jnp.concatenate([grouped_xyz, gather_points(feats, idx)], -1)
            else:
                grouped = grouped_xyz

        h = grouped
        for i, f in enumerate(self.mlp):
            h = nn.Dense(f, use_bias=False, dtype=self.dtype, name=f"mlp_{i}")(h)
            h = MaskedBatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                dtype=self.dtype, name=f"bn_{i}",
            )(h)
            h = nn.relu(h)
        return new_xyz, jnp.max(h, axis=2)  # [B, S, mlp[-1]]


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance interpolation of coarse features back to fine points."""

    mlp: Sequence[int]
    bn_momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        xyz_fine: jnp.ndarray,  # [B, N, 3]
        xyz_coarse: jnp.ndarray,  # [B, S, 3]
        feats_fine: Optional[jnp.ndarray],  # [B, N, C1] skip connection
        feats_coarse: jnp.ndarray,  # [B, S, C2]
        train: bool = False,
    ) -> jnp.ndarray:
        s = xyz_coarse.shape[1]
        if s == 1:
            interp = jnp.broadcast_to(
                feats_coarse, (*xyz_fine.shape[:2], feats_coarse.shape[-1])
            )
        else:
            d2 = _sqdist(xyz_fine, xyz_coarse)  # [B, N, S]
            neg, idx = jax.lax.top_k(-d2, 3)
            w = 1.0 / jnp.maximum(-neg, 1e-8)
            w = w / w.sum(axis=-1, keepdims=True)
            neighbors = gather_points(feats_coarse, idx)  # [B, N, 3, C2]
            interp = jnp.einsum("bnk,bnkc->bnc", w, neighbors)
        h = interp if feats_fine is None else jnp.concatenate([feats_fine, interp], -1)
        for i, f in enumerate(self.mlp):
            h = nn.Dense(f, use_bias=False, dtype=self.dtype, name=f"mlp_{i}")(h)
            h = MaskedBatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                dtype=self.dtype, name=f"bn_{i}",
            )(h)
            h = nn.relu(h)
        return h


class PointNet2Segmenter(nn.Module):
    """Per-point semantic segmentation with the reference's SA/FP geometry
    (pointnetAtt.py:282-322), completed with a working per-point head. Presents the
    AMP call signature so trainers and inference are architecture-agnostic."""

    num_classes: int = 5
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, centroids=None, window_pad_mask=None, point_mask=None,
                 train: bool = False):
        squeeze = points.ndim == 4
        if squeeze:
            b, w, n, f = points.shape
            x = points.reshape(b * w, n, f)
        else:
            x = points
        xyz = x[..., :3]
        feats = x  # full 9-feature input, like l0_points = xyz (all dims) in the ref

        npts = xyz.shape[1]
        sa1 = SetAbstraction(min(1024, npts), 0.1, 32, (32, 32, 64), dtype=self.dtype,
                             name="sa1")
        sa2 = SetAbstraction(min(256, npts // 2), 0.2, 32, (64, 64, 128),
                             dtype=self.dtype, name="sa2")
        sa3 = SetAbstraction(min(64, npts // 4), 0.4, 32, (128, 128, 256),
                             dtype=self.dtype, name="sa3")

        l1_xyz, l1 = sa1(xyz, feats, train)
        l2_xyz, l2 = sa2(l1_xyz, l1, train)
        l3_xyz, l3 = sa3(l2_xyz, l2, train)

        l2 = FeaturePropagation((256, 256), dtype=self.dtype, name="fp3")(
            l2_xyz, l3_xyz, l2, l3, train
        )
        l1 = FeaturePropagation((256, 128), dtype=self.dtype, name="fp2")(
            l1_xyz, l2_xyz, l1, l2, train
        )
        l0 = FeaturePropagation((128, 128, 128), dtype=self.dtype, name="fp1")(
            xyz, l1_xyz, None, l1, train
        )

        h = nn.Dense(128, use_bias=False, dtype=self.dtype, name="head_1")(l0)
        h = MaskedBatchNorm(use_running_average=not train, dtype=self.dtype,
                            name="head_bn")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train, name="head_drop")(h)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head_out")(h)

        # no T-Nets here: return identity transforms so the shared train step's
        # regularizer is a no-op for this architecture
        t_feat = jnp.broadcast_to(jnp.eye(64, dtype=logits.dtype),
                                  (*logits.shape[:1], 64, 64))
        if squeeze:
            logits = logits.reshape(b, w, n, -1)
            t_feat = t_feat.reshape(b, w, 64, 64)
        return logits, t_feat, None
