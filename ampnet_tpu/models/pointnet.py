"""Classic and light single-window PointNet variants.

Two baseline families from the reference, both operating on one whole cloud
(no window decomposition):

* **classic** — the original PointNet dims (``pointNet/model/pointnet.py``):
  1024-bottleneck T-Nets with biases, encoder 9→64→64→[64×64 T]→64→128→1024,
  cls head 1024→512→256→k (log-softmax), seg head 1088→512→256→128→k.
* **light** — the slimmed 256-d variant used by the baseline scripts
  (``pointNet/model/light_pointnet_256.py``): bias-free convs/FCs, T-Net applied to
  x,y only, encoder 9→64→64→[64×64 T]→64→128→256, cls head 256→128→64→k,
  seg head 320→256→128→64→k.

Both are expressed as batched ``[B, N, F]`` matmul stacks (pointwise dense layers ride
the MXU; global max-pool is mask-aware for variable-size test clouds).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ampnet_tpu.models.layers import (
    MaskedBatchNorm,
    SharedMLP,
    TNet,
    masked_max_pool,
)


class ClassicPointNetEncoder(nn.Module):
    """BasePointNet of pointNet/model/pointnet.py:47-97 (1024-d global)."""

    point_dim: int = 3
    global_feat: int = 1024
    bn_momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        bn_kw = dict(use_running_average=not train, bn_momentum=self.bn_momentum, dtype=self.dtype)
        t_in = TNet(
            output_dim=self.point_dim,
            bottleneck=1024,
            fc_features=(512, 256),
            use_bias=True,
            **bn_kw,
            name="input_tnet",
        )(x[..., : self.point_dim], mask)
        coords = jnp.einsum("bnd,bde->bne", x[..., : self.point_dim], t_in)
        # classic concat: transformed coords replace the originals (pointnet.py:73-74)
        h = jnp.concatenate([coords, x[..., self.point_dim :]], axis=-1)
        h = SharedMLP((64, 64), use_bias=True, **bn_kw, name="mlp_a")(h, mask)
        t_feat = TNet(
            output_dim=64,
            bottleneck=1024,
            fc_features=(512, 256),
            use_bias=True,
            **bn_kw,
            name="feature_tnet",
        )(h, mask)
        h = jnp.einsum("bnd,bde->bne", h, t_feat)
        local = h
        h = SharedMLP((64, 128, self.global_feat), use_bias=True, **bn_kw, name="mlp_b")(h, mask)
        return local, masked_max_pool(h, mask), t_feat


class LightPointNetEncoder(nn.Module):
    """Slim 256-d encoder of light_pointnet_256.py:48-97: bias-free, T-Net on x,y."""

    point_dim: int = 2
    global_feat: int = 256
    bn_momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        bn_kw = dict(use_running_average=not train, bn_momentum=self.bn_momentum, dtype=self.dtype)
        t_in = TNet(output_dim=self.point_dim, bottleneck=256, **bn_kw, name="input_tnet")(
            x[..., : self.point_dim], mask
        )
        coords = jnp.einsum("bnd,bde->bne", x[..., : self.point_dim], t_in)
        h = jnp.concatenate([coords, x[..., self.point_dim :]], axis=-1)
        h = SharedMLP((64, 64), **bn_kw, name="mlp_a")(h, mask)
        t_feat = TNet(output_dim=64, bottleneck=256, **bn_kw, name="feature_tnet")(h, mask)
        h = jnp.einsum("bnd,bde->bne", h, t_feat)
        local = h
        h = SharedMLP((64, 128, self.global_feat), **bn_kw, name="mlp_b")(h, mask)
        return local, masked_max_pool(h, mask), t_feat


class ClassificationPointNet(nn.Module):
    """Cloud classification head returning log-probabilities
    (pointnet.py:100-125 / light_pointnet_256.py:100-116)."""

    num_classes: int = 2
    variant: str = "light"  # 'classic' | 'light'
    point_dim: int = 2
    dropout: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        if self.variant == "classic":
            enc = ClassicPointNetEncoder(self.point_dim, dtype=self.dtype, name="encoder")
            dims, use_bias = (512, 256), True
        else:
            enc = LightPointNetEncoder(self.point_dim, dtype=self.dtype, name="encoder")
            dims, use_bias = (128, 64), False
        _, g, t_feat = enc(x, mask, train=train)
        h = g
        for i, d in enumerate(dims):
            h = nn.Dense(d, use_bias=use_bias, dtype=self.dtype, name=f"fc_{i}")(h)
            h = MaskedBatchNorm(use_running_average=not train, dtype=self.dtype, name=f"bn_{i}")(h)
            h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train, name="drop")(h)
        h = nn.Dense(self.num_classes, use_bias=True, dtype=self.dtype, name="fc_out")(h)
        return nn.log_softmax(h, axis=-1), t_feat


class SegmentationPointNet(nn.Module):
    """Per-point segmentation head over [global ‖ local]
    (pointnet.py:128-154 / light_pointnet_256.py:128-153). Returns raw logits."""

    num_classes: int = 5
    variant: str = "light"
    point_dim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        if self.variant == "classic":
            enc = ClassicPointNetEncoder(self.point_dim, dtype=self.dtype, name="encoder")
            dims = (512, 256, 128)
        else:
            enc = LightPointNetEncoder(self.point_dim, dtype=self.dtype, name="encoder")
            dims = (256, 128, 64)
        local, g, t_feat = enc(x, mask, train=train)
        n = local.shape[-2]
        gb = jnp.broadcast_to(g[..., None, :], (*g.shape[:-1], n, g.shape[-1]))
        h = jnp.concatenate([gb, local], axis=-1)
        for i, d in enumerate(dims):
            h = nn.Dense(d, use_bias=True, dtype=self.dtype, name=f"head_{i}")(h)
            h = MaskedBatchNorm(use_running_average=not train, dtype=self.dtype, name=f"bn_{i}")(
                h, mask
            )
            h = nn.relu(h)
        return nn.Dense(self.num_classes, use_bias=True, dtype=self.dtype, name="head_out")(h), t_feat
