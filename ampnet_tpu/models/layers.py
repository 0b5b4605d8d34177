"""Shared model building blocks (Flax linen).

Design notes (TPU-first):

* The reference's ``nn.Conv1d(cin, cout, 1)`` layers are pointwise — i.e. a dense layer
  applied per point. Here they are plain ``[..., N, Cin] @ [Cin, Cout]`` matmuls which
  XLA batches straight onto the MXU; no conv machinery, no transposes.
* BatchNorm1d-over-channels becomes feature-axis BatchNorm with batch statistics over
  every leading axis. Optionally mask-aware: padded points can be excluded from the
  statistics (the reference never pads points inside a window at train time, so the
  default path has no mask and compiles to a plain fused normalize).
* The T-Net (input/feature transform) is the reference TransformationNet
  (``pointNet/model/pointnetAtt.py:7-47`` for the 256-bottleneck variant and
  ``pointNet/model/pointnet.py:6-44`` for the classic 1024 one), expressed as one
  vectorized stack over ``[B, N, C]``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the trailing feature axis with optional validity mask.

    Equivalent to torch BatchNorm1d on [B, C, N] / [B, C]: statistics are computed over
    all non-feature axes (and only over ``mask``-true positions when given).
    torch's momentum 0.1 corresponds to flax-style ``ra = 0.9*ra + 0.1*batch``.

    ``norm_mode='window'`` switches to per-sample (instance-norm-style) statistics —
    reduce over the point axis only, in train AND eval. That removes the global
    batch-statistics barrier that dominates train-mode forward cost on TPU
    (docs/design.md) and makes window encodings batch-independent; it is a semantic
    departure from the reference, offered as an opt-in (ModelConfig.bn_mode).
    """

    use_running_average: bool = False
    momentum: float = 0.9
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    norm_mode: str = "batch"  # 'batch' | 'window'

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if self.norm_mode == "window" and x.ndim >= 2:
            # per-sample stats over the second-to-last (point) axis; no running
            # averages involved — train/eval symmetric
            xf = x.astype(jnp.float32)
            if mask is None:
                mean = jnp.mean(xf, axis=-2, keepdims=True)
                var = jnp.mean(jnp.square(xf), axis=-2, keepdims=True) - jnp.square(mean)
            else:
                mw = mask.astype(jnp.float32)[..., None]
                denom = jnp.maximum(mw.sum(axis=-2, keepdims=True), 1.0)
                mean = (xf * mw).sum(axis=-2, keepdims=True) / denom
                var = (jnp.square(xf) * mw).sum(axis=-2, keepdims=True) / denom - jnp.square(mean)
            y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
            return y * scale.astype(x.dtype) + bias.astype(x.dtype)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            else:
                m = mask.astype(jnp.float32)[..., None]
                denom = jnp.maximum(m.sum(axis=reduce_axes), 1.0)
                mean = (xf * m).sum(axis=reduce_axes) / denom
                var = (jnp.square(xf) * m).sum(axis=reduce_axes) / denom - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class PointMLP(nn.Module):
    """One pointwise dense → BN → ReLU block (the reference's Conv1d(k=1)+BN+ReLU)."""

    features: int
    use_bias: bool = False
    use_running_average: bool = False
    bn_momentum: float = 0.9
    relu: bool = True
    dtype: Optional[jnp.dtype] = None
    norm_mode: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype, name="dense")(x)
        x = MaskedBatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            norm_mode=self.norm_mode,
            name="bn",
        )(x, mask)
        if self.relu:
            x = nn.relu(x)
        return x


class SharedMLP(nn.Module):
    """A chain of PointMLP blocks — the per-point encoder trunk."""

    features: Sequence[int]
    use_bias: bool = False
    use_running_average: bool = False
    bn_momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None
    norm_mode: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = PointMLP(
                f,
                use_bias=self.use_bias,
                use_running_average=self.use_running_average,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                norm_mode=self.norm_mode,
                name=f"mlp_{i}",
            )(x, mask)
        return x


def masked_max_pool(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -2) -> jnp.ndarray:
    """Max over the point axis, ignoring padded points (the reference's
    nn.MaxPool1d(num_points) global pool, e.g. pointnetAtt.py:104).

    A fully-masked reduction yields 0, not −inf: the input pipeline never
    produces an all-padded window (padding replicates real points,
    collate_fns.py:42-45 semantics), but −inf from a degenerate caller would
    NaN downstream attention rows even for REAL windows (NaN·0 = NaN through
    the key-padding mask), so the pool is made total here."""
    if mask is not None:
        neg = jnp.asarray(-jnp.inf, x.dtype)
        out = jnp.max(jnp.where(mask[..., None], x, neg), axis=axis)
        any_real = jnp.any(mask, axis=-1)
        return jnp.where(any_real[..., None], out, jnp.zeros_like(out))
    return jnp.max(x, axis=axis)


class TNet(nn.Module):
    """Spatial/feature transformer predicting a [D, D] matrix (+ identity).

    ``bottleneck=256`` with bias-free layers matches the AMP-Net variant
    (pointnetAtt.py:7-47); ``bottleneck=1024, use_bias=True, fc=(512, 256)`` matches
    the classic PointNet T-Net (pointnet.py:6-44).
    """

    output_dim: int
    bottleneck: int = 256
    conv_features: Tuple[int, ...] = (64, 128)
    fc_features: Tuple[int, ...] = (256, 128)
    use_bias: bool = False
    use_running_average: bool = False
    bn_momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None
    # per-window stats apply to the point-wise trunk only; the FC head's BNs act on
    # [B, C] where "per-window" has no meaning
    norm_mode: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # x: [B, N, D] → transform matrices [B, D, D]
        kw = dict(
            use_bias=self.use_bias,
            use_running_average=self.use_running_average,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
        )
        h = SharedMLP(
            tuple(self.conv_features) + (self.bottleneck,), **kw,
            norm_mode=self.norm_mode, name="trunk",
        )(x, mask)
        g = masked_max_pool(h, mask)  # [B, bottleneck]
        for i, f in enumerate(self.fc_features):
            g = nn.Dense(f, use_bias=self.use_bias, dtype=self.dtype, name=f"fc_{i}")(g)
            g = MaskedBatchNorm(
                use_running_average=self.use_running_average,
                momentum=self.bn_momentum,
                dtype=self.dtype,
                name=f"fc_bn_{i}",
            )(g)
            g = nn.relu(g)
        # final layer has a bias in both reference variants and is zero-init so the
        # initial transform is the identity
        m = nn.Dense(
            self.output_dim * self.output_dim,
            use_bias=True,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc_out",
        )(g)
        m = m.reshape(*m.shape[:-1], self.output_dim, self.output_dim)
        return m + jnp.eye(self.output_dim, dtype=m.dtype)
