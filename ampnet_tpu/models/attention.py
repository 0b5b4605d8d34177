"""Masked multi-head self-attention over window-global tokens.

Matches torch ``nn.MultiheadAttention(embed_dim, num_heads, dropout)`` semantics as used
by the reference (``pointNet/model/pointnetAtt.py:163-165,187-190``): joint in-projection
with bias, scaled dot-product, ``key_padding_mask`` (True = ignore), dropout on the
attention weights, out-projection with bias.

The sequence here is the ≤W window tokens of one cloud (W ≤ 9 train / ≤ 25 test), so the
whole attention is a tiny [B, W, W] program — XLA fuses it; no flash/blockwise machinery
is warranted at this size (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


class WindowMHA(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, W, E]
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, W] True = pad/ignore
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, W, E = tokens.shape
        H = self.num_heads
        assert E == self.embed_dim and E % H == 0
        D = E // H

        qkv = nn.Dense(3 * E, use_bias=True, dtype=self.dtype, name="in_proj")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(x):
            return x.reshape(B, W, H, D).transpose(0, 2, 1, 3)  # [B, H, W, D]

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(D, jnp.float32))

        if key_padding_mask is not None:
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
            scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)

        weights = nn.softmax(scores, axis=-1)
        if self.dropout > 0.0:
            weights = nn.Dropout(self.dropout, deterministic=deterministic, name="attn_drop")(
                weights
            )
        out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, W, E)
        out = nn.Dense(E, use_bias=True, dtype=self.dtype, name="out_proj")(out)
        # averaged-over-heads weights, like torch need_weights=True default
        return out, weights.mean(axis=1)
