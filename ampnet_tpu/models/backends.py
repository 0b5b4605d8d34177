"""Inference backends: one forward() signature over five implementations.

* ``'xla'``   — the Flax model as-is (reference implementation, always available);
* ``'folded'``— plain-XLA with inference BatchNorm folded into the dense kernels
  (models/folded_infer.py): exact affine rewrite of 'xla', measured ~3% faster
  at the bench geometry — the fastest single-chip path;
* ``'bf16'``  — the same assembly with the per-point chains in bfloat16.
  Measured NEUTRAL-to-slightly-slower than fp32 even with BN folded (4.33 vs
  4.16 ms median): the layer dots sit at a per-dot floor that neither halved
  activation traffic nor bf16 MXU rates move — confirming (from a second
  angle) the round-2 closure of the reduced-precision inference track;
* ``'fused'`` — Pallas VMEM-resident encoder chains (fp32, BN folded) + plain-jnp
  attention/head evaluated straight from the parameter tree;
* ``'int8'``  — same assembly with int8 encoder chains (dynamic activation scales).

All three take ``(points [B, W, N, F], centroids [B, W, 2], window_pad_mask)`` and
return per-point logits; numerics are pinned by tests/test_backends.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ampnet_tpu.models.fused_infer import encode_windows_fused
from ampnet_tpu.models.quantized_infer import encode_windows_int8


def _attention_head_forward(
    variables: Dict,
    local: jnp.ndarray,  # [B, W, N, L]
    glob: jnp.ndarray,  # [B, W, E]
    centroids: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
    num_heads: int = 8,
) -> jnp.ndarray:
    """Plain-jnp evaluation of AttentionContext + SegmentationHead (eval mode) from
    the AMPNetSegmenter parameter tree (models/amp.py)."""
    p = variables["params"]
    s = variables["batch_stats"]
    ctx_p = p["context"]

    tokens = glob
    if centroids is not None and "pos_enc" in ctx_p:
        pe = ctx_p["pos_enc"]
        h = centroids @ pe["fc1"]["kernel"] + pe["fc1"]["bias"]
        h = jnp.where(h >= 0, h, 0.01 * h)  # leaky_relu
        tokens = tokens + (h @ pe["fc2"]["kernel"] + pe["fc2"]["bias"])

    mha = ctx_p["mha"]
    B, W, E = tokens.shape
    H = num_heads
    D = E // H
    qkv = tokens @ mha["in_proj"]["kernel"] + mha["in_proj"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    to_heads = lambda x: x.reshape(B, W, H, D).transpose(0, 2, 1, 3)
    q, k, v = to_heads(q), to_heads(k), to_heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(D, jnp.float32))
    if pad_mask is not None:
        scores = jnp.where(
            pad_mask[:, None, None, :], jnp.finfo(jnp.float32).min, scores
        )
    w = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(B, W, E)
    ctx = ctx @ mha["out_proj"]["kernel"] + mha["out_proj"]["bias"]

    # per-point head: [local ‖ context] → dense/bn/relu ×2 → classes (dropout off)
    hp, hs = p["head"], s["head"]
    n = local.shape[2]
    h = jnp.concatenate(
        [local, jnp.broadcast_to(ctx[:, :, None, :], (*local.shape[:3], E))], axis=-1
    )

    def dense_bn_relu(h, dense, bn_p, bn_s):
        h = h @ dense["kernel"] + dense["bias"]
        inv = jax.lax.rsqrt(bn_s["var"] + 1e-5)
        return jnp.maximum((h - bn_s["mean"]) * inv * bn_p["scale"] + bn_p["bias"], 0.0)

    h = dense_bn_relu(h, hp["dense_1"], hp["bn_1"], hs["bn_1"])
    h = dense_bn_relu(h, hp["dense_2"], hp["bn_2"], hs["bn_2"])
    return h @ hp["dense_out"]["kernel"] + hp["dense_out"]["bias"]


def make_forward(
    model, cfg, backend: str = "xla", interpret: Optional[bool] = None
) -> Callable:
    """Returns forward(variables, points, centroids, pad_mask) → logits.
    ``interpret`` defaults to True on the CPU backend (compiled Pallas is
    TPU-only) and False elsewhere."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if backend == "xla":

        def forward(variables, points, centroids, pad_mask):
            logits, _, _ = model.apply(variables, points, centroids, pad_mask, train=False)
            return logits

        return forward

    if backend in ("folded", "bf16"):
        from ampnet_tpu.models.folded_infer import (
            attention_head_folded,
            encode_windows_folded,
        )

        dtype = jnp.bfloat16 if backend == "bf16" else jnp.float32

        def forward(variables, points, centroids, pad_mask):
            local, glob, _ = encode_windows_folded(variables, points, dtype=dtype)
            return attention_head_folded(
                variables, local, glob, centroids, pad_mask,
                num_heads=cfg.model.att_heads, dtype=dtype,
            )

        return forward

    encode = encode_windows_fused if backend == "fused" else (
        encode_windows_int8 if backend == "int8" else None
    )
    if encode is None:
        raise ValueError(f"unknown backend {backend!r}")

    def forward(variables, points, centroids, pad_mask):
        local, glob, _ = encode(variables, points, interpret=interpret)
        return _attention_head_forward(
            variables, local, glob, centroids, pad_mask, num_heads=cfg.model.att_heads
        )

    return forward
