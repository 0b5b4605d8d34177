"""Plain-XLA folded inference encoder with a selectable compute dtype.

Inference-mode BatchNorm is an affine map (running stats), so every
Conv+BN(+ReLU) block of the AMP window encoder (``pointNet/model/
pointnetAtt.py:50-112``) folds into its dense kernel: y = relu(x @ W' + b').
That matters twice on TPU:

* it removes the separate BN normalize pass entirely (XLA fuses it anyway, so
  fp32 'folded' ≈ fp32 'xla' in speed — the fold exists for the dtype below);
* it makes an END-TO-END reduced-precision path possible. Flax's
  ``MaskedBatchNorm`` keeps statistics in fp32, so running the unfolded model
  with ``dtype=bfloat16`` inserts an fp32 upcast + bf16 downcast around every
  BN — an extra HBM round-trip per layer that made whole-model bf16 inference
  measurably SLOWER than fp32 (6.16 vs 4.67 ms encoder forward,
  docs/design.md). With BN folded there is nothing left to upcast: the encoder
  is a pure chain of bf16 matmuls + ReLUs, and the HBM-bound layer traffic
  (the measured wall for this model, docs/design.md "Where the time goes")
  halves.

Precision layout for ``dtype=bfloat16``: the big per-point chains (T-Net
trunks, mlp_a, mlp_b, the segmentation head) run in bf16 — the MXU accumulates
in fp32 regardless; the tiny precision-sensitive pieces (T-Net FC heads and
the [D,D] transform outputs, the window-token attention) stay fp32 — they are
O(B·W) not O(B·W·N), so they cost nothing.

Numerics pinned against the fp32 XLA forward in tests/test_backends.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp

from ampnet_tpu.ops.pallas.fused_mlp import fold_bn


def folded_chain_params(params: Dict, stats: Dict, names: Sequence[str]):
    """(W', b') per block of a SharedMLP, with BN folded (fp32)."""
    ws, bs = [], []
    for n in names:
        p, s = params[n], stats[n]
        w, b = fold_bn(
            p["dense"]["kernel"], p["bn"]["scale"], p["bn"]["bias"],
            s["bn"]["mean"], s["bn"]["var"],
            dense_bias=p["dense"].get("bias"),
        )
        ws.append(w)
        bs.append(b)
    return ws, bs


def _chain(h: jnp.ndarray, ws, bs, dtype) -> jnp.ndarray:
    """relu(h @ W' + b') chain in ``dtype`` (fp32 accumulation on the MXU)."""
    h = h.astype(dtype)
    for w, b in zip(ws, bs):
        h = jnp.maximum(h @ w.astype(dtype) + b.astype(dtype), 0)
    return h


def _tnet_apply(params: Dict, stats: Dict, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """T-Net forward: trunk chain in ``dtype``, pooled FC head in fp32.

    Returns fp32 [M, D, D] transforms (the output multiplies the features —
    the precision-sensitive spot, kept fp32 like the int8 backend does).
    """
    ws, bs = folded_chain_params(params["trunk"], stats["trunk"], ("mlp_0", "mlp_1", "mlp_2"))
    h = _chain(x, ws, bs, dtype)
    g = jnp.max(h, axis=-2).astype(jnp.float32)  # [M, bottleneck]
    i = 0
    while f"fc_{i}" in params:
        w, b = fold_bn(
            params[f"fc_{i}"]["kernel"],
            params[f"fc_bn_{i}"]["scale"], params[f"fc_bn_{i}"]["bias"],
            stats[f"fc_bn_{i}"]["mean"], stats[f"fc_bn_{i}"]["var"],
            dense_bias=params[f"fc_{i}"].get("bias"),
        )
        g = jnp.maximum(g @ w + b, 0.0)
        i += 1
    out = g @ params["fc_out"]["kernel"] + params["fc_out"]["bias"]
    d = int(out.shape[-1] ** 0.5)
    return out.reshape(-1, d, d) + jnp.eye(d, dtype=out.dtype)


def encode_windows_folded(
    variables: Dict,
    points: jnp.ndarray,  # [B, W, N, F] or [M, N, F]
    dtype: Optional[jnp.dtype] = None,
    interpret: bool = False,  # unused; signature-compatible with the Pallas backends
):
    """Inference-mode (local, global, t_feat) of the AMP encoder, BN folded.

    Mirrors ``WindowEncoder.__call__`` (models/amp.py) exactly, including the
    reference's transformed-coords ‖ full-input concat quirk
    (pointnetAtt.py:66,86).
    """
    del interpret
    dtype = dtype or jnp.float32
    params = variables["params"]
    stats = variables["batch_stats"]
    if "encoder" in params:  # full AMPNet variables vs a bare WindowEncoder's
        params, stats = params["encoder"], stats["encoder"]

    squeeze = points.ndim == 4
    if squeeze:
        b, w, n, f = points.shape
        x = points.reshape(b * w, n, f)
    else:
        x = points
    x = x.astype(jnp.float32)

    point_dim = params["input_tnet"]["trunk"]["mlp_0"]["dense"]["kernel"].shape[0]
    coords = x[..., :point_dim]
    t_in = _tnet_apply(params["input_tnet"], stats["input_tnet"], coords, dtype)
    coords_t = jnp.einsum("mnd,mde->mne", coords, t_in)
    h = jnp.concatenate([coords_t, x], axis=-1)

    a_w, a_b = folded_chain_params(params["mlp_a"], stats["mlp_a"], ("mlp_0", "mlp_1"))
    h = _chain(h, a_w, a_b, dtype)  # [M, N, 64] in dtype

    t_feat = _tnet_apply(params["feature_tnet"], stats["feature_tnet"], h, dtype)
    # feature transform applied in ``dtype`` — [M,N,64]·[M,64,64] is part of the
    # HBM-bound bulk; the transform matrices themselves stay fp32 above
    local = jnp.einsum("mnd,mde->mne", h, t_feat.astype(dtype))

    b_w, b_b = folded_chain_params(
        params["mlp_b"], stats["mlp_b"], ("mlp_0", "mlp_1", "mlp_2", "mlp_3")
    )
    glob = jnp.max(_chain(local, b_w, b_b, dtype), axis=-2)

    if squeeze:
        local = local.reshape(b, w, n, -1)
        glob = glob.reshape(b, w, -1)
        t_feat = t_feat.reshape(b, w, *t_feat.shape[1:])
    return local, glob, t_feat


def attention_head_folded(
    variables: Dict,
    local: jnp.ndarray,  # [B, W, N, L] (any float dtype)
    glob: jnp.ndarray,  # [B, W, E]
    centroids: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
    num_heads: int = 8,
    dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """AttentionContext + SegmentationHead (eval), BN folded, fp32 logits out.

    The window-token attention (O(B·W) work) runs fp32; the per-point head
    chain (O(B·W·N·320) traffic) runs in ``dtype``.
    """
    dtype = dtype or jnp.float32
    p = variables["params"]
    s = variables["batch_stats"]
    ctx_p = p["context"]

    tokens = glob.astype(jnp.float32)
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
    to_heads = lambda t: t.reshape(B, W, H, D).transpose(0, 2, 1, 3)
    q, k, v = to_heads(q), to_heads(k), to_heads(v)
    import jax

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(D, jnp.float32))
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :], jnp.finfo(jnp.float32).min, scores)
    wts = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", wts, v).transpose(0, 2, 1, 3).reshape(B, W, E)
    ctx = ctx @ mha["out_proj"]["kernel"] + mha["out_proj"]["bias"]

    hp, hs = p["head"], s["head"]
    h = jnp.concatenate(
        [
            local.astype(dtype),
            jnp.broadcast_to(ctx[:, :, None, :], (*local.shape[:3], E)).astype(dtype),
        ],
        axis=-1,
    )
    for name in ("dense_1", "dense_2"):
        bn = name.replace("dense", "bn")
        w, b = fold_bn(
            hp[name]["kernel"], hp[bn]["scale"], hp[bn]["bias"],
            hs[bn]["mean"], hs[bn]["var"], dense_bias=hp[name].get("bias"),
        )
        h = jnp.maximum(h @ w.astype(dtype) + b.astype(dtype), 0)
    out = h @ hp["dense_out"]["kernel"].astype(dtype) + hp["dense_out"]["bias"].astype(dtype)
    return out.astype(jnp.float32)
