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

All of them take ``(points [B, W, N, F], centroids [B, W, 2], window_pad_mask)``
and return per-point logits; numerics are pinned by tests/test_backends.py.

Every non-'xla' backend folds the RUNNING BatchNorm statistics into the
kernels, which is only the model's inference semantics under
``bn_mode='batch'`` — window-mode (instance-norm-style) statistics are
per-input and never recorded, so ``make_forward`` rejects the combination
instead of silently producing wrong logits.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ampnet_tpu.models.fused_infer import encode_windows_fused
from ampnet_tpu.models.quantized_infer import encode_windows_int8


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

    if backend not in ("folded", "bf16", "fused", "int8"):
        raise ValueError(f"unknown backend {backend!r}")
    if getattr(cfg.model, "bn_mode", "batch") != "batch":
        raise ValueError(
            f"backend {backend!r} folds running BatchNorm statistics, which "
            f"bn_mode={cfg.model.bn_mode!r} models neither use nor update — "
            "use backend='xla' for window-mode BatchNorm"
        )
    if getattr(cfg.model, "local_agg", "none") != "none":
        raise ValueError(
            f"backend {backend!r} reassembles the reference encoder layout and "
            f"does not know the local_agg={cfg.model.local_agg!r} edge block — "
            "use backend='xla' for edge-aggregation models"
        )
    if getattr(cfg.model, "att_geom_tokens", False):
        raise ValueError(
            f"backend {backend!r} reassembles the reference attention layout "
            "and does not know the geom-token encoding (att_geom_tokens) — "
            "use backend='xla' for geom-token models"
        )

    from ampnet_tpu.models.folded_infer import (
        attention_head_folded,
        encode_windows_folded,
    )

    if backend in ("folded", "bf16"):
        dtype = jnp.bfloat16 if backend == "bf16" else jnp.float32

        def forward(variables, points, centroids, pad_mask):
            local, glob, _ = encode_windows_folded(variables, points, dtype=dtype)
            return attention_head_folded(
                variables, local, glob, centroids, pad_mask,
                num_heads=cfg.model.att_heads, dtype=dtype,
            )

        return forward

    encode = encode_windows_fused if backend == "fused" else encode_windows_int8

    def forward(variables, points, centroids, pad_mask):
        local, glob, _ = encode(variables, points, interpret=interpret)
        # same folded attention+head evaluation as the folded backend, fp32
        return attention_head_folded(
            variables, local, glob, centroids, pad_mask, num_heads=cfg.model.att_heads
        )

    return forward
