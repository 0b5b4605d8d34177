"""Window-axis (sequence-parallel analog) sharding for giant clouds.

The reference's answer to arbitrary-scale clouds is the window decomposition itself
(SURVEY.md §5): a cloud becomes ≤W windows whose only interaction is one attention
layer over W tiny 256-d tokens. That structure is exactly sequence parallelism:

* shard the **window axis** across chips — each chip encodes its windows fully
  locally (the encoder is per-window, zero communication);
* all-gather the per-window global tokens over ICI — W×256 floats ≈ 9 KB, free;
* run attention + the per-point head on local windows against the gathered tokens.

This module implements that with ``shard_map`` over a 2-D ``Mesh('data', 'window')``
so clouds scale past a single chip's memory (the `data` axis batches clouds, the
`window` axis splits each cloud's windows). Inference-mode (the giant-cloud path is
a serving concern; training uses plain DP where the batch axis is plentiful).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ampnet_tpu.core.config import AMPNetConfig


def make_2d_mesh(n_data: int, n_window: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    arr = np.asarray(devices[: n_data * n_window]).reshape(n_data, n_window)
    return Mesh(arr, ("data", "window"))


def make_window_sharded_forward(model, cfg: AMPNetConfig, mesh: Mesh):
    """forward(variables, points [B, W, N, F], centroids [B, W, 2], pad [B, W])
    with B sharded over 'data' and W sharded over 'window'.

    The encoder runs on purely local shards; the only collective is the
    all-gather of window tokens (and the pad mask) over the 'window' axis before
    attention. Per-point logits come back sharded exactly like the input.
    """
    from ampnet_tpu.models.amp import (
        AttentionContext,
        SegmentationHead,
        WindowEncoder,
    )

    encoder = WindowEncoder(cfg.model)
    context = AttentionContext(cfg.model)
    head = SegmentationHead(cfg.model)

    def local_fn(variables, points, centroids, pad):
        # points: [b_loc, w_loc, N, F] — this chip's cloud/window shard
        enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        }
        local_feats, global_feats, _ = encoder.apply(enc_vars, points, train=False)

        # gather every chip's window tokens for this cloud shard (ICI, ~KBs)
        tokens = jax.lax.all_gather(global_feats, "window", axis=1, tiled=True)
        cents = jax.lax.all_gather(centroids, "window", axis=1, tiled=True)
        pads = jax.lax.all_gather(pad, "window", axis=1, tiled=True)

        ctx_vars = {"params": variables["params"]["context"]}
        ctx_all, _ = context.apply(
            ctx_vars, tokens, cents, pads, train=False
        )  # [b_loc, W_total, G]
        # keep only this chip's windows for the per-point head
        w_loc = points.shape[1]
        idx = jax.lax.axis_index("window") * w_loc
        ctx_local = jax.lax.dynamic_slice_in_dim(ctx_all, idx, w_loc, axis=1)

        head_vars = {
            "params": variables["params"]["head"],
            "batch_stats": variables["batch_stats"]["head"],
        }
        logits = head.apply(head_vars, local_feats, ctx_local, None, train=False)
        return logits

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P("data", "window"), P("data", "window"), P("data", "window")),
        out_specs=P("data", "window"),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_cloud_batch(batch, mesh: Mesh):
    """Place points/centroids/pad onto the 2-D mesh (B over data, W over window)."""
    spec = NamedSharding(mesh, P("data", "window"))
    return {
        k: jax.device_put(v, spec)
        for k, v in batch.items()
        if isinstance(v, (np.ndarray, jnp.ndarray))
    }
