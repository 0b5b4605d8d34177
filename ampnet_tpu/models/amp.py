"""AMP-Net: attention-enhanced multi-PointNet for arbitrary-scale point clouds.

TPU-first redesign of the reference model family
(``pointNet/model/pointnetAtt.py:50-279``):

* The reference encodes windows one at a time in a Python loop
  (``train_pointnet-attention.py:396-424``) and repeats global features per point in
  another loop (``pointnetAtt.py:193-197``). Here the whole cloud batch lives in one
  ``[B, W, N, C]`` tensor: the window encoder runs as a single ``[B*W, N, C]`` pass
  (one launch; MXU-friendly batched matmuls) and the per-point broadcast is a reshape.
* Padded windows are replicate-padded real data (as in ``collate_fns.py:42-45``), kept
  out of the attention via ``key_padding_mask`` and out of the loss via label −1.
* All shapes are static; the same compiled program serves every batch.

Architecture (AMP 'base' encoder, pointnetAtt.py:50-112):
  input [.., N, 9] → T-Net over first `point_dim` coords → concat(transformed, full 9)
  → MLP (9+pd)→64→64 → 64×64 feature T-Net → local 64-d features
  → MLP 64→64→128→128→G → masked max-pool → global G-d feature.

Segmentation head with attention (pointnetAtt.py:154-209):
  centroid pos-enc MLP 2→16→G (leaky-ReLU), masked 8-head MHA over window tokens,
  per-point concat [local64 ‖ attended-G] → MLP 320→G/2→64→num_classes.

GRU context variant (pointnetAtt.py:212-258) and the classification heads
(pointnetAtt.py:115-151, 261-279) share the same encoder.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ampnet_tpu.core.config import ModelConfig
from ampnet_tpu.models.attention import WindowMHA
from ampnet_tpu.models.layers import (
    MaskedBatchNorm,
    SharedMLP,
    TNet,
    masked_max_pool,
)


class EdgeLocalAggregation(nn.Module):
    """kNN edge-feature aggregation over each window's point graph (opt-in).

    Boundary-aware local context with no reference counterpart: the round-3
    error anatomy (BASELINE.md, ``ampnet test --analysis``) attributes ~72 % of
    the remaining tower errors to ground-truth class boundaries with two-way
    tower↔lines confusion, and the reference trunk — pointwise MLPs only
    (``pointNet/model/pointnetAtt.py:88-96``) — carries no neighborhood
    structure to resolve them.  This block computes, per point, its ``k``
    nearest in-window neighbors (one static ``[N, N]`` distance matmul — MXU
    work at N≤512, no dynamic shapes) and max-pools a shared MLP over
    DGCNN-style edge features ``[h_i ‖ h_j − h_i ‖ p_j − p_i]`` (Wang et al.
    2019).  The result is added residually, so with ``local_agg='none'`` (the
    default) the parameter tree and numerics are exactly the reference design
    and existing checkpoints restore unchanged.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,  # [B, N, C] per-point features
        coords: jnp.ndarray,  # [B, N, D] window-normalized coordinates
        mask: Optional[jnp.ndarray] = None,  # [B, N] True = real point
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, N, C = h.shape
        k = min(cfg.local_agg_k, N)
        c32 = coords.astype(jnp.float32)
        # squared pairwise distances as one [N, N] matmul per window
        sq = jnp.sum(c32 * c32, axis=-1)
        d2 = sq[:, :, None] - 2.0 * jnp.einsum("bnd,bmd->bnm", c32, c32) + sq[:, None, :]
        if mask is not None:
            # padded points are never picked as neighbors
            d2 = jnp.where(mask[:, None, :], d2, jnp.asarray(jnp.inf, d2.dtype))
        _, idx = jax.lax.top_k(-d2, k)  # [B, N, k]; self (d=0) is kept on purpose

        take = jax.vmap(lambda arr, ix: arr[ix])
        nbr_h = take(h, idx)  # [B, N, k, C]
        rel_p = (take(c32, idx) - c32[:, :, None, :]).astype(h.dtype)
        center = jnp.broadcast_to(h[:, :, None, :], (B, N, k, C))
        edges = jnp.concatenate([center, nbr_h - center, rel_p], axis=-1)

        nbr_ok = take(mask, idx) if mask is not None else None  # [B, N, k]
        edges = SharedMLP(
            (C,), use_running_average=not train, bn_momentum=cfg.bn_momentum,
            dtype=cfg.dtype, norm_mode=cfg.bn_mode, name="edge_mlp",
        )(edges, nbr_ok)
        g = masked_max_pool(edges, nbr_ok)  # [B, N, C]; every real point sees self
        if mask is not None:
            g = jnp.where(mask[..., None], g, jnp.zeros_like(g))
        return h + g


class WindowEncoder(nn.Module):
    """Shared PointNet window encoder over ``[B, W, N, F]``.

    Returns per-point local features ``[B, W, N, local]``, per-window global features
    ``[B, W, G]`` and the 64×64 feature-transform matrices ``[B, W, local, local]``
    (for the orthogonality regularizer, train_pointnet-attention.py:463-467).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,  # [B, W, N, F] or [B, N, F]
        point_mask: Optional[jnp.ndarray] = None,  # [..., N] True = real point
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        squeeze_windows = points.ndim == 3
        if squeeze_windows:
            points = points[:, None]
            point_mask = point_mask[:, None] if point_mask is not None else None
        B, W, N, F = points.shape
        x = points.reshape(B * W, N, F)
        mask = point_mask.reshape(B * W, N) if point_mask is not None else None

        bn_kw = dict(
            use_running_average=not train, bn_momentum=cfg.bn_momentum,
            dtype=cfg.dtype, norm_mode=cfg.bn_mode,
        )

        # input transform over the first `point_dim` coordinates (pointnetAtt.py:83-86)
        coords = x[..., : cfg.point_dim]
        t_in = TNet(output_dim=cfg.point_dim, bottleneck=256, **bn_kw, name="input_tnet")(
            coords, mask
        )
        coords_t = jnp.einsum("bnd,bde->bne", coords, t_in)
        # AMP quirk kept on purpose: transformed coords are concatenated with the FULL
        # 9-feature input (so x,y,z appear twice) — conv_1 in-channels 9+point_dim
        # (pointnetAtt.py:66,86)
        h = jnp.concatenate([coords_t, x], axis=-1)

        h = SharedMLP((64, 64), **bn_kw, name="mlp_a")(h, mask)

        if cfg.local_agg == "edge":
            h = EdgeLocalAggregation(cfg, name="edge_agg")(
                h, coords, mask, train=train
            )
        elif cfg.local_agg != "none":
            raise ValueError(f"unknown local_agg {cfg.local_agg!r}")

        t_feat = TNet(output_dim=64, bottleneck=256, **bn_kw, name="feature_tnet")(h, mask)
        h = jnp.einsum("bnd,bde->bne", h, t_feat)
        local_feats = h  # [B*W, N, 64]

        h = SharedMLP((64, 128, 128, cfg.global_feat), **bn_kw, name="mlp_b")(h, mask)
        global_feats = masked_max_pool(h, mask)  # [B*W, G]

        local_feats = local_feats.reshape(B, W, N, cfg.local_feat)
        global_feats = global_feats.reshape(B, W, cfg.global_feat)
        t_feat = t_feat.reshape(B, W, 64, 64)
        if squeeze_windows:
            local_feats = local_feats[:, 0]
            global_feats = global_feats[:, 0]
            t_feat = t_feat[:, 0]
        return local_feats, global_feats, t_feat


def _remat_encoder():
    """WindowEncoder with backward-pass rematerialization (cfg.remat): residual
    per-point activations are recomputed instead of stored. static_argnums=(3,)
    marks the ``train`` flag (a python bool) static — flax lifts ``__call__`` as
    ``(scope, points, point_mask, train)``."""
    return nn.remat(WindowEncoder, static_argnums=(3,))


class CentroidPositionalEncoding(nn.Module):
    """MLP 2→16→embed_dim with leaky ReLU (pointnetAtt.py:160-161,183-185)."""

    embed_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, centroids: jnp.ndarray) -> jnp.ndarray:  # [B, W, 2]
        h = nn.Dense(16, dtype=self.dtype, name="fc1")(centroids)
        h = nn.leaky_relu(h, negative_slope=0.01)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(h)


class GeomTokenEncoding(nn.Module):
    """Window-level geometry summary → token embedding (opt-in,
    ``cfg.att_geom_tokens``).

    The reference's window tokens carry only the centroid positional encoding
    (pointnetAtt.py:183-190), so attention keys/queries know WHERE a window is
    but not WHAT structure it holds. This encodes the per-window [mean ‖ max]
    pool of the offline eigenfeature columns (linearity/planarity/scatter/
    verticality/axis_z/radius — preproc/geomfeat.py) through the same tiny MLP
    shape as the pos-enc, added to the tokens. A window containing a vertical
    lattice (tower) then attends differently from pure canopy even when their
    256-d appearance features are ambiguous — the boundary-context lever the
    round-4 error anatomy licenses (VERDICT r4 #8)."""

    embed_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, summary: jnp.ndarray) -> jnp.ndarray:  # [B, W, 2E]
        h = nn.Dense(32, dtype=self.dtype, name="fc1")(summary)
        h = nn.leaky_relu(h, negative_slope=0.01)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(h)


class AttentionContext(nn.Module):
    """Cross-window context via centroid-pos-enc + masked MHA."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        global_feats: jnp.ndarray,  # [B, W, G]
        centroids: Optional[jnp.ndarray],  # [B, W, 2]
        window_pad_mask: Optional[jnp.ndarray],  # [B, W] True = padded window
        train: bool = False,
        use_pos_enc: bool = True,
        geom_summary: Optional[jnp.ndarray] = None,  # [B, W, 2E] (opt-in)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        tokens = global_feats
        if use_pos_enc and centroids is not None:
            tokens = tokens + CentroidPositionalEncoding(
                cfg.global_feat, dtype=cfg.dtype, name="pos_enc"
            )(centroids)
        if geom_summary is not None:
            tokens = tokens + GeomTokenEncoding(
                cfg.global_feat, dtype=cfg.dtype, name="geom_enc"
            )(geom_summary)
        out, weights = WindowMHA(
            cfg.global_feat, cfg.att_heads, dropout=cfg.dropout, dtype=cfg.dtype, name="mha"
        )(tokens, key_padding_mask=window_pad_mask, deterministic=not train)
        return out, weights


class GRUContext(nn.Module):
    """Sequential cross-window context (SegmentationWithGRU, pointnetAtt.py:212-233):
    a unidirectional GRU over the window sequence, hidden size ``gru_hidden``."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        global_feats: jnp.ndarray,  # [B, W, G]
        train: bool = False,
    ) -> jnp.ndarray:  # [B, W, H]
        cfg = self.cfg
        # lifted scan over the window axis (plain lax.scan would leak module
        # tracers). Round 3 MEASURED the obvious compile-time fix — unrolling
        # the shared cell (W <= 25, identical param tree and outputs) — as a
        # large NEGATIVE on this toolchain's remote-relay compiler: the
        # unrolled 9-window train program had not finished compiling at
        # 20+ minutes where this scan form compiles in 221 s (docs/design.md).
        # The scan stays; the GRU family's compile cost is a toolchain floor.
        ScanGRU = nn.scan(
            nn.GRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        cell = ScanGRU(features=cfg.gru_hidden, dtype=cfg.dtype, name="gru")
        b = global_feats.shape[0]
        carry = jnp.zeros((b, cfg.gru_hidden), global_feats.dtype)
        _, ys = cell(carry, global_feats)
        return ys


class SegmentationHead(nn.Module):
    """Per-point head over [local ‖ context] (pointnetAtt.py:167-174,199-207).
    Head convs carry biases (torch Conv1d default)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        local_feats: jnp.ndarray,  # [B, W, N, L]
        context: jnp.ndarray,  # [B, W, C] — per-window context vector
        point_mask: Optional[jnp.ndarray] = None,  # [B, W, N]
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, W, N, L = local_feats.shape
        ctx = jnp.broadcast_to(context[:, :, None, :], (B, W, N, context.shape[-1]))
        h = jnp.concatenate([local_feats, ctx], axis=-1)
        mask = point_mask

        mid = max(cfg.global_feat // 2, 64) if context.shape[-1] >= 128 else 128
        bn_kw = dict(use_running_average=not train, momentum=cfg.bn_momentum,
                     dtype=cfg.dtype, norm_mode=cfg.bn_mode)

        h = nn.Dense(mid, use_bias=True, dtype=cfg.dtype, name="dense_1")(h)
        h = MaskedBatchNorm(**bn_kw, name="bn_1")(h, mask)
        h = nn.relu(h)
        h = nn.Dropout(cfg.dropout, deterministic=not train, name="drop_1")(h)
        h = nn.Dense(64, use_bias=True, dtype=cfg.dtype, name="dense_2")(h)
        h = MaskedBatchNorm(**bn_kw, name="bn_2")(h, mask)
        h = nn.relu(h)
        h = nn.Dropout(cfg.dropout, deterministic=not train, name="drop_2")(h)
        return nn.Dense(cfg.num_classes, use_bias=True, dtype=cfg.dtype, name="dense_out")(h)


class AMPNetSegmenter(nn.Module):
    """Full AMP-Net segmentation model: encoder + pluggable context + per-point head.

    Inputs::
        points      [B, W, N, F]   window-tiled feature tensor
        centroids   [B, W, 2]      per-window x/y centroids (attention pos-enc)
        window_pad_mask [B, W]     True for replicate-padded windows
        point_mask  [B, W, N]      True for real points (None = all real)

    Returns ``(logits [B, W, N, num_classes], feature_transforms, attn_weights)``.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        centroids: Optional[jnp.ndarray] = None,
        window_pad_mask: Optional[jnp.ndarray] = None,
        point_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        cfg = self.cfg
        enc_cls = _remat_encoder() if cfg.remat else WindowEncoder
        local_feats, global_feats, t_feat = enc_cls(cfg, name="encoder")(
            points, point_mask, train
        )
        attn_weights = None
        if cfg.context == "attention":
            geom_summary = None
            if cfg.att_geom_tokens:
                if points.shape[-1] <= 9:
                    raise ValueError(
                        "att_geom_tokens needs the offline eigenfeature "
                        "columns (train --geom_features over a dataset "
                        f"preprocessed with --geom_features); input has "
                        f"{points.shape[-1]} features")
                g = points[..., 9:].astype(
                    cfg.dtype or jnp.float32)  # [B, W, N, E]
                if point_mask is not None:
                    m = point_mask[..., None].astype(g.dtype)
                    mean = (g * m).sum(-2) / jnp.maximum(m.sum(-2), 1.0)
                else:
                    mean = g.mean(-2)
                gmax = masked_max_pool(g, point_mask)  # [B, W, E]; total —
                # returns 0, never -inf, for fully-masked windows (layers.py)
                geom_summary = jnp.concatenate([mean, gmax], axis=-1)
            ctx, attn_weights = AttentionContext(cfg, name="context")(
                global_feats, centroids, window_pad_mask, train=train,
                geom_summary=geom_summary,
            )
        elif cfg.context == "gru":
            ctx = GRUContext(cfg, name="context")(global_feats, train=train)
        elif cfg.context == "none":
            ctx = global_feats
        else:
            raise ValueError(f"unknown context {cfg.context!r}")
        logits = SegmentationHead(cfg, name="head")(local_feats, ctx, point_mask, train=train)
        return logits, t_feat, attn_weights


class ClassificationHead(nn.Module):
    """Window-mixing conv + FC head (ClassificationWithAttention, pointnetAtt.py:127-149):
    Conv1d(num_w→1) over the window axis, then 256→128→num_classes."""

    cfg: ModelConfig
    num_out: int = 2

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        B, W, E = tokens.shape
        # Conv1d(num_w, 1, 1) ≡ a learned weighted sum over the window axis
        mix_w = self.param("mix_kernel", nn.initializers.lecun_normal(), (W, 1), jnp.float32)
        mix_b = self.param("mix_bias", nn.initializers.zeros, (1,), jnp.float32)
        h = jnp.einsum("bwe,wo->be", tokens, mix_w.astype(tokens.dtype)) + mix_b.astype(
            tokens.dtype
        )
        h = nn.relu(h)
        h = nn.Dense(128, use_bias=True, dtype=cfg.dtype, name="fc_2")(h)
        # always batch-mode: this input is [B, E] (one vector per cloud), so
        # 'window' per-point statistics have no axis to reduce over here
        h = MaskedBatchNorm(
            use_running_average=not train, momentum=cfg.bn_momentum, dtype=cfg.dtype, name="bn_2"
        )(h)
        h = nn.relu(h)
        return nn.Dense(self.num_out, use_bias=True, dtype=cfg.dtype, name="fc_3")(h)


class AMPNetClassifier(nn.Module):
    """Binary (or k-way) cloud classification from attended window tokens
    (ClassificationWithAttention / ClassificationFromGRU, pointnetAtt.py:115-151,261-279)."""

    cfg: ModelConfig
    num_out: int = 2

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        centroids: Optional[jnp.ndarray] = None,
        window_pad_mask: Optional[jnp.ndarray] = None,
        point_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        cfg = self.cfg
        enc_cls = _remat_encoder() if cfg.remat else WindowEncoder
        _, global_feats, t_feat = enc_cls(cfg, name="encoder")(
            points, point_mask, train
        )
        attn_weights = None
        if cfg.context == "attention":
            # classification attention has no positional encoding (commented out in the
            # reference, pointnetAtt.py:120-121,134-137)
            ctx, attn_weights = AttentionContext(cfg, name="context")(
                global_feats, None, window_pad_mask, train=train, use_pos_enc=False
            )
        elif cfg.context == "gru":
            ctx = GRUContext(cfg, name="context")(global_feats, train=train)
        else:
            ctx = global_feats
        logits = ClassificationHead(cfg, self.num_out, name="head")(ctx, train=train)
        return logits, t_feat, attn_weights
