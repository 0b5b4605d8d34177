"""int8 inference path for the AMP window encoder.

Same structure as models/fused_infer.py but the big MLP chains run through the
int8 Pallas kernel (dynamic activation scales, per-channel weight scales). The
T-Net FC heads, the transforms, attention and the segmentation head stay fp32 —
they are a small fraction of the FLOPs and the most precision-sensitive parts.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ampnet_tpu.models.fused_infer import _folded_chain, _tnet_apply
from ampnet_tpu.ops.pallas.quantized_mlp import quantize_chain, quantized_mlp_chain


def encode_windows_int8(
    variables: Dict,
    points: jnp.ndarray,  # [B, W, N, F] or [M, N, F]
    interpret: bool = False,
):
    """(local_feats, global_feats, t_feat) with int8 encoder chains."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if "encoder" in params:
        params, stats = params["encoder"], stats["encoder"]

    squeeze = points.ndim == 4
    if squeeze:
        b, w, n, f = points.shape
        x = points.reshape(b * w, n, f)
    else:
        x = points

    point_dim = params["input_tnet"]["trunk"]["mlp_0"]["dense"]["kernel"].shape[0]
    coords = x[..., :point_dim]
    # T-Nets stay fp32 (tiny + sensitive: their output multiplies the features)
    t_in = _tnet_apply(params["input_tnet"], stats["input_tnet"], coords, interpret)
    coords_t = jnp.einsum("mnd,mde->mne", coords, t_in)
    h = jnp.concatenate([coords_t, x], axis=-1)

    a_w, a_b = _folded_chain(params["mlp_a"], stats["mlp_a"], ("mlp_0", "mlp_1"))
    a_q, a_s = quantize_chain(a_w)
    h = quantized_mlp_chain(h, a_q, a_s, a_b, interpret=interpret)

    t_feat = _tnet_apply(params["feature_tnet"], stats["feature_tnet"], h, interpret)
    local = jnp.einsum("mnd,mde->mne", h, t_feat)

    b_w, b_b = _folded_chain(
        params["mlp_b"], stats["mlp_b"], ("mlp_0", "mlp_1", "mlp_2", "mlp_3")
    )
    b_q, b_s = quantize_chain(b_w)
    glob = quantized_mlp_chain(
        local, b_q, b_s, b_b, pool=True, return_acts=False, interpret=interpret
    )

    if squeeze:
        local = local.reshape(b, w, n, -1)
        glob = glob.reshape(b, w, -1)
        t_feat = t_feat.reshape(b, w, *t_feat.shape[1:])
    return local, glob, t_feat
