"""Fused inference path for the AMP window encoder.

Rebuilds ``WindowEncoder.__call__`` (models/amp.py) for inference out of the Pallas
fused-MLP kernels: every Conv+BN+ReLU chain runs as one VMEM-resident kernel with
BatchNorm folded into the matmuls, and the T-Net trunks write ONLY their pooled
vectors back to HBM. The tiny FC stacks and the [N,64]×[64,64] feature transform
stay in XLA (they are matmul-bound and already optimal).

Numerically equivalent to ``model.apply(..., train=False)`` up to float
re-association (validated in tests/test_pallas.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ampnet_tpu.ops.pallas.fused_mlp import fold_bn, fused_mlp_chain


def _folded_chain(params: Dict, stats: Dict, names) -> Tuple[list, list]:
    ws, bs = [], []
    for n in names:
        p, s = params[n], stats[n]
        w, b = fold_bn(
            p["dense"]["kernel"], p["bn"]["scale"], p["bn"]["bias"],
            s["bn"]["mean"], s["bn"]["var"],
        )
        ws.append(w)
        bs.append(b)
    return ws, bs


def _tnet_apply(params: Dict, stats: Dict, x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """T-Net: fused trunk (pool-only) + XLA FC head → [M, D, D] transforms."""
    trunk_w, trunk_b = _folded_chain(
        params["trunk"], stats["trunk"], ("mlp_0", "mlp_1", "mlp_2")
    )
    g = fused_mlp_chain(
        x, trunk_w, trunk_b, pool=True, return_acts=False, interpret=interpret
    )  # [M, bottleneck]
    i = 0
    while f"fc_{i}" in params:
        w, b = fold_bn(
            params[f"fc_{i}"]["kernel"],
            params[f"fc_bn_{i}"]["scale"], params[f"fc_bn_{i}"]["bias"],
            stats[f"fc_bn_{i}"]["mean"], stats[f"fc_bn_{i}"]["var"],
        )
        g = jnp.maximum(g @ w + b, 0.0)
        i += 1
    out = g @ params["fc_out"]["kernel"] + params["fc_out"]["bias"]
    d = int(out.shape[-1] ** 0.5)
    return out.reshape(-1, d, d) + jnp.eye(d, dtype=out.dtype)


def encode_windows_fused(
    variables: Dict,
    points: jnp.ndarray,  # [B, W, N, F] or [M, N, F]
    interpret: bool = False,
):
    """Inference-mode (local_feats, global_feats) of the AMP encoder via Pallas."""
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

    point_dim = params["input_tnet"]["trunk"]["mlp_0"]["dense"]["kernel"].shape[0]
    coords = x[..., :point_dim]
    t_in = _tnet_apply(params["input_tnet"], stats["input_tnet"], coords, interpret)
    coords_t = jnp.einsum("mnd,mde->mne", coords, t_in)
    h = jnp.concatenate([coords_t, x], axis=-1)

    a_w, a_b = _folded_chain(params["mlp_a"], stats["mlp_a"], ("mlp_0", "mlp_1"))
    h = fused_mlp_chain(h, a_w, a_b, interpret=interpret)  # [M, N, 64]

    t_feat = _tnet_apply(params["feature_tnet"], stats["feature_tnet"], h, interpret)
    local = jnp.einsum("mnd,mde->mne", h, t_feat)

    b_w, b_b = _folded_chain(
        params["mlp_b"], stats["mlp_b"], ("mlp_0", "mlp_1", "mlp_2", "mlp_3")
    )
    glob = fused_mlp_chain(
        local, b_w, b_b, pool=True, return_acts=False, interpret=interpret
    )

    if squeeze:
        local = local.reshape(b, w, n, -1)
        glob = glob.reshape(b, w, -1)
        t_feat = t_feat.reshape(b, w, *t_feat.shape[1:])
    return local, glob, t_feat
