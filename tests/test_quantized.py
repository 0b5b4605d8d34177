"""int8 quantized kernel tests (interpret mode): quantization error bounds and
agreement of the quantized encoder with the fp32 reference path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import ModelConfig
from ampnet_tpu.models.amp import WindowEncoder
from ampnet_tpu.models.quantized_infer import encode_windows_int8
from ampnet_tpu.ops.pallas.quantized_mlp import (
    quantize_chain,
    quantize_weights_per_channel,
    quantized_mlp_chain,
)


def test_weight_quantization_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    q, s = quantize_weights_per_channel(w)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * s[None, :]
    err = np.abs(np.asarray(back - w))
    # max error bounded by half a quantization step per channel
    steps = np.asarray(s)
    assert (err <= steps[None, :] * 0.5 + 1e-7).all()


def test_quantized_chain_close_to_fp32(rng):
    m, n = 3, 128
    x = jnp.asarray(rng.normal(size=(m, n, 16)).astype(np.float32))
    dims = [16, 64, 64]
    ws = [jnp.asarray(rng.normal(size=(a, b)).astype(np.float32) * 0.2)
          for a, b in zip(dims[:-1], dims[1:])]
    bs = [jnp.asarray(rng.normal(size=(b,)).astype(np.float32) * 0.1) for b in dims[1:]]

    ref = x
    for w, b in zip(ws, bs):
        ref = jnp.maximum(ref @ w + b, 0.0)

    qs, ss = quantize_chain(ws)
    out = quantized_mlp_chain(x, qs, ss, bs, interpret=True)
    ref_n, out_n = np.asarray(ref), np.asarray(out)
    denom = np.abs(ref_n).mean() + 1e-9
    rel = np.abs(out_n - ref_n).mean() / denom
    assert rel < 0.05, rel  # few-percent mean relative error


def test_quantized_pool(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 8)).astype(np.float32))
    ws = [jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32) * 0.3)]
    bs = [jnp.zeros((16,), jnp.float32)]
    qs, ss = quantize_chain(ws)
    pooled = quantized_mlp_chain(x, qs, ss, bs, pool=True, return_acts=False,
                                 interpret=True)
    ref = jnp.maximum(x @ ws[0], 0.0).max(axis=1)
    rel = np.abs(np.asarray(pooled - ref)).mean() / (np.abs(np.asarray(ref)).mean() + 1e-9)
    assert rel < 0.05


def test_int8_encoder_agrees_with_fp32(rng):
    """Quantized encoder must produce near-identical global features and >97%
    identical pooled-feature rankings vs the fp32 path on realistic inputs."""
    cfg = ModelConfig(dropout=0.0)
    model = WindowEncoder(cfg)
    pts = jnp.asarray(rng.normal(size=(2, 2, 128, 9)).astype(np.float32) * 0.5)
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    # give the zero-init T-Net heads non-trivial weights
    import jax as _jax

    leaves, treedef = _jax.tree.flatten(variables)
    keys = _jax.random.split(_jax.random.PRNGKey(3), len(leaves))
    leaves = [
        l + _jax.random.normal(k, l.shape, l.dtype) * 0.05 for k, l in zip(keys, leaves)
    ]
    variables = _jax.tree.unflatten(treedef, leaves)

    ref_local, ref_glob, _ = model.apply(variables, pts, train=False)
    local, glob, _ = encode_windows_int8(variables, pts, interpret=True)

    g1, g2 = np.asarray(ref_glob).ravel(), np.asarray(glob).ravel()
    cos = np.dot(g1, g2) / (np.linalg.norm(g1) * np.linalg.norm(g2) + 1e-12)
    assert cos > 0.99, cos
    l1, l2 = np.asarray(ref_local).ravel(), np.asarray(local).ravel()
    cos_l = np.dot(l1, l2) / (np.linalg.norm(l1) * np.linalg.norm(l2) + 1e-12)
    assert cos_l > 0.99, cos_l
