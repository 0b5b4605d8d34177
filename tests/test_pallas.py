"""Pallas fused-kernel tests (interpret mode on CPU): numerical parity of the fused
MLP chain and the full fused inference encoder against the Flax/XLA path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import ModelConfig
from ampnet_tpu.models.amp import WindowEncoder
from ampnet_tpu.models.fused_infer import encode_windows_fused
from ampnet_tpu.ops.pallas.fused_mlp import fold_bn, fused_mlp_chain


def test_fused_chain_matches_dense(rng):
    m, n = 3, 64
    x = jnp.asarray(rng.normal(size=(m, n, 16)).astype(np.float32))
    dims = [16, 32, 48]
    ws = [jnp.asarray(rng.normal(size=(a, b)).astype(np.float32) * 0.3)
          for a, b in zip(dims[:-1], dims[1:])]
    bs = [jnp.asarray(rng.normal(size=(b,)).astype(np.float32)) for b in dims[1:]]

    ref = x
    for w, b in zip(ws, bs):
        ref = jnp.maximum(ref @ w + b, 0.0)

    acts = fused_mlp_chain(x, ws, bs, interpret=True)
    np.testing.assert_allclose(np.asarray(acts), np.asarray(ref), atol=1e-5)

    acts2, pooled = fused_mlp_chain(x, ws, bs, pool=True, interpret=True)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref.max(axis=1)), atol=1e-5)

    pooled_only = fused_mlp_chain(x, ws, bs, pool=True, return_acts=False, interpret=True)
    np.testing.assert_allclose(np.asarray(pooled_only), np.asarray(pooled), atol=1e-6)


def test_fused_chain_pads_non_dividing_m(rng):
    """Awkward (prime) window counts must pad up to the block group, not shrink
    the group toward per-window programs (grid-step overhead is ~130-210 µs on
    this toolchain) — and padded garbage rows must not leak into the output."""
    m, n = 5, 32
    x = jnp.asarray(rng.normal(size=(m, n, 8)).astype(np.float32))
    ws = [jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))]
    bs = [jnp.asarray(rng.normal(size=(16,)).astype(np.float32))]
    ref = jnp.maximum(x @ ws[0] + bs[0], 0.0)
    acts, pooled = fused_mlp_chain(x, ws, bs, pool=True, interpret=True,
                                   block_windows=2)  # 5 % 2 != 0 → pad to 6
    assert acts.shape == (m, n, 16) and pooled.shape == (m, 16)
    np.testing.assert_allclose(np.asarray(acts), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref.max(axis=1)),
                               atol=1e-5)


def test_no_relu_last(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 8)).astype(np.float32))
    w = [jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))]
    b = [jnp.zeros((8,), jnp.float32)]
    out = fused_mlp_chain(x, w, b, relu_last=False, interpret=True)
    assert (np.asarray(out) < 0).any()  # negatives survive without the final relu


def test_fold_bn(rng):
    cin, cout, n = 8, 16, 100
    x = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 2, cout).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=cout).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=cout).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2, cout).astype(np.float32))

    ref = ((x @ k) - mean) * scale / jnp.sqrt(var + 1e-5) + bias
    w, b = fold_bn(k, scale, bias, mean, var)
    np.testing.assert_allclose(np.asarray(x @ w + b), np.asarray(ref), atol=1e-5)


def test_fused_encoder_matches_flax(rng):
    cfg = ModelConfig(dropout=0.0)
    model = WindowEncoder(cfg)
    pts = jnp.asarray(rng.normal(size=(2, 3, 128, 9)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    # randomize params AND batch stats so BN folding is non-trivial
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [jax.random.uniform(k, l.shape, l.dtype, 0.1, 1.0) for k, l in zip(keys, leaves)]
    variables = jax.tree.unflatten(treedef, leaves)

    ref_local, ref_glob, ref_t = model.apply(variables, pts, train=False)
    local, glob, t = encode_windows_fused(variables, pts, interpret=True)

    np.testing.assert_allclose(np.asarray(t), np.asarray(ref_t), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(local), np.asarray(ref_local), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(glob), np.asarray(ref_glob), rtol=2e-3, atol=2e-3)
