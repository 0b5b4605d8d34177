"""Backend parity: fused/int8 full forwards must track the Flax path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import AMPNetConfig, ModelConfig
from ampnet_tpu.models.amp import AMPNetSegmenter
from ampnet_tpu.models.backends import make_forward


@pytest.fixture(scope="module")
def setup(rng_module=None):
    rng = np.random.default_rng(0)
    cfg = AMPNetConfig(model=ModelConfig(dropout=0.0))
    model = AMPNetSegmenter(cfg.model)
    pts = jnp.asarray(rng.normal(size=(2, 3, 128, 9)).astype(np.float32) * 0.5)
    cent = jnp.asarray(rng.normal(size=(2, 3, 2)).astype(np.float32))
    pad = jnp.zeros((2, 3), bool).at[:, 2].set(True)
    variables = model.init(jax.random.PRNGKey(0), pts, cent, pad, train=False)
    # non-trivial params + batch stats
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    leaves = [l + jax.random.normal(k, l.shape, l.dtype) * 0.05 for k, l in zip(keys, leaves)]
    variables = jax.tree.unflatten(treedef, leaves)
    return cfg, model, variables, pts, cent, pad


def test_fused_backend_matches_xla(setup):
    cfg, model, variables, pts, cent, pad = setup
    ref = make_forward(model, cfg, "xla")(variables, pts, cent, pad)
    out = make_forward(model, cfg, "fused", interpret=True)(variables, pts, cent, pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3)
    # predictions essentially identical
    agree = (np.asarray(out.argmax(-1)) == np.asarray(ref.argmax(-1))).mean()
    assert agree > 0.999, agree


def test_folded_backend_matches_xla(setup):
    """BN folding is an exact affine rewrite — fp32 'folded' must track 'xla'
    to float re-association only."""
    cfg, model, variables, pts, cent, pad = setup
    ref = make_forward(model, cfg, "xla")(variables, pts, cent, pad)
    out = make_forward(model, cfg, "folded")(variables, pts, cent, pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)
    agree = (np.asarray(out.argmax(-1)) == np.asarray(ref.argmax(-1))).mean()
    assert agree > 0.9999, agree


def test_bf16_backend_prediction_agreement(setup):
    cfg, model, variables, pts, cent, pad = setup
    ref = make_forward(model, cfg, "xla")(variables, pts, cent, pad)
    out = make_forward(model, cfg, "bf16")(variables, pts, cent, pad)
    assert out.dtype == jnp.float32  # logits come back fp32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.15, rtol=0.15)
    agree = (np.asarray(out.argmax(-1)) == np.asarray(ref.argmax(-1))).mean()
    assert agree > 0.99, agree


def test_int8_backend_prediction_agreement(setup):
    cfg, model, variables, pts, cent, pad = setup
    ref = make_forward(model, cfg, "xla")(variables, pts, cent, pad)
    out = make_forward(model, cfg, "int8", interpret=True)(variables, pts, cent, pad)
    agree = (np.asarray(out.argmax(-1)) == np.asarray(ref.argmax(-1))).mean()
    assert agree > 0.97, agree


def test_unknown_backend_rejected(setup):
    cfg, model, *_ = setup
    with pytest.raises(ValueError):
        make_forward(model, cfg, "fp4")


def test_window_bn_mode_rejected_by_folding_backends():
    """Every folding backend normalizes with RUNNING stats; bn_mode='window'
    models neither use nor update them, so folding would silently produce
    wrong logits — make_forward must refuse."""
    cfg = AMPNetConfig(model=ModelConfig(bn_mode="window"))
    model = AMPNetSegmenter(cfg.model)
    for backend in ("folded", "bf16", "fused", "int8"):
        with pytest.raises(ValueError, match="bn_mode"):
            make_forward(model, cfg, backend)
    make_forward(model, cfg, "xla")  # the flax path stays available
