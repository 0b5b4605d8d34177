"""Golden forward-snapshot regression: the AMP segmenter's outputs for a fixed seed
and input must stay stable across refactors (guards silent semantic drift between
build rounds). Regenerate tests/golden/amp_forward.npz ONLY for intentional model
changes (script in the git history of this file's commit)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import ModelConfig
from ampnet_tpu.models.amp import AMPNetSegmenter


def test_amp_forward_matches_golden():
    data = np.load("tests/golden/amp_forward.npz")
    cfg = ModelConfig(dropout=0.0)
    model = AMPNetSegmenter(cfg)
    pts, cent, pad = data["points"], data["centroids"], data["pad"]
    variables = model.init(
        jax.random.PRNGKey(42), jnp.asarray(pts), jnp.asarray(cent),
        jnp.asarray(pad), train=False,
    )
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + jax.random.normal(k, l.shape, l.dtype) * 0.03
              for k, l in zip(keys, leaves)]
    variables = jax.tree.unflatten(treedef, leaves)
    logits, _, attw = model.apply(
        variables, jnp.asarray(pts), jnp.asarray(cent), jnp.asarray(pad), train=False
    )
    np.testing.assert_allclose(np.asarray(logits), data["logits"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(attw), data["attw"], atol=1e-4)
