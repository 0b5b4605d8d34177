"""Window-axis sharding (sequence-parallel analog): the 2-D mesh forward must equal
the single-device forward exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import AMPNetConfig, ModelConfig
from ampnet_tpu.models.amp import AMPNetSegmenter
from ampnet_tpu.parallel.window_shard import (
    make_2d_mesh,
    make_window_sharded_forward,
    shard_cloud_batch,
)


@pytest.mark.parametrize("n_data,n_window", [(2, 4), (1, 8), (4, 2)])
def test_window_sharded_forward_matches_single(n_data, n_window):
    rng = np.random.default_rng(0)
    cfg = AMPNetConfig(model=ModelConfig(dropout=0.0))
    model = AMPNetSegmenter(cfg.model)

    B, W, N = max(2, n_data), 8, 64
    pts = jnp.asarray(rng.normal(size=(B, W, N, 9)).astype(np.float32) * 0.5)
    cent = jnp.asarray(rng.normal(size=(B, W, 2)).astype(np.float32))
    pad = jnp.zeros((B, W), bool).at[:, W - 1].set(True)
    variables = model.init(jax.random.PRNGKey(0), pts, cent, pad, train=False)

    ref, _, _ = model.apply(variables, pts, cent, pad, train=False)

    mesh = make_2d_mesh(n_data, n_window)
    fwd = make_window_sharded_forward(model, cfg, mesh)
    batch = shard_cloud_batch({"points": pts, "centroids": cent, "pad": pad}, mesh)
    out = fwd(variables, batch["points"], batch["centroids"], batch["pad"])

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
