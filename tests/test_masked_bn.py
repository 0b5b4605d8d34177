"""Masked-statistics invariants (SURVEY.md §7 hard-parts 2-3): padded points must not
perturb BatchNorm statistics, pooling, or the encoder outputs of real points."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import ModelConfig
from ampnet_tpu.models.amp import WindowEncoder
from ampnet_tpu.models.layers import MaskedBatchNorm, masked_max_pool


def test_masked_bn_equals_unpadded(rng):
    x_real = jnp.asarray(rng.normal(size=(2, 50, 16)).astype(np.float32))
    garbage = jnp.full((2, 30, 16), 1e3, jnp.float32)
    x_pad = jnp.concatenate([x_real, garbage], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((2, 50), bool), jnp.zeros((2, 30), bool)], axis=1
    )

    bn = MaskedBatchNorm(use_running_average=False)
    v1 = bn.init(jax.random.PRNGKey(0), x_real)
    out_real, _ = bn.apply(v1, x_real, mutable=["batch_stats"])
    out_pad, _ = bn.apply(v1, x_pad, mask, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_pad[:, :50]), np.asarray(out_real), atol=1e-5
    )


def test_masked_bn_running_stats_exclude_padding(rng):
    x_real = jnp.asarray(rng.normal(size=(4, 20, 8)).astype(np.float32))
    x_pad = jnp.concatenate([x_real, jnp.full((4, 10, 8), -500.0)], axis=1)
    mask = jnp.concatenate([jnp.ones((4, 20), bool), jnp.zeros((4, 10), bool)], axis=1)
    bn = MaskedBatchNorm(use_running_average=False, momentum=0.0)  # stats = batch
    v = bn.init(jax.random.PRNGKey(0), x_real)
    _, s1 = bn.apply(v, x_real, mutable=["batch_stats"])
    _, s2 = bn.apply(v, x_pad, mask, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(s1["batch_stats"]["mean"]), np.asarray(s2["batch_stats"]["mean"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s1["batch_stats"]["var"]), np.asarray(s2["batch_stats"]["var"]),
        atol=1e-4,
    )


def test_masked_max_pool_ignores_padding(rng):
    x = jnp.asarray(rng.normal(size=(3, 10, 4)).astype(np.float32))
    x_pad = jnp.concatenate([x, jnp.full((3, 5, 4), 1e9)], axis=1)
    mask = jnp.concatenate([jnp.ones((3, 10), bool), jnp.zeros((3, 5), bool)], axis=1)
    np.testing.assert_allclose(
        np.asarray(masked_max_pool(x_pad, mask)),
        np.asarray(jnp.max(x, axis=1)),
        atol=0,
    )


def test_encoder_train_mode_invariant_to_point_padding(rng):
    """Full encoder in TRAIN mode (batch statistics): replicate-padding the point
    axis with masked garbage must not change real-point outputs — the TPU analog
    of 'reference BN sees only real points' (SURVEY.md §7 #2)."""
    cfg = ModelConfig(dropout=0.0)
    model = WindowEncoder(cfg)
    n_real = 64
    pts = jnp.asarray(rng.normal(size=(2, 2, n_real, 9)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)

    (lo1, gl1, t1), _ = model.apply(variables, pts, train=True, mutable=["batch_stats"])

    garbage = jnp.full((2, 2, 32, 9), 7.7, jnp.float32)
    pts_pad = jnp.concatenate([pts, garbage], axis=2)
    mask = jnp.concatenate(
        [jnp.ones((2, 2, n_real), bool), jnp.zeros((2, 2, 32), bool)], axis=2
    )
    (lo2, gl2, t2), _ = model.apply(
        variables, pts_pad, mask, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(gl2), np.asarray(gl1), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lo2[:, :, :n_real]), np.asarray(lo1), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=2e-4)
