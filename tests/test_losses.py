"""Loss parity vs torch CrossEntropyLoss(weight, ignore_index) and the T-Net
regularizer (train_pointnet-attention.py:138,463-467)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ampnet_tpu.train.losses import orthogonality_regularizer, weighted_cross_entropy

torch = pytest.importorskip("torch")


def test_weighted_ce_matches_torch(rng):
    logits = rng.normal(size=(64, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=64)
    targets[10:20] = -1  # padding
    w = np.array([1, 2, 2, 1, 1], np.float32)

    ours = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w))
    ce = torch.nn.CrossEntropyLoss(weight=torch.tensor(w), reduction="mean", ignore_index=-1)
    theirs = ce(torch.tensor(logits), torch.tensor(targets))
    assert float(ours) == pytest.approx(float(theirs), abs=1e-5)


def test_unweighted_ce_matches_torch(rng):
    logits = rng.normal(size=(32, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=32)
    ours = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), None)
    theirs = torch.nn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(targets))
    assert float(ours) == pytest.approx(float(theirs), abs=1e-5)


def test_ce_all_ignored_is_finite():
    logits = jnp.zeros((4, 5))
    targets = jnp.full((4,), -1)
    assert np.isfinite(float(weighted_cross_entropy(logits, targets)))


def test_regularizer_matches_torch(rng):
    a = rng.normal(size=(8, 64, 64)).astype(np.float32)
    ours = orthogonality_regularizer(jnp.asarray(a))
    at = torch.tensor(a)
    eye = torch.eye(64)
    theirs = torch.norm(eye - torch.bmm(at, at.transpose(2, 1)))
    assert float(ours) == pytest.approx(float(theirs), rel=1e-5)


def test_regularizer_zero_for_orthogonal():
    q, _ = np.linalg.qr(np.random.default_rng(0).normal(size=(64, 64)))
    a = np.stack([q, q.T]).astype(np.float32)
    assert float(orthogonality_regularizer(jnp.asarray(a))) == pytest.approx(0.0, abs=1e-3)
