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


def test_focal_gamma_zero_is_weighted_ce(rng):
    from ampnet_tpu.train.losses import weighted_focal

    logits = rng.normal(size=(48, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=48)
    targets[5:9] = -1
    w = np.array([1, 2, 2, 1, 1], np.float32)
    ce = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w))
    f0 = weighted_focal(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w), gamma=0.0)
    assert float(f0) == pytest.approx(float(ce), rel=1e-6)


def test_focal_matches_hand_computation(rng):
    """γ=2 focal against an explicit softmax/(1-p)^2 computation, weighted-mean
    denominator convention (Σ w over non-ignored)."""
    from ampnet_tpu.train.losses import weighted_focal

    logits = rng.normal(size=(32, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=32)
    targets[3:6] = -1
    w = np.array([1, 2, 2, 1, 1], np.float32)

    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    valid = targets != -1
    pt = p[np.arange(32), np.where(valid, targets, 0)]
    ww = w[np.where(valid, targets, 0)] * valid
    num = ((1 - pt) ** 2 * -np.log(pt) * ww).sum()
    expected = num / ww.sum()

    ours = weighted_focal(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w), gamma=2.0)
    assert float(ours) == pytest.approx(float(expected), rel=1e-5)


def test_focal_downweights_easy_points():
    """A confidently-correct point contributes (1-p)^γ-faded loss; a hard point
    keeps nearly its CE value — so focal < CE on mixed batches."""
    from ampnet_tpu.train.losses import weighted_focal

    logits = np.array([[8.0, 0, 0, 0, 0], [0.5, 0, 0, 0, 0]], np.float32)
    targets = np.array([0, 1])  # first easy-correct, second hard-wrong
    ce = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), None)
    fo = weighted_focal(jnp.asarray(logits), jnp.asarray(targets), None, gamma=2.0)
    assert float(fo) < float(ce)
    # the easy point's focal term is ~0; the hard point's term keeps >50% of CE
    hard_ce = -np.log(np.exp(0) / (np.exp(0.5) + 4 * np.exp(0)))
    assert float(fo) * 2 > 0.5 * hard_ce


def test_focal_micro_batch_parts_are_exact(rng):
    """Σ_k focal numerator over micro-batches == full-batch numerator (the
    grad-accum global-normalizer argument, train/step.py)."""
    from ampnet_tpu.train.losses import weighted_focal_parts

    logits = rng.normal(size=(40, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=40)
    targets[::7] = -1
    w = jnp.asarray(np.array([1, 2, 2, 1, 1], np.float32))
    full_num, full_den = weighted_focal_parts(
        jnp.asarray(logits), jnp.asarray(targets), w, gamma=2.0
    )
    nums, dens = zip(*(
        weighted_focal_parts(jnp.asarray(logits[i:i + 10]),
                             jnp.asarray(targets[i:i + 10]), w, gamma=2.0)
        for i in range(0, 40, 10)
    ))
    assert float(sum(nums)) == pytest.approx(float(full_num), rel=1e-5)
    assert float(sum(dens)) == pytest.approx(float(full_den), rel=1e-6)
