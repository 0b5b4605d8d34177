"""Golden-value tests for metrics, checked against independent NumPy/sklearn
implementations of the reference semantics (utils/get_metrics.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ampnet_tpu.core import metrics as M


def ref_iou(preds, targets, label):
    """Literal re-derivation of reference get_iou_obj semantics."""
    corrects = preds == targets
    gt_positive = (targets == label).sum()  # TP + FN
    detected = preds == label
    tp = np.logical_and(corrects, detected).sum()
    fp = detected.sum() - tp
    denom = gt_positive + fp
    return tp / denom if denom > 0 else None


def test_iou_matches_reference_formula(rng):
    preds = rng.integers(0, 5, size=1000)
    targets = rng.integers(0, 5, size=1000)
    iou, valid = M.iou_per_class(jnp.asarray(preds), jnp.asarray(targets), 5)
    for c in range(5):
        expected = ref_iou(preds, targets, c)
        assert valid[c]
        assert iou[c] == pytest.approx(expected, abs=1e-6)


def test_iou_ignores_masked_points(rng):
    preds = rng.integers(0, 5, size=500)
    targets = rng.integers(0, 5, size=500)
    # pad with garbage marked -1
    preds_pad = np.concatenate([preds, rng.integers(0, 5, size=100)])
    targets_pad = np.concatenate([targets, np.full(100, -1)])
    iou_a, _ = M.iou_per_class(jnp.asarray(preds), jnp.asarray(targets), 5)
    iou_b, _ = M.iou_per_class(jnp.asarray(preds_pad), jnp.asarray(targets_pad), 5)
    np.testing.assert_allclose(iou_a, iou_b, atol=1e-6)


def test_absent_class_invalid():
    preds = jnp.array([0, 0, 1, 1])
    targets = jnp.array([0, 1, 1, 0])
    iou, valid = M.iou_per_class(preds, targets, 5)
    assert bool(valid[0]) and bool(valid[1])
    assert not bool(valid[3])
    # mIoU averages present classes only
    assert float(M.mean_iou(iou, valid)) == pytest.approx(float((iou[0] + iou[1]) / 2))


def test_accuracy(rng):
    preds = rng.integers(0, 5, size=1000)
    targets = rng.integers(0, 5, size=1000)
    acc = M.accuracy(jnp.asarray(preds), jnp.asarray(targets))
    assert float(acc) == pytest.approx((preds == targets).mean(), abs=1e-6)


def test_balanced_accuracy_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.metrics")
    preds = rng.integers(0, 3, size=400)
    targets = rng.integers(0, 3, size=400)
    ours = M.balanced_accuracy(jnp.asarray(preds), jnp.asarray(targets), 3)
    theirs = sklearn.balanced_accuracy_score(targets, preds)
    assert float(ours) == pytest.approx(theirs, abs=1e-6)


def test_confusion_matrix_totals(rng):
    preds = rng.integers(0, 4, size=300)
    targets = rng.integers(0, 4, size=300)
    cm = np.asarray(M.confusion_matrix(jnp.asarray(preds), jnp.asarray(targets), 4))
    assert cm.sum() == 300
    for t in range(4):
        for p in range(4):
            assert cm[t, p] == np.sum((targets == t) & (preds == p))


class TestClassWeights:
    """Golden values vs the reference formulas (get_metrics.py:34-77)."""

    samples = [1000, 50]

    def test_efs(self):
        beta = 0.999
        eff = 1.0 - np.power(beta, self.samples)
        w = (1 - beta) / eff
        w = w / w.sum()
        np.testing.assert_allclose(M.get_class_weights("EFS", self.samples, beta), w, rtol=1e-6)

    def test_ins(self):
        w = 1.0 / np.asarray(self.samples, dtype=float)
        w = w / w.sum()
        np.testing.assert_allclose(M.get_class_weights("INS", self.samples), w, rtol=1e-6)

    def test_isns(self):
        w = 1.0 / np.sqrt(np.asarray(self.samples, dtype=float))
        w = w / w.sum()
        np.testing.assert_allclose(M.get_class_weights("ISNS", self.samples), w, rtol=1e-6)

    def test_sklearn_scheme(self):
        s = np.asarray(self.samples, dtype=float)
        w = s.sum() / (2 * s)
        w = w / w.sum()
        np.testing.assert_allclose(M.get_class_weights("sklearn", self.samples), w, rtol=1e-6)

    def test_unknown_returns_none(self):
        assert M.get_class_weights("nope", self.samples) is None

    def test_per_sample_lookup(self):
        w = jnp.array([0.25, 0.75])
        labels = jnp.array([0, 1, 1, 0])
        np.testing.assert_allclose(
            M.weights_for_samples(w, labels), [0.25, 0.75, 0.75, 0.25]
        )
