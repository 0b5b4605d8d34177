"""Label remapping / schema golden tests vs reference semantics
(pointNet/datasets.py:432-460; the ×100-trick remap)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ampnet_tpu.data import schema as S


def ref_remap(raw):
    """Literal re-derivation of the reference ×100 remap trick."""
    x = raw.astype(np.float64).copy()
    x[x == 15] = 100
    x[x == 14] = 200
    x[x == 3] = 300
    x[x == 4] = 300
    x[x == 5] = 400
    x[x < 100] = 0
    return (x / 100).astype(np.int64)


@pytest.mark.parametrize("xp", [np, jnp])
def test_remap_matches_reference(xp, rng):
    raw = rng.integers(0, 36, size=5000)
    expected = ref_remap(raw)
    got = np.asarray(S.remap_segmentation_labels(xp.asarray(raw)))
    np.testing.assert_array_equal(got, expected)


def test_remap_specific_values():
    raw = np.array([15, 14, 3, 4, 5, 0, 1, 2, 6, 7, 30, 135])
    got = S.remap_segmentation_labels(raw)
    np.testing.assert_array_equal(got[:5], [1, 2, 3, 3, 4])
    assert (got[5:] == 0).all()


def test_remap_preserves_padding_sentinel():
    raw = np.array([-1, 15, -1])
    got = S.remap_segmentation_labels(raw)
    np.testing.assert_array_equal(got, [-1, 1, -1])


def test_classification_label():
    assert int(S.classification_label(np.array([1, 2, 15]))) == 1
    assert int(S.classification_label(np.array([1, 2, 14]))) == 1
    assert int(S.classification_label(np.array([1, 2, 5]))) == 0


def test_select_model_features(rng):
    pc = rng.random((100, 13), dtype=np.float32)
    feats = S.select_model_features(pc)
    assert feats.shape == (100, 9)
    np.testing.assert_array_equal(feats[:, :3], pc[:, :3])
    np.testing.assert_array_equal(feats[:, 3:], pc[:, 4:10])


def test_normalize_xy_neg_one(rng):
    pc = rng.random((50, 9), dtype=np.float32)
    out = S.normalize_xy_neg_one(pc)
    np.testing.assert_allclose(out[:, 0], pc[:, 0] * 2 - 1, rtol=1e-6)
    np.testing.assert_allclose(out[:, 1], pc[:, 1] * 2 - 1, rtol=1e-6)
    np.testing.assert_allclose(out[:, 2:], pc[:, 2:], rtol=1e-6)


def test_drop_noise_points_flat(rng):
    pc = np.zeros((10, 13), dtype=np.float32)
    pc[:, S.COL.CLASS] = [30, 7, 2, 8, 13, 14, 15, 5, 3, 4]
    out = S.drop_noise_points(pc)
    # class 14 (power lines) is KEPT by default — the reference drops it from
    # training, which makes the cables class unlearnable (documented quirk fix)
    assert out.shape[0] == 5
    np.testing.assert_array_equal(out[:, S.COL.CLASS], [14, 15, 5, 3, 4])
    ref = S.drop_noise_points(pc, S.REFERENCE_NOISE_CLASSES)
    assert ref.shape[0] == 4


def test_drop_noise_points_windowed():
    # windowed layout [N, C, W]: delete the row if ANY window copy is noise
    pc = np.zeros((4, 13, 2), dtype=np.float32)
    pc[0, S.COL.CLASS, :] = [15, 15]
    pc[1, S.COL.CLASS, :] = [15, 30]   # one noisy copy → dropped
    pc[2, S.COL.CLASS, :] = [5, 5]
    pc[3, S.COL.CLASS, :] = [7, 5]     # dropped
    out = S.drop_noise_points(pc)
    assert out.shape[0] == 2


def test_synthetic_landscape_scene_has_no_towers():
    """n_pylons=0 scenes must contain no class 15/14 points (classification
    negatives) while keeping the full point budget."""
    from ampnet_tpu.data.synthetic import synthetic_scene

    rng = np.random.default_rng(0)
    sc = synthetic_scene(rng, n_points=2000, n_pylons=0)
    assert sc.shape[0] == 2000
    classes = set(np.unique(sc[:, 3]).astype(int))
    assert 15 not in classes and 14 not in classes
    assert {3, 4, 5} & classes
