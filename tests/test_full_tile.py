"""Whole-tile LAS→LAS inference tests (infer/full_tile.py)."""

import numpy as np
import pytest
import jax

from ampnet_tpu.core.config import AMPNetConfig, DataConfig, ModelConfig
from ampnet_tpu.data.las_io import LasCloud, read_las, write_las
from ampnet_tpu.infer.full_tile import SEG_TO_LAS, classify_las_file, predict_tile
from ampnet_tpu.infer.tiled import TiledInferencer
from ampnet_tpu.models.amp import AMPNetSegmenter


@pytest.fixture(scope="module")
def inferencer():
    cfg = AMPNetConfig(data=DataConfig(n_points=128, max_clusters_test=4),
                       model=ModelConfig())
    model = AMPNetSegmenter(cfg.model)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1, 2, 128, 9)).astype(np.float32)
    cent = rng.normal(size=(1, 2, 2)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), pts, cent, None)
    return TiledInferencer(model, variables, cfg)


@pytest.fixture(scope="module")
def las(tmp_path_factory):
    rng = np.random.default_rng(1)
    n = 3000
    cls = rng.choice([1, 2, 3, 5, 15], n)  # incl. ground (filtered)
    z = rng.uniform(1, 40, n)
    z[cls == 2] = rng.uniform(0, 0.2, int((cls == 2).sum()))  # ground sits at ~0
    cloud = LasCloud(
        x=rng.uniform(430000, 430150, n),
        y=rng.uniform(4590000, 4590150, n),
        z=z,
        intensity=rng.uniform(0, 4000, n),
        classification=cls,
        red=rng.uniform(0, 65535, n), green=rng.uniform(0, 65535, n),
        blue=rng.uniform(0, 65535, n), nir=rng.uniform(0, 65535, n),
    )
    p = str(tmp_path_factory.mktemp("las") / "tile.las")
    write_las(p, cloud, point_format=8)
    return p


def test_predict_tile_covers_unfiltered_points(inferencer, las):
    cloud = read_las(las)
    preds, metrics = predict_tile(inferencer, cloud, window_size=100.0)
    assert preds.shape == (len(cloud),)
    ground = cloud.classification == 2
    assert (preds[ground] == -1).all()  # filtered points get no prediction
    assert (preds[~ground] >= 0).mean() > 0.95  # nearly all others predicted
    assert 0.0 <= metrics["oa"] <= 1.0
    assert metrics["points_evaluated"] <= metrics["points_total"]


def test_predict_tile_tta_votes(inferencer, las):
    """infer --tta/--tile_votes in whole-tile LAS mode: per-window view
    ensemble through tta_ensemble; coverage identical to the single-pass
    path and deterministic."""
    cloud = read_las(las)
    base, _ = predict_tile(inferencer, cloud, window_size=100.0)
    a, m = predict_tile(inferencer, cloud, window_size=100.0, tta=2, votes=2)
    b, _ = predict_tile(inferencer, cloud, window_size=100.0, tta=2, votes=2)
    np.testing.assert_array_equal(a, b)
    # ensembling never changes WHICH points get predictions
    np.testing.assert_array_equal(a >= 0, base >= 0)
    assert 0.0 <= m["oa"] <= 1.0


def test_classify_las_roundtrip(inferencer, las, tmp_path):
    out = str(tmp_path / "classified.las")
    metrics = classify_las_file(inferencer, las, out, window_size=100.0)
    back = read_las(out)
    orig = read_las(las)
    assert len(back) == len(orig)
    # filtered (ground) points keep their class; predicted points carry model classes
    ground = orig.classification == 2
    np.testing.assert_array_equal(back.classification[ground], 2)
    assert set(np.unique(back.classification[~ground])) <= set(SEG_TO_LAS.tolist()) | {1, 3, 5, 15}
