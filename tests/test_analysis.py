"""Error-analysis tests: precision/recall goldens, boundary attribution on a
synthetic two-half-space cloud, and the evaluate_dataset integration."""

import json
import os

import numpy as np
import pytest

from ampnet_tpu.infer.analysis import (
    ErrorAnalysisAccumulator,
    boundary_mask,
    precision_recall_from_confusion,
)


def test_precision_recall_golden():
    # cm[i, j]: GT i predicted j
    cm = np.array([
        [8, 2, 0],
        [1, 3, 0],
        [0, 0, 0],  # absent class
    ])
    pr = precision_recall_from_confusion(cm)
    bg, tw, ln = (pr[k] for k in ("background", "tower", "lines"))
    assert bg["recall"] == pytest.approx(8 / 10)
    assert bg["precision"] == pytest.approx(8 / 9)
    assert bg["top_confusion"]["predicted_as"] == "tower"
    assert bg["top_confusion"]["fraction_of_errors"] == pytest.approx(1.0)
    assert tw["recall"] == pytest.approx(3 / 4)
    assert tw["precision"] == pytest.approx(3 / 5)
    assert ln["support"] == 0
    assert np.isnan(ln["recall"]) and np.isnan(ln["precision"])
    assert ln["top_confusion"] is None


def two_halfspace_cloud(n_side=50, gap=0.02):
    """Class 0 at x < 0, class 1 at x > 0, points on a grid; the boundary is the
    column nearest x=0 on each side."""
    xs = np.concatenate([np.linspace(-1, -gap, n_side), np.linspace(gap, 1, n_side)])
    ys = np.linspace(-1, 1, 20)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    labels = (pts[:, 0] > 0).astype(np.int64)
    return pts.astype(np.float32), labels


def test_boundary_mask_two_halfspaces():
    pts, labels = two_halfspace_cloud()
    bnd = boundary_mask(pts, labels, k=8)
    # boundary points hug x ~ 0; interior points are far from it
    assert bnd.any() and not bnd.all()
    assert np.abs(pts[bnd, 0]).max() < 0.2
    assert np.abs(pts[~bnd, 0]).min() < 0.2  # interior starts right behind them
    # ignore labels are never boundary and don't create boundaries
    labels2 = labels.copy()
    labels2[labels2 == 1] = -1
    bnd2 = boundary_mask(pts, labels2, k=8)
    assert not bnd2.any()


def test_boundary_mask_degenerate():
    assert not boundary_mask(np.zeros((1, 3)), np.array([0]), k=4).any()
    assert not boundary_mask(np.zeros((0, 3)), np.array([]), k=4).any()


def test_accumulator_attributes_errors():
    pts, labels = two_halfspace_cloud()
    bnd = boundary_mask(pts, labels, k=8)
    preds = labels.copy()
    # flip every boundary point of class 0 and exactly 10 interior class-1 points
    preds[(labels == 0) & bnd] = 1
    interior1 = np.flatnonzero((labels == 1) & ~bnd)[:10]
    preds[interior1] = 0
    feats = np.concatenate([pts, np.zeros((len(pts), 6), np.float32)], axis=1)
    acc = ErrorAnalysisAccumulator(num_classes=5)
    acc.update("cloud0", feats, labels, preds)
    rep = acc.finalize()
    c0 = rep["per_class"]["background"]
    c1 = rep["per_class"]["tower"]
    assert c0["errors_at_boundary_fraction"] == pytest.approx(1.0)
    assert c0["error_rate_interior"] == 0.0
    assert c1["errors_at_boundary_fraction"] == pytest.approx(0.0)
    assert c1["error_rate_boundary"] == 0.0
    # confusion matches the flips
    cm = np.asarray(rep["confusion"])
    assert cm[0, 1] == int(((labels == 0) & bnd).sum())
    assert cm[1, 0] == 10
    # worst-cloud list names the only cloud
    assert rep["worst_clouds"]["background"][0]["name"] == "cloud0"


def test_evaluate_dataset_analysis(tmp_path):
    import jax

    from ampnet_tpu.core.config import AMPNetConfig, DataConfig, ModelConfig
    from ampnet_tpu.infer.tiled import TiledInferencer, evaluate_dataset
    from ampnet_tpu.models.amp import AMPNetSegmenter
    from tests.test_infer import CloudListDataset, make_cloud

    n_points = 256
    cfg = AMPNetConfig(data=DataConfig(n_points=n_points, max_clusters_test=6),
                       model=ModelConfig())
    model = AMPNetSegmenter(cfg.model)
    rng_j = jax.random.PRNGKey(0)
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(1, 2, n_points, 9)).astype(np.float32)
    cent = rng.normal(size=(1, 2, 2)).astype(np.float32)
    inferencer = TiledInferencer(model, model.init(rng_j, pts, cent, None), cfg)

    ds = CloudListDataset([make_cloud(rng, 500), make_cloud(rng, 700)])
    out = evaluate_dataset(inferencer, ds, analysis_dir=str(tmp_path))
    assert "analysis" in out
    rep = out["analysis"]
    path = tmp_path / "analysis.json"
    assert path.exists() and (tmp_path / "confusion.png").exists()
    on_disk = json.loads(path.read_text())
    assert on_disk["per_class"].keys() == rep["per_class"].keys()
    # the analyzer's confusion matrix must agree with the summary-path one:
    # same predictions feed both, so OA re-derived from it matches
    cm = np.asarray(rep["confusion"], dtype=np.float64)
    assert np.diag(cm).sum() / cm.sum() == pytest.approx(out["summary"]["oa"], abs=1e-9)
    total_pts = sum(v["points"] for v in rep["per_class"].values())
    assert total_pts == 500 + 700
