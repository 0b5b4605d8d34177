"""Regression tests for the GRU/classification variants and the model factory."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import AMPNetConfig, ModelConfig
from ampnet_tpu.data.synthetic import synthetic_batch
from ampnet_tpu.models.factory import ARCHS, build_model
from ampnet_tpu.train.cls_step import binary_metrics_from_confusion, make_cls_step_fns
from ampnet_tpu.train.state import create_train_state
from ampnet_tpu.train.step import make_step_fns
from ampnet_tpu.train.trainer import _epoch_metrics


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, 2, 3, 64, real_windows=2)
    b["cls_label"] = np.array([1, 0], np.int32)
    return {k: jnp.asarray(v) for k, v in b.items()}


@pytest.mark.parametrize("arch", ARCHS)
def test_all_archs_train_step_under_jit(arch, batch):
    """Every architecture must run a full jitted train step (the GRU variant once
    leaked tracers through a raw lax.scan — regression for that bug)."""
    cfg = AMPNetConfig()
    model = build_model(cfg, arch, "segmentation")
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    train_step, eval_step = make_step_fns(cfg, augment=True)
    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"])), arch
    m, preds = eval_step(state, batch)
    assert preds.shape == batch["labels"].shape


@pytest.mark.parametrize("arch", ["attention", "gru", "baseline"])
def test_classification_step(arch, batch):
    cfg = AMPNetConfig()
    model = build_model(cfg, arch, "classification")
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    train_step, eval_step = make_cls_step_fns(cfg, np.array([0.3, 0.7], np.float32))
    for _ in range(2):
        state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"])), arch
    m, preds = eval_step(state, batch)
    assert preds.shape == (2,)
    assert m["confusion"].shape == (2, 2)


def test_epoch_metrics_binary_tags():
    """2x2 confusions must get binary tags, not the 5-class segmentation tags
    (regression: jnp clamp-indexing silently mislabeled them)."""
    cm = np.array([[3.0, 1.0], [0.0, 6.0]])
    out = _epoch_metrics([cm], {"loss": [0.5]})
    assert "iou_no_tower" in out and "iou_tower" in out
    assert "iou_cables" not in out
    assert out["iou_tower"] == pytest.approx(6 / 7)


def test_binary_metrics():
    cm = np.array([[8, 2], [1, 9]], float)
    m = binary_metrics_from_confusion(cm)
    assert m["precision"] == pytest.approx(9 / 11)
    assert m["recall"] == pytest.approx(9 / 10)
    assert m["accuracy"] == pytest.approx(17 / 20)


def test_factory_rejects_unknown():
    with pytest.raises(ValueError):
        build_model(AMPNetConfig(), "transformer++", "segmentation")


def test_pointnet2_train_step(batch):
    """The reference's pointnet_2 is dead code (missing module); ours must run a
    full jitted train step."""
    cfg = AMPNetConfig()
    model = build_model(cfg, "pointnet2", "segmentation")
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    train_step, eval_step = make_step_fns(cfg, augment=False)
    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    m, preds = eval_step(state, batch)
    assert preds.shape == batch["labels"].shape


def test_pointnet2_rejects_classification():
    with pytest.raises(ValueError):
        build_model(AMPNetConfig(), "pointnet2", "classification")
