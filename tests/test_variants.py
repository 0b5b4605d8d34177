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


class TestEdgeLocalAggregation:
    """ModelConfig.local_agg='edge' — the boundary-aware kNN residual block
    (models/amp.py::EdgeLocalAggregation, no reference counterpart)."""

    def _cfg(self, **kw):
        import dataclasses
        return AMPNetConfig(model=dataclasses.replace(
            ModelConfig(local_agg="edge", local_agg_k=8), **kw))

    def test_train_step_under_jit(self, batch):
        cfg = self._cfg()
        model = build_model(cfg, "attention", "segmentation")
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch,
                                   steps_per_epoch=1)
        train_step, eval_step = make_step_fns(cfg, augment=True)
        state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        _, preds = eval_step(state, batch)
        assert preds.shape == batch["labels"].shape

    def test_padded_point_invariance(self, batch):
        """Padded points must be excluded from every neighborhood: scrambling
        their coordinates cannot change real points' logits."""
        cfg = self._cfg()
        model = build_model(cfg, "attention", "segmentation")
        pts = batch["points"]
        pad = jnp.all(batch["labels"] == -1, axis=-1)  # [B, W]
        pmask = jnp.ones(pts.shape[:3], bool).at[0, 0, 40:].set(False)
        variables = model.init(jax.random.PRNGKey(0), pts, batch["centroids"],
                               pad, pmask, train=False)
        ref, _, _ = model.apply(variables, pts, batch["centroids"],
                                pad, pmask, train=False)
        scrambled = pts.at[0, 0, 40:].set(1e3)
        out, _, _ = model.apply(variables, scrambled, batch["centroids"],
                                pad, pmask, train=False)
        np.testing.assert_allclose(np.asarray(out[0, 0, :40]),
                                   np.asarray(ref[0, 0, :40]), atol=1e-5)

    def test_default_tree_unchanged(self, batch):
        """local_agg='none' (default) must keep the exact reference parameter
        tree so pre-existing checkpoints restore unchanged."""
        model = build_model(AMPNetConfig(), "attention", "segmentation")
        v = model.init(jax.random.PRNGKey(0), batch["points"], batch["centroids"],
                       None, train=False)
        assert "edge_agg" not in v["params"]["encoder"]

    def test_config_roundtrip_and_old_checkpoints(self):
        cfg = self._cfg(local_agg_k=24)
        rt = AMPNetConfig.from_json(cfg.to_json())
        assert rt.model.local_agg == "edge" and rt.model.local_agg_k == 24
        # meta.json written before the field existed -> default 'none'
        import json
        old = json.loads(AMPNetConfig().to_json())
        del old["model"]["local_agg"], old["model"]["local_agg_k"]
        back = AMPNetConfig.from_json(json.dumps(old))
        assert back.model.local_agg == "none"

    def test_folded_backends_reject(self):
        from ampnet_tpu.models.backends import make_forward
        cfg = self._cfg()
        model = build_model(cfg, "attention", "segmentation")
        with pytest.raises(ValueError, match="local_agg"):
            make_forward(model, cfg, backend="folded")

    def test_unknown_local_agg_rejects(self, batch):
        cfg = self._cfg(local_agg="voxel")
        model = build_model(cfg, "attention", "segmentation")
        with pytest.raises(ValueError, match="local_agg"):
            model.init(jax.random.PRNGKey(0), batch["points"], batch["centroids"],
                       None, train=False)


class TestGeomAttentionTokens:
    """ModelConfig.att_geom_tokens — window tokens carry a [mean‖max] pool of
    the offline eigenfeature columns (models/amp.py::GeomTokenEncoding;
    VERDICT r4 #8: ref tokens see only centroid pos-enc,
    pointnetAtt.py:183-190)."""

    def _cfg(self):
        import dataclasses
        from ampnet_tpu.core.config import DataConfig
        return AMPNetConfig(
            data=DataConfig(extra_features=6),
            model=dataclasses.replace(ModelConfig(), att_geom_tokens=True))

    def _geom_batch(self):
        rng = np.random.default_rng(1)
        b = synthetic_batch(rng, 2, 3, 64, num_features=15, real_windows=2)
        # geom columns live in [0, 1]
        b["points"][..., 9:] = rng.uniform(0, 1, b["points"][..., 9:].shape)
        return {k: jnp.asarray(v) for k, v in b.items()}

    def test_train_step_under_jit(self):
        batch = self._geom_batch()
        cfg = self._cfg()
        model = build_model(cfg, "attention", "segmentation")
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch,
                                   steps_per_epoch=1)
        train_step, eval_step = make_step_fns(cfg, augment=True)
        state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        _, preds = eval_step(state, batch)
        assert preds.shape == batch["labels"].shape

    def test_default_tree_unchanged(self, batch):
        model = build_model(AMPNetConfig(), "attention", "segmentation")
        v = model.init(jax.random.PRNGKey(0), batch["points"], batch["centroids"],
                       None, train=False)
        assert "geom_enc" not in v["params"]["context"]

    def test_geom_enc_params_present_and_used(self):
        batch = self._geom_batch()
        cfg = self._cfg()
        model = build_model(cfg, "attention", "segmentation")
        pad = jnp.all(batch["labels"] == -1, axis=-1)
        v = model.init(jax.random.PRNGKey(0), batch["points"], batch["centroids"],
                       pad, train=False)
        assert "geom_enc" in v["params"]["context"]
        ref, _, _ = model.apply(v, batch["points"], batch["centroids"], pad,
                                train=False)
        # changing only the geom columns must change logits (tokens read them)
        pts2 = batch["points"].at[..., 9:].set(0.0)
        out, _, _ = model.apply(v, pts2, batch["centroids"], pad, train=False)
        assert not np.allclose(np.asarray(ref), np.asarray(out))

    def test_rejects_nine_feature_input(self, batch):
        cfg = self._cfg()
        model = build_model(cfg, "attention", "segmentation")
        with pytest.raises(ValueError, match="att_geom_tokens"):
            model.init(jax.random.PRNGKey(0), batch["points"], batch["centroids"],
                       None, train=False)

    def test_masked_window_no_nan(self):
        """A window whose every point is masked must not NaN the attention."""
        batch = self._geom_batch()
        cfg = self._cfg()
        model = build_model(cfg, "attention", "segmentation")
        pad = jnp.zeros(batch["labels"].shape[:2], bool).at[0, 2].set(True)
        pmask = jnp.ones(batch["points"].shape[:3], bool).at[0, 2].set(False)
        v = model.init(jax.random.PRNGKey(0), batch["points"], batch["centroids"],
                       pad, pmask, train=False)
        out, _, _ = model.apply(v, batch["points"], batch["centroids"], pad,
                                pmask, train=False)
        assert np.isfinite(np.asarray(out[:, :2])).all()

    def test_folded_backends_reject(self):
        from ampnet_tpu.models.backends import make_forward
        cfg = self._cfg()
        model = build_model(cfg, "attention", "segmentation")
        with pytest.raises(ValueError, match="att_geom_tokens"):
            make_forward(model, cfg, backend="folded")
