"""End-to-end jitted train-step tests: shapes, loss decrease on the synthetic task,
padding invariants, and the window-pad-mask derivation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import AMPNetConfig, ModelConfig, TrainConfig
from ampnet_tpu.core.metrics import iou_from_confusion
from ampnet_tpu.data.synthetic import synthetic_batch
from ampnet_tpu.models.amp import AMPNetSegmenter
from ampnet_tpu.train.state import clone_state, create_train_state
from ampnet_tpu.train.step import make_step_fns, window_pad_mask_from_labels


@pytest.fixture(scope="module")
def cfg():
    return AMPNetConfig(model=ModelConfig(), train=TrainConfig(learning_rate=5e-3))


@pytest.fixture(scope="module")
def setup(cfg):
    rng = np.random.default_rng(42)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, 2, 4, 96).items()}
    model = AMPNetSegmenter(cfg.model)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    return model, state, batch


def test_window_pad_mask():
    labels = jnp.asarray([[[0, 1], [-1, -1], [2, -1]]])
    mask = window_pad_mask_from_labels(labels)
    np.testing.assert_array_equal(np.asarray(mask), [[False, True, False]])


def test_grad_accum_matches_manual_two_micro_accumulation(cfg, setup):
    """The grad_accum=2 step must equal an explicit two-micro-batch loop:
    per-micro grads with sequentially chained BN statistics, averaged, applied
    through the same optimizer. (Comparing against the plain full-batch step is
    NOT meaningful through Adam: it normalizes the update to ~sign(g)*lr, which
    both hides gradient mis-scaling and amplifies reassociation noise on
    near-zero grads — see tests/test_parallel.py's same caveat.)"""
    _, _, batch = setup
    cfg_nodrop = AMPNetConfig(model=ModelConfig(dropout=0.0),
                              train=TrainConfig(learning_rate=5e-3))
    model = AMPNetSegmenter(cfg_nodrop.model)  # dropout must be off for exactness
    state = create_train_state(cfg_nodrop, model, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=1)
    half_b = {k: v[::-1] for k, v in batch.items()}
    half_b["points"] = half_b["points"] + 0.1  # heterogeneous micro statistics
    halves = [batch, half_b]
    dup = {k: jnp.concatenate([halves[0][k], halves[1][k]], axis=0)
           for k in batch}

    from ampnet_tpu.train.losses import (
        cross_entropy_weight_sum,
        orthogonality_regularizer,
        weighted_cross_entropy_parts,
    )

    cw = jnp.asarray(cfg_nodrop.train.class_weights, jnp.float32)
    # the accum step normalizes every micro CE by the GLOBAL weight sum
    w_total = float(cross_entropy_weight_sum(dup["labels"], cw, -1))

    def micro_grads(params, bstats, mb):
        def lf(p):
            (logits, t_feat, _), upd = state.apply_fn(
                {"params": p, "batch_stats": bstats},
                mb["points"], mb["centroids"],
                window_pad_mask_from_labels(mb["labels"]), None,
                train=True, mutable=["batch_stats"],
            )
            num, _ = weighted_cross_entropy_parts(logits, mb["labels"], cw, -1)
            reg = orthogonality_regularizer(t_feat)
            return num / w_total + cfg_nodrop.train.reg_weight * reg / 2, upd

        (loss, upd), g = jax.value_and_grad(lf, has_aux=True)(params)
        return loss, g, upd["batch_stats"]

    l1, g1, bs1 = micro_grads(state.params, state.batch_stats, halves[0])
    l2, g2, bs2 = micro_grads(state.params, bs1, halves[1])
    gavg = jax.tree.map(lambda a, b: a + b, g1, g2)
    manual = clone_state(state).apply_gradients(grads=gavg, batch_stats=bs2)

    step2, _ = make_step_fns(cfg_nodrop, augment=False, grad_accum=2)
    s2, m2 = step2(clone_state(state), dup)

    assert float(m2["loss"]) == pytest.approx(float(l1 + l2), rel=1e-5)
    # BN running stats must chain micro-sequentially (bs0 -> bs1 -> bs2)
    sdiffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          s2.batch_stats, manual.batch_stats)
    # ~1e-4 reassociation noise between the eager per-micro forwards and the
    # fused lax.scan program (BN mean/var reductions associate differently)
    assert max(jax.tree.leaves(sdiffs)) < 1e-3
    # gradient magnitude through the only scale-sensitive step output
    # (post-Adam params are scale-invariant AND amplify reassociation noise on
    # near-zero grads into ±lr flips — unusable for this comparison)
    gn_manual = float(jnp.sqrt(sum(
        jnp.sum(jnp.square(g)) for g in jax.tree.leaves(gavg))))
    assert float(m2["grad_norm"]) == pytest.approx(gn_manual, rel=1e-4)


def test_grad_accum_ce_gradient_exact_vs_full_batch(cfg, setup):
    """With unequal valid-weight mass across micro-batches (the case where
    naive per-micro-mean averaging produces a DIFFERENT gradient direction),
    the accumulated CE gradient must equal the full-batch CE gradient exactly.
    reg_weight=0 isolates the CE term (the regularizer is documented as
    per-micro under accumulation); bn_mode='window' removes cross-micro batch
    statistics so the full-batch and micro forwards are identical functions."""
    _, _, batch = setup
    cfg_iso = AMPNetConfig(
        model=ModelConfig(dropout=0.0, bn_mode="window"),
        train=TrainConfig(reg_weight=0.0, learning_rate=5e-3),
    )
    model = AMPNetSegmenter(cfg_iso.model)
    # micro A: everything valid; micro B: mostly padding -> unequal weight mass
    half_b = {k: v for k, v in batch.items()}
    labels_b = np.array(batch["labels"])
    labels_b[:, 1:, :] = -1  # pad most of micro B's windows
    labels_b[:, 0, ::2] = -1
    half_b["labels"] = jnp.asarray(labels_b)
    dup = {k: jnp.concatenate([batch[k], half_b[k]], axis=0) for k in batch}

    state = create_train_state(cfg_iso, model, jax.random.PRNGKey(0), dup,
                               steps_per_epoch=1)
    step_full, _ = make_step_fns(cfg_iso, augment=False, grad_accum=1)
    step_acc, _ = make_step_fns(cfg_iso, augment=False, grad_accum=2)
    _, m_full = step_full(clone_state(state), dup)
    _, m_acc = step_acc(clone_state(state), dup)

    assert float(m_acc["loss"]) == pytest.approx(float(m_full["loss"]), rel=1e-5)
    assert float(m_acc["grad_norm"]) == pytest.approx(
        float(m_full["grad_norm"]), rel=1e-4)


def test_grad_accum_rejects_indivisible_batch(cfg, setup):
    _, state, batch = setup
    step3, _ = make_step_fns(cfg, augment=False, grad_accum=3)
    with pytest.raises(ValueError, match="not divisible"):
        step3(clone_state(state), batch)  # batch of 2, accum 3


def test_train_step_runs_and_learns(cfg, setup):
    model, state, batch = setup
    state = clone_state(state)
    train_step, eval_step = make_step_fns(cfg, augment=False)
    losses = []
    for _ in range(40):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["ce_loss"]))
    assert np.isfinite(losses).all()
    # overfits a fixed small batch: CE must drop substantially
    assert losses[-1] < losses[0] * 0.7, losses

    metrics, preds = eval_step(state, batch)
    assert preds.shape == batch["labels"].shape
    iou, valid = iou_from_confusion(metrics["confusion"])
    assert np.isfinite(np.asarray(iou)).all()


def test_train_step_with_augmentation_is_finite(cfg, setup):
    model, state, batch = setup
    state = clone_state(state)
    train_step, _ = make_step_fns(cfg, augment=True)
    for _ in range(3):
        state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


def test_confusion_excludes_padding(cfg, setup):
    model, state, batch = setup
    _, eval_step = make_step_fns(cfg)
    metrics, _ = eval_step(state, batch)
    n_valid = int((np.asarray(batch["labels"]) >= 0).sum())
    assert int(np.asarray(metrics["confusion"]).sum()) == n_valid


def test_step_count_and_lr_schedule(cfg, setup):
    model, state, batch = setup
    state = clone_state(state)
    train_step, _ = make_step_fns(cfg)
    step_before = int(state.step)  # snapshot: train_step donates its input
    s1, _ = train_step(state, batch)
    assert int(s1.step) == step_before + 1


def test_gradients_flow_to_all_params(cfg, setup):
    """Every parameter should receive a nonzero gradient signal after a few steps
    (guards against dead branches in the vectorized rewrite)."""
    model, state, batch = setup
    train_step, _ = make_step_fns(cfg, augment=False)
    s = clone_state(state)  # train_step donates: keep the fixture state alive
    for _ in range(3):
        s, _ = train_step(s, batch)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, s.params)
    leaves = jax.tree.leaves(diffs)
    # allow a tiny number of genuinely cold params (e.g. rarely-hit classes) but not many
    frozen = sum(1 for d in leaves if d == 0.0)
    assert frozen == 0, f"{frozen}/{len(leaves)} params received no update"


def test_full_augmentation_recipe(cfg, setup):
    """Every augmentation op in the recipe must run inside the jitted step."""
    from ampnet_tpu.core.config import AMPNetConfig, TrainConfig

    model, state, batch = setup
    state = clone_state(state)
    cfg2 = AMPNetConfig(
        train=TrainConfig(
            augmentations=(
                "shuffle_windows", "rotate_z", "jitter", "scale", "shift",
                "point_dropout",
            )
        )
    )
    train_step, _ = make_step_fns(cfg2, augment=True)
    s, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_unknown_augmentation_rejected(cfg, setup):
    from ampnet_tpu.core.config import AMPNetConfig, TrainConfig
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_step_fns(AMPNetConfig(train=TrainConfig(augmentations=("bogus",))))[0](
            setup[1], setup[2]
        )


def test_remat_encoder_exact_parity(cfg, setup):
    """cfg.model.remat must not change numerics (same params tree, same outputs,
    same gradients) — it only changes what the backward pass stores vs recomputes."""
    import dataclasses

    model, state, batch = setup
    cfg_r = AMPNetConfig(model=dataclasses.replace(cfg.model, remat=True),
                         train=cfg.train)
    model_r = AMPNetSegmenter(cfg_r.model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pad = window_pad_mask_from_labels(batch["labels"])

    out = model.apply(variables, batch["points"], batch["centroids"], pad, train=False)
    out_r = model_r.apply(variables, batch["points"], batch["centroids"], pad, train=False)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out_r[0]), rtol=0, atol=0)

    def loss(m):
        def f(params):
            logits, _, _ = m.apply({"params": params, "batch_stats": state.batch_stats},
                                   batch["points"], batch["centroids"], pad, train=False)
            return (logits ** 2).mean()
        return jax.grad(f)(state.params)

    g, g_r = loss(model), loss(model_r)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), g, g_r)


def test_focal_step_runs_and_differs_from_ce(cfg, setup):
    """focal_gamma>0 swaps the data term (train/losses.py::weighted_focal);
    the step runs, the loss is finite and strictly below CE (modulation in
    (0,1)), and the eval loss follows the training objective."""
    _, _, batch = setup
    cfg_f = AMPNetConfig(
        model=ModelConfig(dropout=0.0, bn_mode="window"),
        train=TrainConfig(reg_weight=0.0, learning_rate=5e-3, focal_gamma=2.0),
    )
    cfg_ce = AMPNetConfig(
        model=ModelConfig(dropout=0.0, bn_mode="window"),
        train=TrainConfig(reg_weight=0.0, learning_rate=5e-3),
    )
    model = AMPNetSegmenter(cfg_f.model)
    state = create_train_state(cfg_f, model, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=1)

    step_f, eval_f = make_step_fns(cfg_f, augment=False)
    step_ce, _ = make_step_fns(cfg_ce, augment=False)
    _, m_f = step_f(clone_state(state), batch)
    _, m_ce = step_ce(clone_state(state), batch)
    assert np.isfinite(float(m_f["loss"]))
    assert float(m_f["loss"]) < float(m_ce["loss"])

    # "ce_loss" stays TRUE weighted CE under focal (same params/batch as the
    # CE step -> identical logits -> identical CE), so the scalar is
    # comparable across runs; the objective's data term logs as "focal_loss"
    assert float(m_f["ce_loss"]) == pytest.approx(float(m_ce["ce_loss"]), rel=1e-5)
    assert float(m_f["focal_loss"]) < float(m_f["ce_loss"])
    assert "focal_loss" not in m_ce

    # eval loss follows the training objective; eval ce_loss stays true CE
    em, _ = eval_f(state, batch)
    assert float(em["loss"]) == pytest.approx(float(m_f["focal_loss"]), rel=1e-4)
    assert float(em["ce_loss"]) == pytest.approx(float(m_f["ce_loss"]), rel=1e-4)
    assert float(em["focal_loss"]) == pytest.approx(float(em["loss"]), rel=1e-6)


def test_grad_accum_focal_gradient_exact_vs_full_batch(cfg, setup):
    """The focal numerator is point-separable, so the grad-accum global
    normalizer argument carries over from CE. Like the CE exactness test,
    micro-batches must share BN statistics for the comparison to isolate the
    loss algebra: the T-Net FC-head BN is batch-mode over windows by design
    (reference BatchNorm1d on [B, C], pointnetAtt.py:30-36), so micros with
    different point sets legitimately see different statistics. Duplicating
    the point set across micros (labels may differ) makes the stats equal."""
    _, _, batch = setup
    cfg_f = AMPNetConfig(
        model=ModelConfig(dropout=0.0, bn_mode="window"),
        train=TrainConfig(reg_weight=0.0, learning_rate=5e-3, focal_gamma=2.0),
    )
    model = AMPNetSegmenter(cfg_f.model)
    half_b = {k: v for k, v in batch.items()}
    labels_b = np.array(batch["labels"])
    labels_b[:, 1:, :] = -1
    labels_b[:, 0, ::2] = -1  # unequal valid-weight mass across micros
    half_b["labels"] = jnp.asarray(labels_b)
    dup = {k: jnp.concatenate([batch[k], half_b[k]], axis=0) for k in batch}
    state = create_train_state(cfg_f, model, jax.random.PRNGKey(0), dup,
                               steps_per_epoch=1)

    step_full, _ = make_step_fns(cfg_f, augment=False, grad_accum=1)
    step_acc, _ = make_step_fns(cfg_f, augment=False, grad_accum=2)
    _, m_full = step_full(clone_state(state), dup)
    _, m_acc = step_acc(clone_state(state), dup)
    assert float(m_acc["loss"]) == pytest.approx(float(m_full["loss"]), rel=1e-5)
    assert float(m_acc["grad_norm"]) == pytest.approx(
        float(m_full["grad_norm"]), rel=1e-4)
    # the accumulated true-CE and focal scalars match the full-batch path too
    assert float(m_acc["ce_loss"]) == pytest.approx(
        float(m_full["ce_loss"]), rel=1e-5)
    assert float(m_acc["focal_loss"]) == pytest.approx(
        float(m_full["focal_loss"]), rel=1e-5)


def _teacher_groups(cfg_like, batch, seed=11):
    """A 1-member teacher group at a fresh init (train/distill.py contract)."""
    model = AMPNetSegmenter(cfg_like.model)
    v = model.init(jax.random.PRNGKey(seed), batch["points"],
                   batch["centroids"], None)
    return [(cfg_like, model, v)]


def test_distillation_kl_one_hot_teacher_is_ce():
    """At T=1 with a one-hot teacher, KL(p_T || p_S) per point reduces to
    -log p_S(target) — the unweighted CE — so the mean over valid points must
    equal the unweighted-CE mean (the golden identity for the KD term)."""
    from ampnet_tpu.train.losses import distillation_kl, weighted_cross_entropy

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 3, 16, 5)), jnp.float32)
    labels = rng.integers(0, 5, size=(2, 3, 16))
    labels[0, 1] = -1  # an ignored window
    labels = jnp.asarray(labels, jnp.int32)
    onehot = jax.nn.one_hot(jnp.maximum(labels, 0), 5, dtype=jnp.float32)
    got = distillation_kl(logits, onehot, labels, temperature=1.0)
    want = weighted_cross_entropy(logits, labels, None)  # unweighted mean
    assert float(got) == pytest.approx(float(want), rel=1e-5)


def test_distill_step_pulls_student_toward_teacher(cfg, setup):
    """alpha=1 (pure KD): training must monotonically-ish shrink the KL to the
    frozen teacher, and the distill_loss metric must be reported."""
    _, _, batch = setup
    cfg_kd = AMPNetConfig(
        model=ModelConfig(dropout=0.0),
        train=TrainConfig(learning_rate=5e-3, distill_alpha=1.0,
                          distill_temp=2.0),
    )
    model = AMPNetSegmenter(cfg_kd.model)
    state = create_train_state(cfg_kd, model, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=1)
    teacher = _teacher_groups(cfg_kd, batch)
    train_step, _ = make_step_fns(cfg_kd, augment=False, teacher=teacher)
    kls = []
    for _ in range(25):
        state, metrics = train_step(state, batch)
        kls.append(float(metrics["distill_loss"]))
    assert np.isfinite(kls).all()
    assert kls[-1] < kls[0] * 0.7, kls
    # the total objective is the KD term plus the regularizer only
    assert float(metrics["loss"]) == pytest.approx(
        float(metrics["distill_loss"])
        + cfg_kd.train.reg_weight * float(metrics["reg_loss"]), rel=1e-4)


def test_distill_grad_accum_exact_vs_full_batch(cfg, setup):
    """The accumulated (1-a)CE + a*KL gradient must equal the full-batch
    gradient exactly — both normalizers (weight sum, valid count) are global
    (same isolation choices as the CE exactness test: reg off, window BN,
    unequal valid mass across micros)."""
    _, _, batch = setup
    cfg_iso = AMPNetConfig(
        model=ModelConfig(dropout=0.0, bn_mode="window"),
        train=TrainConfig(reg_weight=0.0, learning_rate=5e-3,
                          distill_alpha=0.5, distill_temp=3.0),
    )
    model = AMPNetSegmenter(cfg_iso.model)
    half_b = {k: v for k, v in batch.items()}
    labels_b = np.array(batch["labels"])
    labels_b[:, 1:, :] = -1
    labels_b[:, 0, ::2] = -1
    half_b["labels"] = jnp.asarray(labels_b)
    dup = {k: jnp.concatenate([batch[k], half_b[k]], axis=0) for k in batch}

    state = create_train_state(cfg_iso, model, jax.random.PRNGKey(0), dup,
                               steps_per_epoch=1)
    teacher = _teacher_groups(cfg_iso, batch)
    step_full, _ = make_step_fns(cfg_iso, augment=False, grad_accum=1,
                                 teacher=teacher)
    step_acc, _ = make_step_fns(cfg_iso, augment=False, grad_accum=2,
                                teacher=teacher)
    _, m_full = step_full(clone_state(state), dup)
    _, m_acc = step_acc(clone_state(state), dup)
    assert float(m_acc["loss"]) == pytest.approx(float(m_full["loss"]), rel=1e-5)
    assert float(m_acc["distill_loss"]) == pytest.approx(
        float(m_full["distill_loss"]), rel=1e-5)
    assert float(m_acc["grad_norm"]) == pytest.approx(
        float(m_full["grad_norm"]), rel=1e-4)


def test_distill_stacked_and_cross_family_teacher(cfg, setup):
    """A stacked 2-member teacher group plus a GRU group (cross-family) build
    and step finitely; the teacher mean over M members matches averaging the
    members' individual soft targets (spot-checked through the KL value)."""
    from ampnet_tpu.models.factory import build_model
    from ampnet_tpu.train.distill import make_teacher_fn

    _, _, batch = setup
    cfg_kd = AMPNetConfig(
        model=ModelConfig(dropout=0.0),
        train=TrainConfig(learning_rate=5e-3, distill_alpha=0.5,
                          distill_temp=2.0),
    )
    att = AMPNetSegmenter(cfg_kd.model)
    v1 = att.init(jax.random.PRNGKey(1), batch["points"], batch["centroids"], None)
    v2 = att.init(jax.random.PRNGKey(2), batch["points"], batch["centroids"], None)
    from ampnet_tpu.core.config import AMPNetConfig as _C
    gru_cfg = _C(model=ModelConfig(context="gru", dropout=0.0))
    gru = build_model(gru_cfg, "gru", "segmentation")
    vg = gru.init(jax.random.PRNGKey(3), batch["points"], batch["centroids"], None)
    groups = [(cfg_kd, att, [v1, v2]), (gru_cfg, gru, vg)]

    # stacked-vmap mean == explicit member mean
    fn = make_teacher_fn(groups, temperature=2.0)
    got = fn(batch["points"], batch["centroids"],
             window_pad_mask_from_labels(batch["labels"]), None)
    singles = make_teacher_fn(
        [(cfg_kd, att, v1), (cfg_kd, att, v2), (gru_cfg, gru, vg)],
        temperature=2.0,
    )(batch["points"], batch["centroids"],
      window_pad_mask_from_labels(batch["labels"]), None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(singles),
                               rtol=2e-5, atol=2e-6)

    model = AMPNetSegmenter(cfg_kd.model)
    state = create_train_state(cfg_kd, model, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=1)
    train_step, _ = make_step_fns(cfg_kd, augment=False, teacher=groups)
    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["distill_loss"]))


def test_distill_alpha_validation(cfg, setup):
    _, _, batch = setup
    bad = AMPNetConfig(model=ModelConfig(dropout=0.0),
                       train=TrainConfig(distill_alpha=0.0))
    with pytest.raises(ValueError, match="distill_alpha"):
        make_step_fns(bad, teacher=_teacher_groups(bad, batch))


def test_distill_mixed_width_geom_teacher_plain_student():
    """A --geom_features teacher (15-col input) distills into a plain 9-col
    student: the batch carries the teacher's wide schema, the student inits
    and forwards on its 9-column prefix (train/step.py::_forward,
    train/state.py::create_train_state), the teacher reads all 15
    (train/distill.py per-group width) — the compress-the-geom-ensemble
    recipe (VERDICT r3 #3)."""
    from ampnet_tpu.core.config import DataConfig

    rng = np.random.default_rng(3)
    batch9 = synthetic_batch(rng, 2, 3, 64)
    geom = rng.uniform(size=batch9["points"].shape[:-1] + (6,)).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch9.items()}
    batch["points"] = jnp.asarray(
        np.concatenate([batch9["points"], geom], axis=-1))
    assert batch["points"].shape[-1] == 15

    cfg_teacher = AMPNetConfig(
        model=ModelConfig(dropout=0.0), data=DataConfig(extra_features=6),
        train=TrainConfig(learning_rate=5e-3, distill_alpha=0.5,
                          distill_temp=2.0),
    )
    cfg_student = AMPNetConfig(
        model=ModelConfig(dropout=0.0), data=DataConfig(extra_features=0),
        train=TrainConfig(learning_rate=5e-3, distill_alpha=0.5,
                          distill_temp=2.0),
    )
    teacher = _teacher_groups(cfg_teacher, batch)
    model = AMPNetSegmenter(cfg_student.model)
    state = create_train_state(cfg_student, model, jax.random.PRNGKey(0),
                               batch, steps_per_epoch=1)
    # the student's first encoder layer must have the 9-column width, not 15
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    kernels = {jax.tree_util.keystr(p): v.shape for p, v in flat
               if v.ndim == 2}
    assert not any(s[0] == 15 for s in kernels.values()), kernels
    train_step, eval_step = make_step_fns(cfg_student, augment=True,
                                          teacher=teacher)
    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["distill_loss"]))
    m, _preds = eval_step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_distill_teacher_wider_than_batch_raises():
    """A geom teacher on a plain 9-column batch must fail loudly with the
    re-preprocess hint, not silently mis-slice."""
    from ampnet_tpu.core.config import DataConfig

    rng = np.random.default_rng(4)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, 1, 2, 32).items()}
    cfg_teacher = AMPNetConfig(
        model=ModelConfig(dropout=0.0), data=DataConfig(extra_features=6),
        train=TrainConfig(distill_alpha=0.5),
    )
    # teacher variables must be built at its OWN width for the error to be
    # about the batch, so init on a widened copy of the batch
    wide = jnp.concatenate(
        [batch["points"],
         jnp.zeros(batch["points"].shape[:-1] + (6,), jnp.float32)], axis=-1)
    model = AMPNetSegmenter(cfg_teacher.model)
    v = model.init(jax.random.PRNGKey(1), wide, batch["centroids"], None)
    step, _ = make_step_fns(cfg_teacher, augment=False,
                            teacher=[(cfg_teacher, model, v)])
    model_s = AMPNetSegmenter(cfg_teacher.model)
    state = create_train_state(
        AMPNetConfig(model=ModelConfig(dropout=0.0)), model_s,
        jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    with pytest.raises(ValueError, match="teacher expects 15"):
        step(state, batch)
