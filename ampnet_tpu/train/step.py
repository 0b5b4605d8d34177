"""The jitted train/eval steps — the whole reference ``train_loop``
(``train_pointnet-attention.py:337-475``) as ONE compiled XLA program.

What the reference does per batch — 9 sequential encoder launches with host-side NumPy
rotation and torch.cat reallocation between them, then attention, loss, backward —
happens here as a single fused program: on-device augmentation, one batched
``[B*W, N, C]`` encoder pass, masked attention, masked weighted CE + T-Net
regularizer, grads, Adam update. Metrics come back as a [C, C] confusion matrix so
the epoch driver never pulls per-point predictions to the host.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ampnet_tpu.core.config import AMPNetConfig
from ampnet_tpu.core.metrics import confusion_matrix
from ampnet_tpu.ops.augment import (
    jitter,
    random_point_dropout,
    random_scale,
    random_shift,
    rotate_z,
    shuffle_windows,
)
from ampnet_tpu.train.losses import (
    cross_entropy_weight_sum,
    distillation_kl,
    distillation_kl_parts,
    orthogonality_regularizer,
    weighted_cross_entropy,
    weighted_cross_entropy_parts,
    weighted_focal,
    weighted_focal_parts,
)
from ampnet_tpu.train.state import AMPTrainState

Batch = Dict[str, jnp.ndarray]


def window_pad_mask_from_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """A window is padding iff every label in it is −1
    (train_pointnet-attention.py:428-431)."""
    return jnp.all(labels == -1, axis=-1)


def _forward(state, params, batch_stats, batch, cfg: AMPNetConfig, train, dropout_rng):
    pad_mask = batch.get("window_pad_mask")
    if pad_mask is None:
        pad_mask = window_pad_mask_from_labels(batch["labels"])
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    # mixed-width distillation: when a --geom_features teacher widens the
    # batch schema beyond this model's own feature set, the student reads its
    # prefix (canonical order — geom eigenfeature columns are appended last)
    points = batch["points"]
    width = int(cfg.data.num_features + cfg.data.extra_features)
    if points.shape[-1] > width:
        points = points[..., :width]
    out = state.apply_fn(
        variables,
        points,
        batch.get("centroids"),
        pad_mask,
        batch.get("point_mask"),
        train=train,
        rngs=rngs,
        mutable=["batch_stats"] if train else False,
    )
    if train:
        (logits, t_feat, _), updates = out
        return logits, t_feat, updates["batch_stats"]
    logits, t_feat, _ = out
    return logits, t_feat, batch_stats


def make_step_fns(
    cfg: AMPNetConfig,
    augment: bool = True,
    grad_accum: int = 0,  # 0 → cfg.train.grad_accum
    teacher=None,  # [(cfg, model, variables_or_list), ...] → distillation
) -> Tuple[Callable, Callable]:
    """Build jitted (train_step, eval_step) closures over the config.

    ``grad_accum=K`` splits each batch into K equal micro-batches, lax.scans the
    forward+backward over them accumulating gradients (and chaining BatchNorm
    running stats), and applies ONE Adam update — the memory footprint of batch
    B/K with the optimizer semantics of batch B. The weighted-CE gradient is
    EXACT, not approximate: each micro-batch's loss is its CE numerator over the
    GLOBAL weight sum (computable from the labels before any forward), so
    ``Σ_k ∇(N_k/W_total) = ∇(N/W_total)`` even when micro-batches carry unequal
    valid-weight mass (padded windows, skewed class weights). The one term that
    differs from the unaccumulated step is the ``reg_weight``-scaled (1e-3)
    T-Net regularizer: a Frobenius norm is a sqrt of a sum, so accumulation uses
    the mean of per-micro norms — same zero set, gradient direction differs only
    in that term's positive per-micro scale. Exactness is about the LOSS
    algebra: batch-mode BatchNorm (the T-Net FC head is always batch-mode over
    windows, per the reference's BatchNorm1d on [B, C]) computes per-micro
    statistics, the same approximation every framework's accumulation makes.
    A memory lever for batch sizes whose stored residuals exceed HBM
    (docs/design.md batch-scaling study)."""

    class_weights = jnp.asarray(cfg.train.class_weights, jnp.float32)
    reg_w = cfg.train.reg_weight
    num_classes = cfg.model.num_classes
    grad_accum = grad_accum or getattr(cfg.train, "grad_accum", 1)
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    focal_gamma = float(getattr(cfg.train, "focal_gamma", 0.0))
    if focal_gamma < 0:
        raise ValueError(f"focal_gamma must be >= 0, got {focal_gamma}")

    # the data-loss term: weighted CE (reference semantics) or its focal
    # modulation; the eval loss follows so best-val selection tracks the
    # training objective
    if focal_gamma > 0:
        def data_loss(lg, lb):
            return weighted_focal(
                lg, lb, class_weights, focal_gamma, cfg.train.ignore_index
            )

        def data_loss_parts(lg, lb):
            return weighted_focal_parts(
                lg, lb, class_weights, focal_gamma, cfg.train.ignore_index
            )
    else:
        def data_loss(lg, lb):
            return weighted_cross_entropy(
                lg, lb, class_weights, cfg.train.ignore_index
            )

        def data_loss_parts(lg, lb):
            return weighted_cross_entropy_parts(
                lg, lb, class_weights, cfg.train.ignore_index
            )

    # knowledge distillation (train/distill.py): the frozen teacher forward
    # runs inside this same program on the augmented batch; the data term
    # becomes (1−α)·CE + α·T²·KL(teacher ‖ student)
    alpha = float(getattr(cfg.train, "distill_alpha", 0.0))
    temp = float(getattr(cfg.train, "distill_temp", 1.0))
    if teacher is not None and not 0.0 < alpha <= 1.0:
        raise ValueError(
            f"distillation needs 0 < distill_alpha <= 1, got {alpha}"
        )
    if temp <= 0:
        raise ValueError(f"distill_temp must be > 0, got {temp}")
    teacher_fn = None
    if teacher is not None:
        from ampnet_tpu.train.distill import make_teacher_fn

        teacher_fn = make_teacher_fn(teacher, temperature=temp)

    recipe = tuple(cfg.train.augmentations) if augment else ()

    # donate the input state: params/opt buffers update in place instead of
    # double-buffering (the caller always replaces its state reference)
    @partial(jax.jit, donate_argnums=0)
    def train_step(state: AMPTrainState, batch: Batch):
        rng = jax.random.fold_in(state.rng, state.step)
        keys = jax.random.split(rng, len(recipe) + 1)
        k_drop = keys[-1]

        points, labels = batch["points"], batch["labels"]
        centroids = batch.get("centroids")
        for name, key in zip(recipe, keys):
            if name == "shuffle_windows":
                # shared-permutation window shuffle (train_pointnet-attention.py:390)
                if centroids is not None:
                    points, labels, centroids = shuffle_windows(points, labels, key, centroids)
                else:
                    points, labels = shuffle_windows(points, labels, key)
            elif name == "rotate_z":  # shared-angle z-rotation (…:393,403)
                points = rotate_z(points, key=key)
            elif name == "jitter":
                points = jitter(points, key)
            elif name == "scale":
                points = random_scale(points, key)
            elif name == "shift":
                points = random_shift(points, key)
            elif name == "point_dropout":
                # labels follow the replacement points (per-point supervision)
                points, labels = random_point_dropout(points, key, labels=labels)
            else:
                raise ValueError(f"unknown augmentation {name!r}")
        aug = dict(batch, points=points, labels=labels)
        if centroids is not None:
            aug["centroids"] = centroids
        if teacher_fn is not None:
            # frozen teacher forward on the SAME augmented batch the student
            # sees (shared rotation/shuffle/dropout); fused into this program
            pad_mask = aug.get("window_pad_mask")
            if pad_mask is None:
                pad_mask = window_pad_mask_from_labels(aug["labels"])
            aug["teacher_probs"] = teacher_fn(
                aug["points"], aug.get("centroids"), pad_mask,
                aug.get("point_mask"),
            )

        def full_obj(lg, mb):
            """(data_term, ce_piece, kl_piece) on a full batch."""
            ce = data_loss(lg, mb["labels"])
            if teacher_fn is None:
                return ce, ce, jnp.float32(0.0)
            dl = distillation_kl(lg, mb["teacher_probs"], mb["labels"],
                                 temp, cfg.train.ignore_index)
            return (1.0 - alpha) * ce + alpha * dl, ce, dl

        def loss_and_grads(params, bstats, mb, k_drop_i, obj_fn, reg_scale):
            """Shared loss+grad closure; the full-batch and micro-batch paths
            differ only in the objective normalizers and regularizer scale."""
            def loss_fn(p):
                logits, t_feat, new_stats = _forward(
                    state, p, bstats, mb, cfg, True, k_drop_i
                )
                data, ce, dl = obj_fn(logits, mb)
                reg = orthogonality_regularizer(t_feat)
                return (data + reg_w * reg * reg_scale,
                        (ce, dl, reg, logits, new_stats))

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        if grad_accum == 1:
            (loss, (ce, dl, reg, logits, new_stats)), grads = loss_and_grads(
                state.params, state.batch_stats, aug, k_drop, full_obj, 1.0,
            )
            cm = confusion_matrix(jnp.argmax(logits, axis=-1), aug["labels"], num_classes)
            # under focal training the objective's data term is NOT the CE;
            # log true CE separately so "ce_loss" means the same quantity
            # across runs regardless of the objective
            true_ce = (
                weighted_cross_entropy(
                    logits, aug["labels"], class_weights, cfg.train.ignore_index
                )
                if focal_gamma > 0 else ce
            )
        else:
            b = aug["points"].shape[0]
            if b % grad_accum:
                raise ValueError(f"batch {b} not divisible by grad_accum {grad_accum}")
            micro = {
                k: v.reshape((grad_accum, b // grad_accum) + v.shape[1:])
                for k, v in aug.items()
                if hasattr(v, "reshape")
            }
            drop_keys = jax.random.split(k_drop, grad_accum)
            # global CE normalizer — label-only, so known before the scan;
            # dividing every micro numerator by it makes Σ∇ the exact
            # full-batch CE gradient (see the docstring above)
            k = jnp.float32(grad_accum)
            w_total = jnp.maximum(
                cross_entropy_weight_sum(
                    aug["labels"], class_weights, cfg.train.ignore_index
                ),
                1e-12,
            )
            # KD normalizer: global valid-point count — label-only like
            # w_total, so Σ_k ∇(num_k / n_total) is the exact full-batch
            # KL gradient (same argument as the CE path)
            n_total = jnp.maximum(
                (aug["labels"].reshape(-1)
                 != cfg.train.ignore_index).astype(jnp.float32).sum(),
                1.0,
            )

            def micro_obj(lg, mb):
                num, _ = data_loss_parts(lg, mb["labels"])
                ce = num / w_total  # this micro's share of the batch data loss
                if teacher_fn is None:
                    return ce, ce, jnp.float32(0.0)
                knum, _ = distillation_kl_parts(
                    lg, mb["teacher_probs"], mb["labels"], temp,
                    cfg.train.ignore_index,
                )
                dl = knum / n_total
                return (1.0 - alpha) * ce + alpha * dl, ce, dl

            def body(carry, xs):
                bstats, gacc, lacc, ceacc, dlacc, tceacc, regacc, cmacc = carry
                mb, k_i = xs
                (l, (ce_i, dl_i, reg_i, logits, new_stats)), g = loss_and_grads(
                    state.params, bstats, mb, k_i, micro_obj, 1.0 / k
                )
                # true-CE share of the batch (focal runs log both; identical
                # to ce_i at gamma=0, where XLA CSEs the duplicate expression)
                tce_i = weighted_cross_entropy_parts(
                    logits, mb["labels"], class_weights, cfg.train.ignore_index
                )[0] / w_total
                cm_i = confusion_matrix(
                    jnp.argmax(logits, axis=-1), mb["labels"], num_classes
                )
                gacc = jax.tree.map(jnp.add, gacc, g)
                return (new_stats, gacc, lacc + l, ceacc + ce_i, dlacc + dl_i,
                        tceacc + tce_i, regacc + reg_i, cmacc + cm_i), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            z = jnp.float32(0.0)
            init = (state.batch_stats, zero_g, z, z, z, z, z,
                    jnp.zeros((num_classes, num_classes), jnp.float32))
            (new_stats, grads, lsum, cesum, dlsum, tcesum, regsum, cm), _ = (
                jax.lax.scan(body, init, (micro, drop_keys))
            )
            # micro losses are already globally normalized (CE/KL) / K-scaled
            # (reg), so the accumulated grads and sums need no rescaling
            loss, ce, dl, reg = lsum, cesum, dlsum, regsum / k
            true_ce = tcesum if focal_gamma > 0 else ce

        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        # global gradient norm: observability + the only step output through
        # which gradient mis-scaling is testable (Adam updates are invariant
        # to gradient scale at step 1)
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
        metrics = {"loss": loss, "ce_loss": true_ce, "reg_loss": reg,
                   "confusion": cm, "grad_norm": gn}
        if focal_gamma > 0:
            # the objective's data term; "ce_loss" above stays true CE so the
            # scalar is comparable across runs with different objectives
            metrics["focal_loss"] = ce
        if teacher_fn is not None:
            metrics["distill_loss"] = dl
        return new_state, metrics

    @jax.jit
    def eval_step(state: AMPTrainState, batch: Batch):
        logits, _, _ = _forward(state, state.params, state.batch_stats, batch, cfg, False, None)
        ce = data_loss(logits, batch["labels"])
        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(preds, batch["labels"], num_classes)
        # validation loss is the data term only (train_pointnet-attention.py:471-473);
        # under focal it follows the training objective (best-val consistency)
        # while "ce_loss" stays the true CE
        metrics = {"loss": ce, "ce_loss": ce, "confusion": cm}
        if focal_gamma > 0:
            metrics["ce_loss"] = weighted_cross_entropy(
                logits, batch["labels"], class_weights, cfg.train.ignore_index
            )
            metrics["focal_loss"] = ce
        return metrics, preds

    return train_step, eval_step


# convenience single-use wrappers
def train_step(state, batch, cfg):  # pragma: no cover - thin wrapper
    return make_step_fns(cfg)[0](state, batch)


def eval_step(state, batch, cfg):  # pragma: no cover - thin wrapper
    return make_step_fns(cfg)[1](state, batch)
