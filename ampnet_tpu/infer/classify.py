"""Classification evaluation — counterpart of ``baseline/test_classification.py``:
accuracy, precision/recall/F1, precision-recall AUC, and wrong-prediction CSVs
(reference ``:87-167``)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ampnet_tpu.core.logging import append_results_csv
from ampnet_tpu.data.pipeline import to_device_batch
from ampnet_tpu.train.cls_step import binary_metrics_from_confusion


def evaluate_classification(
    state,
    eval_step,
    batcher,
    out_dir: Optional[str] = None,
    model_name: str = "ampnet_cls",
) -> Dict:
    names_all, preds_all, targets_all, probs_all = [], [], [], []
    for batch in batcher:
        dev = to_device_batch(batch)
        metrics, preds = eval_step(state, dev)
        names_all += batch["names"]
        preds_all.append(np.asarray(preds))
        targets_all.append(np.asarray(batch["cls_label"]))
        probs_all.append(np.asarray(metrics["pos_prob"]))
    preds = np.concatenate(preds_all)
    targets = np.concatenate(targets_all)
    probs = np.concatenate(probs_all)
    # drop replicate-padded entries (cls_label −1, batch-divisibility padding)
    valid = targets >= 0
    names_all = [n for n, v in zip(names_all, valid) if v]
    preds, targets, probs = preds[valid], targets[valid], probs[valid]

    cm = np.zeros((2, 2))
    for t, p in zip(targets, preds):
        cm[int(t), int(p)] += 1
    out = binary_metrics_from_confusion(cm)
    out["n_samples"] = int(len(preds))

    try:  # precision-recall AUC over positive-class probabilities
        from sklearn.metrics import average_precision_score

        out["pr_auc"] = float(average_precision_score(targets, probs))
    except Exception:
        out["pr_auc"] = float("nan")

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        # wrong-prediction CSVs like the reference (false positives + negatives)
        wrong = [
            {"name": n, "target": int(t), "pred": int(p)}
            for n, t, p in zip(names_all, targets, preds)
            if t != p
        ]
        for row in wrong:
            append_results_csv(os.path.join(out_dir, "wrong_predictions.csv"), row)
        append_results_csv(
            os.path.join(out_dir, "classification-results.csv"),
            {"model": model_name, **{k: v for k, v in out.items()}},
        )
    return out


class CloudClassifier:
    """Serving engine for the binary tower-classification task: one label (+
    class probabilities) per cloud of any size. Exposes the same
    ``dispatch_many``/``fetch_many``/``predict_many`` interface as
    ``TiledInferencer`` so the HTTP daemon's micro-batching service
    (infer/server.py) drives either task unchanged.

    Each cloud is resampled to the model's ``n_points`` (shared
    ``data.datasets.resample_points``, the reference LidarDataset semantics),
    presented as one real window replicate-padded to the checkpoint's
    ``max_windows`` (the training collate shape — windowed classifier heads
    size their window-mixing kernel to it, models/amp.py), and classified in
    one power-of-two-batched forward."""

    def __init__(self, model, variables, cfg, n_points: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.n_points = n_points or cfg.data.n_points
        self.max_clusters = 1  # healthz parity with the segmentation engine
        self.backend = "xla"
        n_windows = cfg.data.max_windows

        def run(variables, points):  # [B, n_points, F] -> (labels [B], probs [B, C])
            # one real window replicated to the training window count; the
            # replicas are attention-masked (pad mask), exactly like the
            # collate's replicate padding of a single-window cloud
            windows = jnp.repeat(points[:, None], n_windows, axis=1)
            centroids = windows[..., :2].mean(axis=2)
            pad = jnp.broadcast_to(
                jnp.arange(n_windows)[None] > 0, (points.shape[0], n_windows)
            )
            logits, _, _ = model.apply(variables, windows, centroids, pad, train=False)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.argmax(logits, axis=-1).astype(jnp.int8), probs.astype(jnp.float16)

        self._run = jax.jit(run)

    def _resample(self, pc: np.ndarray, seed: int) -> np.ndarray:
        from ampnet_tpu.data.datasets import resample_points

        return resample_points(pc, self.n_points, np.random.default_rng(seed))

    def dispatch_many(self, clouds, seeds=None, return_probs: bool = False) -> Dict:
        import jax.numpy as jnp

        seeds = seeds or list(range(len(clouds)))
        rows = np.stack(
            [self._resample(np.asarray(c, np.float32), s) for c, s in zip(clouds, seeds)]
        )
        b = len(clouds)
        b_pad = 1 << (b - 1).bit_length()
        if b_pad > b:
            rows = np.concatenate([rows, np.repeat(rows[:1], b_pad - b, axis=0)])
        out = self._run(self.variables, jnp.asarray(rows))
        return {"out": out, "n": b, "return_probs": return_probs}

    def fetch_many(self, handle: Dict) -> list:
        labels, probs = (np.asarray(a) for a in handle["out"])
        n = handle["n"]
        if handle["return_probs"]:
            return [(labels[i : i + 1].astype(np.int32), probs[i]) for i in range(n)]
        return [labels[i : i + 1].astype(np.int32) for i in range(n)]

    def predict_many(self, clouds, seeds=None, return_probs: bool = False) -> list:
        return self.fetch_many(self.dispatch_many(clouds, seeds, return_probs))
