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
