#!/usr/bin/env python
"""Reference baseline classification parity arm — NOT RUNNABLE as committed.

This driver reproduces a reference defect rather than a parity number: the
baseline classification trainer (pointNet/baseline/train_classification.py)
pairs ``LidarDataset`` — which emits 7 features per point
(datasets.py:63: x,y,z,I,G,B,NDVI) — with ``light_pointnet_256``, whose
encoder hardcodes ``nn.Conv1d(9, 64, 1)`` (light_pointnet_256.py:56, whose own
comment says "7 channels..."). Running it crashes with a channel mismatch on
ANY data this dataset class can produce, joining the repo's other dead paths
(pointNet_2, light_pointnet — SURVEY.md §7 quirks). There is therefore no
reference side for a classification head-to-head; see BASELINE.md.

Kept as the reproduction: ref_cls.py DATA_DIR OUT_DIR [--epochs N ...] crashes
inside the reference's first forward with
``RuntimeError: ... expected input[B, 7, N] to have 9 channels``.
"""

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_train import REFERENCE, install_shims  # noqa: E402


def load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REFERENCE, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--n_points", type=int, default=256)
    args = ap.parse_args()

    os.environ.setdefault("MPLBACKEND", "Agg")
    data_dir = os.path.abspath(args.data_dir)
    out_dir = os.path.abspath(args.out_dir)
    # cls list files mirror the seg lists; dir name must contain 'RGBN'
    lists_dir = os.path.join(out_dir, "RGBN_lists")
    os.makedirs(lists_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        with open(os.path.join(data_dir, f"{split}_seg_files.txt")) as f:
            files = [ln.strip() for ln in f if ln.strip()]
        with open(os.path.join(lists_dir, f"{split}_cls_files.txt"), "w") as f:
            f.write("\n".join(files) + "\n")

    for sub in ("pointNet/checkpoints", "pointNet/runs/tower_detec/prod", "figures"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    os.chdir(out_dir)

    install_shims()
    sys.path.insert(0, REFERENCE)

    import torch

    torch.set_num_threads(1)
    torch.manual_seed(0)

    trainer = load("pointNet/baseline/train_classification.py", "ref_cls_train")
    trainer.train(
        data_dir, lists_dir, out_dir, args.n_points, args.batch_size,
        args.epochs, 1e-3, "EFS", 0.999, 0, "", False,
    )

    import glob

    ckpts = glob.glob(os.path.join(out_dir, "pointNet/checkpoints/checkpoint_*.pth"))
    assert ckpts, "no checkpoint produced"
    ckpt = max(ckpts, key=os.path.getmtime)
    print("checkpoint:", ckpt, flush=True)

    tester = load("pointNet/baseline/test_classification.py", "ref_cls_test")
    with open(os.path.join(lists_dir, "test_cls_files.txt")) as f:
        test_files = [ln.strip() for ln in f if ln.strip()]
    tester.test(data_dir, args.n_points, os.path.join(out_dir, "results"), 0,
                ckpt, test_files)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
