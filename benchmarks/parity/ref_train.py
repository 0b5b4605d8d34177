#!/usr/bin/env python
"""Train the REFERENCE torch AMP-Net (self-attention segmenter) on an ampnet_tpu
synthetic dataset, for the head-to-head quality-parity protocol (BASELINE.md).

Runs /root/reference/pointNet/self-attention/train_pointnet-attention.py's
``train_att`` unmodified, with import shims for packages the image lacks
(prettytable / progressbar / k_means_constrained / laspy — none are exercised by
the training path). The dataset must have been produced by
``ampnet preprocess --artifact_format pt`` so ``kmeans_<name>.pt`` artifacts and
``{train,val}_seg_files.txt`` lists exist in the reference's exact layout
(datasets.py:317, train_pointnet-attention.py:57-60).

Usage: ref_train.py DATA_DIR OUT_DIR [--epochs N] [--batch_size B] [--n_points P]

The best-val checkpoint lands in OUT_DIR/pointNet/checkpoints/model_*.pth
(utils/utils.py:437-438 hardcodes the relative path — we chdir into OUT_DIR).
"""

import argparse
import importlib.util
import os
import sys
import types

REFERENCE = "/root/reference"


def _module(name: str) -> types.ModuleType:
    """Shim module with a real __spec__ (torch._dynamo walks find_spec over
    sys.modules and chokes on spec-less entries)."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def install_shims() -> None:
    pb = _module("progressbar")
    pb.progressbar = lambda it, **kw: it
    sys.modules.setdefault("progressbar", pb)

    pt = _module("prettytable")

    class PrettyTable:
        def __init__(self, *a, **k):
            pass

        def add_row(self, *a, **k):
            pass

        def __str__(self):
            return "<table>"

    pt.PrettyTable = PrettyTable
    sys.modules.setdefault("prettytable", pt)

    kmc = _module("k_means_constrained")

    class KMeansConstrained:  # training path never constructs one
        def __init__(self, *a, **k):
            raise RuntimeError("k_means_constrained is not used in training")

    kmc.KMeansConstrained = KMeansConstrained
    sys.modules.setdefault("k_means_constrained", kmc)

    sys.modules.setdefault("laspy", _module("laspy"))

    # pointNet_2 does not exist anywhere in the reference repo (the import at
    # pointNet/model/pointnetAtt.py:4 is dead outside an unused PointNet++ class)
    p2 = _module("pointNet_2")
    p2m = _module("pointNet_2.models")
    p2u = _module("pointNet_2.models.pointnet2_utils")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("pointNet_2 is absent from the reference repo")

    p2u.PointNetSetAbstraction = _Unavailable
    p2u.PointNetFeaturePropagation = _Unavailable
    p2m.pointnet2_utils = p2u
    p2.models = p2m
    sys.modules.setdefault("pointNet_2", p2)
    sys.modules.setdefault("pointNet_2.models", p2m)
    sys.modules.setdefault("pointNet_2.models.pointnet2_utils", p2u)

    tq = _module("tqdm")
    tq.tqdm = lambda it, **kw: it
    sys.modules.setdefault("tqdm", tq)

    cc = _module("codecarbon")
    cc.track_emissions = lambda *a, **k: (lambda f: f)
    sys.modules.setdefault("codecarbon", cc)

    ts = _module("torchsummary")  # imported (unused) by the GRU trainer
    ts.summary = lambda *a, **k: None
    sys.modules.setdefault("torchsummary", ts)

    # pointNet.model.light_pointnet is absent from the reference repo; its import
    # at baseline/test_classification.py:4 is immediately shadowed by the valid
    # light_pointnet_256 import on the next line
    lp = _module("pointNet.model.light_pointnet")

    class _LPUnavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("light_pointnet is absent from the reference repo")

    lp.ClassificationPointNet = _LPUnavailable
    sys.modules.setdefault("pointNet.model.light_pointnet", lp)


def load_train_module(family: str = "attention"):
    rel = {
        "attention": ("self-attention", "train_pointnet-attention.py"),
        "gru": ("rnn", "train_pointnetGRU.py"),
    }[family]
    path = os.path.join(REFERENCE, "pointNet", *rel)
    spec = importlib.util.spec_from_file_location("ref_train_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--n_points", type=int, default=256)
    ap.add_argument("--learning_rate", type=float, default=1e-3)
    ap.add_argument("--family", choices=["attention", "gru"], default="attention")
    ap.add_argument("--n_windows", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0,
                    help="torch/numpy/random seed (multi-seed parity arms)")
    args = ap.parse_args()

    os.environ.setdefault("MPLBACKEND", "Agg")
    data_dir = os.path.abspath(args.data_dir)
    out_dir = os.path.abspath(args.out_dir)
    # the reference writes checkpoints/tensorboard to hardcoded relative paths
    for sub in ("pointNet/checkpoints", "pointNet/runs/tower_detec/segmentation",
                "figures"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    os.chdir(out_dir)

    install_shims()
    sys.path.insert(0, REFERENCE)

    import torch

    torch.set_num_threads(1)  # 1-core host; matches the recorded CPU baseline
    torch.manual_seed(args.seed)
    import random

    import numpy as _np

    random.seed(args.seed)
    _np.random.seed(args.seed)

    mod = load_train_module(args.family)

    # The reference classes default device='cuda' (pointnetAtt.py:155) and the
    # train script doesn't pass device= for the attention nets — on a CPU host
    # they'd crash. Rewrite 'cuda' defaults to 'cpu' at runtime (no source edit).
    import pointNet.model.pointnetAtt as patt

    for obj in vars(patt).values():
        init = getattr(obj, "__init__", None)
        defaults = getattr(init, "__defaults__", None)
        if defaults and "cuda" in defaults:
            init.__defaults__ = tuple(
                "cpu" if d == "cuda" else d for d in defaults
            )

    common = dict(
        task="segmentation",
        dataset_folder=data_dir,
        path_list_files=data_dir,
        output_folder=out_dir,
        n_points=args.n_points,
        batch_size=args.batch_size,
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        weighing_method="EFS",
        beta=0.999,
        number_of_workers=0,
        model_checkpoint=None,
    )
    if args.family == "attention":
        mod.train_att(**common)
    else:
        mod.train_gru(n_windows=args.n_windows, **common)
    print("reference training done; checkpoints in",
          os.path.join(out_dir, "pointNet/checkpoints"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
