#!/usr/bin/env python
"""Multi-seed quality sweep over a (hard) synthetic benchmark dataset.

Round-3 protocol (VERDICT r2 #1): the easy synthetic benchmark saturated
(flagship mIoU 0.9625, veg IoUs >= 0.998), so quality numbers get error bars —
every model family trains and evaluates at >= 5 seeds on the HARD generator
(``ampnet synth --scene hard``) and BASELINE.md reports mean +/- std.

Runs everything in ONE process so XLA program caches are shared across seeds
(same shapes => one compile per family, critical on the slow-compile relay).

Usage:
  python benchmarks/quality_sweep.py --data DIR --out results.jsonl \
      --families attention,gru,classic,pointnet2,cls --seeds 0,1,2,3,4 \
      --epochs 80 [--scratch /tmp/qsweep]

Each row: {"family", "seed", "train_s", "eval_s", "summary": {iou_*, miou, oa}}
(classification rows carry accuracy/F1/PR-AUC instead). Re-running with the same
--out skips (family, seed) pairs already present — the sweep is resumable.

Evaluation mirrors the round-2 parity protocol: the tiled tester at
max_clusters 32 for windowed archs, whole-cloud evaluation for the others
(reference tester semantics, test_pointnet_att_segmen.py:186-219 /
test_segmentation.py).
"""

import argparse
import contextlib
import io
import json
import os
import sys
import time
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def train_args(family, seed, data, scratch, epochs, batch_size, n_points,
               n_windows, dtype, seg_weighing=""):
    task = "classification" if family == "cls" else "segmentation"
    arch = "attention" if family == "cls" else family
    windowed = arch in ("attention", "gru")
    return SimpleNamespace(
        dataset_path=data,
        task=task,
        arch=arch,
        path_list_files=data,
        out_path=os.path.join(scratch, f"{family.replace('@', '_')}_s{seed}"),
        seg_weighing=seg_weighing,
        number_of_points=n_points if windowed else max(n_points, 2048),
        number_of_windows=n_windows,
        batch_size=batch_size,
        epochs=epochs,
        learning_rate=1e-3,
        weighing_method="EFS",
        seed=seed,
        model_checkpoint="",
        device_cache="auto",
        epoch_dispatch="auto",
        num_devices=1,
        bn_mode="batch",
        dtype=dtype,
        focal_gamma=0.0,
        oversample_factor=1,
        oversample_classes="auto",
        distill_from="",
        distill_alpha=0.5,
        distill_temp=2.0,
        reference_noise_compat=False,
        local_agg="none",
        local_agg_k=16,
        geom_features=False,
        geom_radius_norm="absolute",
        att_geom_tokens=False,
    )


def test_args(ta, family, tta=1, tile_votes=1, transfer_dtype=None):
    ckpt = os.path.join(ta.out_path, "checkpoints", f"{ta.arch}_{ta.task}_best")
    return SimpleNamespace(
        dataset_path=ta.dataset_path,
        model_checkpoint=ckpt,
        path_list_files=ta.path_list_files,
        out_path=ta.out_path,
        arch=ta.arch,
        task=ta.task,
        max_clusters=32,
        plot=False,
        backend="xla",
        tiler="balanced",
        transfer_dtype=transfer_dtype,
        tta=tta,
        tile_votes=tile_votes,
    )


def run_one(family, seed, args):
    """family may carry an arm suffix: 'attention@INS' trains with
    --seg_weighing INS (cli/main.py::seg_class_weights); 'attention@focal2'
    trains with --focal_gamma 2 (train/losses.py::weighted_focal_parts). The
    full spec stays the row label so arms land as distinct families."""
    from ampnet_tpu.cli.main import cmd_test, cmd_train

    base, _, mod = family.partition("@")
    seg_weighing, focal_gamma, distill, oversample = "", 0.0, False, 1
    local_agg, local_agg_k, geom = "none", 16, False
    geom_radius_norm, att_geom_tokens = "absolute", False
    # mods combine with '+': 'attention@edge+geom' trains with both levers
    for tok in (t for t in mod.split("+") if t):
        if tok.startswith("focal"):
            focal_gamma = float(tok[len("focal"):] or 2.0)
        elif tok.startswith("edge"):
            # boundary-aware local aggregation arm: 'attention@edge' or
            # 'attention@edge24' (k override) — cli --local_agg edge
            local_agg = "edge"
            local_agg_k = int(tok[len("edge"):] or 16)
        elif tok == "geom":
            # offline eigenfeature columns — --data must point at a dataset
            # preprocessed with `ampnet preprocess --geom_features`
            geom = True
        elif tok == "geommed":
            # density-conditioned geom arm: dataset preprocessed with
            # `--geom_features --geom_radius_norm median` (BASELINE.md
            # density-shift lever); the mode is recorded in checkpoint meta
            geom = True
            geom_radius_norm = "median"
        elif tok == "attg":
            # geometry-aware attention tokens (cli --att_geom_tokens);
            # combine as 'attention@geom+attg'
            att_geom_tokens = True
        elif tok.startswith("kd"):
            # knowledge-distillation arm: 'attention@kd' (alpha from
            # --distill_*) or 'attention@kd0.7'; teacher = --distill_from
            distill = True
            mod = tok  # alpha suffix parsing below reads `mod`
        elif tok.startswith("os"):
            # rare-class oversampling arm: '@os4' = --oversample_factor 4
            oversample = int(tok[len("os"):] or 4)
        else:
            seg_weighing = tok
    ta = train_args(base, seed, args.data, args.scratch, args.epochs,
                    args.batch_size, args.n_points, args.n_windows, args.dtype,
                    seg_weighing=seg_weighing)
    ta.focal_gamma = focal_gamma
    ta.oversample_factor = oversample
    ta.local_agg, ta.local_agg_k = local_agg, local_agg_k
    ta.geom_features = geom
    ta.geom_radius_norm = geom_radius_norm
    ta.att_geom_tokens = att_geom_tokens
    if distill:
        if not getattr(args, "distill_from", ""):
            return {"family": family, "seed": seed,
                    "error": "@kd arm needs --distill_from"}
        ta.distill_from = args.distill_from
        ta.distill_alpha = (float(mod[len("kd"):]) if mod[len("kd"):]
                            else args.distill_alpha)
        ta.distill_temp = args.distill_temp
    ta.out_path = os.path.join(args.scratch, f"{family.replace('@', '_')}_s{seed}")
    os.makedirs(ta.out_path, exist_ok=True)
    t0 = time.time()
    if getattr(args, "eval_only", False):
        ckpt = os.path.join(ta.out_path, "checkpoints", f"{ta.arch}_{ta.task}_best")
        if not os.path.exists(ckpt):
            return {"family": family, "seed": seed,
                    "error": f"--eval_only: no checkpoint at {ckpt}"}
    else:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cmd_train(ta)
        if rc != 0:
            return {"family": family, "seed": seed, "error": f"train rc={rc}"}
    train_s = time.time() - t0

    t0 = time.time()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cmd_test(test_args(ta, family, tta=args.tta,
                                tile_votes=getattr(args, "tile_votes", 1),
                                transfer_dtype=getattr(args, "transfer_dtype",
                                                       None) or None))
    eval_s = time.time() - t0
    if rc != 0:
        return {"family": family, "seed": seed, "error": f"test rc={rc}"}
    txt = buf.getvalue()
    summary = json.loads(txt[txt.find("{"):])
    # eval_only rows did no training — None, not a ~0 s "measured" time
    row = {"family": family, "seed": seed,
           "train_s": None if getattr(args, "eval_only", False)
           else round(train_s, 1),
           "eval_s": round(eval_s, 1), "summary": summary}
    if args.tta > 1:
        row["tta"] = args.tta
    if getattr(args, "transfer_dtype", ""):
        row["transfer_dtype"] = args.transfer_dtype
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--families", default="attention,gru,classic,pointnet2,cls")
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--n_points", type=int, default=256)
    ap.add_argument("--n_windows", type=int, default=5)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--tta", type=int, default=1,
                    help="dihedral-ensemble views at TEST time (infer --tta "
                         "semantics); combine with --eval_only to re-score "
                         "checkpoints from an earlier sweep's --scratch")
    ap.add_argument("--tile_votes", type=int, default=1,
                    help="overlap-vote tilings per view at TEST time "
                         "(cli --tile_votes; composes with --tta/--eval_only)")
    ap.add_argument("--distill_from", default="",
                    help="teacher checkpoint(s) for '@kd' arms (comma-"
                         "separated; cross-family OK — cli --distill_from)")
    ap.add_argument("--distill_alpha", type=float, default=0.5)
    ap.add_argument("--distill_temp", type=float, default=2.0)
    ap.add_argument("--transfer_dtype", default="",
                    help="host->device wire for the evaluator (cli "
                         "--transfer_dtype: float16/int8); measures the "
                         "wire's quality cost at eval time")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip training; evaluate the existing best "
                         "checkpoints in --scratch (errors if one is missing)")
    ap.add_argument("--scratch", default="/tmp/qsweep")
    args = ap.parse_args()

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    if "error" not in r:
                        # transfer_dtype is part of WHAT a row measures — a
                        # plain row must not mark an int8 re-run as done
                        done.add((r["family"], r["seed"],
                                  r.get("transfer_dtype", "")))
                except json.JSONDecodeError:
                    pass

    families = args.families.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]
    total = len(families) * len(seeds)
    i = 0
    for family in families:  # family-major: one compile, then all seeds hit cache
        for seed in seeds:
            i += 1
            if (family, seed, getattr(args, "transfer_dtype", "") or "") in done:
                print(f"[{i}/{total}] {family} seed {seed}: already done",
                      file=sys.stderr, flush=True)
                continue
            print(f"[{i}/{total}] {family} seed {seed} ...",
                  file=sys.stderr, flush=True)
            t0 = time.time()
            try:
                row = run_one(family, seed, args)
            except Exception as e:
                # one crashing arm must not abort an hours-long sweep; the
                # error row keeps the resumable done-set honest (error rows
                # are retried on re-run)
                row = {"family": family, "seed": seed,
                       "error": f"{type(e).__name__}: {e}"}
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            key = ("miou" if "miou" in row.get("summary", {})
                   else next(iter(row.get("summary", {"error": 0})), "error"))
            val = row.get("summary", {}).get(key, row.get("error"))
            print(f"[{i}/{total}] {family} seed {seed}: {key}={val} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    print(f"sweep complete -> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
