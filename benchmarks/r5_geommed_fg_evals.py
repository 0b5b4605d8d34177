#!/usr/bin/env python
"""Round-5 geommed + mixed-family full-geometry evaluation bundle.

Follow-up to benchmarks/r5_fullgeo_evals.py (same one-process amortization
discipline — CLAUDE.md: first evaluate_dataset with a new chunk shape pays a
relay compile storm, warm evals are minutes). Arms, appended to
benchmarks/results_geommed_fg_evals_r5.jsonl (resumable by arm tag):

  gm_votes3_s0           attention@geommed s0 --tile_votes 3 (lever carries?)
  gm_ens3_tta4_votes2    geommed ens3 x tta4 x votes2 (headline candidate vs
                         the r5 geom-abs best config .8316)
  mixed_ens6_tta4_votes2 3x attention@geom + 3x gru@geom (round-4 sw_fg
                         checkpoints, abs-radius data) through the
                         cross-family EnsembleInferencer — host-side
                         probability averaging over structurally different
                         members (cli/main.py _restore_model grouping).

Reference anchor: the reference evaluates ONE .pth at batch-1 with in-situ
tiling (test_pointnet_att_segmen.py:87-94,140-177); composition across
checkpoints/families has no reference counterpart.
"""

import contextlib
import io
import json
import os
import shutil
import sys
import time
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SW_GM = os.environ.get("R5_GMFG_SCRATCH", "/tmp/r5/sw_gmfg")
SW_R4 = os.environ.get("R5_FG_SCRATCH", "/tmp/r4/sw_fg")
DATA_GM = os.environ.get("R5_GMFG_DATA", "/tmp/r5/p2048w9gm")
DATA_G = os.environ.get("R5_FG_DATA_GEOM", "/tmp/r4/p2048w9g")
OUT = os.path.join(REPO, "benchmarks", "results_geommed_fg_evals_r5.jsonl")
EV = "/tmp/r5/ev_gm"


def ckpt(scratch, name, seed, arch="attention"):
    return os.path.join(scratch, f"{name}_s{seed}", "checkpoints",
                        f"{arch}_segmentation_best")


def targs(model_checkpoint, data, out, **kw):
    d = dict(dataset_path=data, model_checkpoint=model_checkpoint,
             path_list_files=data, out_path=out, arch="attention",
             task="segmentation", max_clusters=32, plot=False, backend="xla",
             tiler="balanced", transfer_dtype=None, tta=1, tile_votes=1,
             analysis=False)
    d.update(kw)
    return SimpleNamespace(**d)


def run(tag, a, done, csv_name=None):
    if tag in done:
        print(f"{tag}: already done", file=sys.stderr, flush=True)
        return
    from ampnet_tpu.cli.main import cmd_test

    os.makedirs(a.out_path, exist_ok=True)
    t0 = time.time()
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            rc = cmd_test(a)
    except Exception as e:
        rc, buf = 1, io.StringIO(f'{{"error": "{type(e).__name__}"}}')
        print(f"{tag}: {type(e).__name__}: {e}", file=sys.stderr, flush=True)
    row = {"arm": tag, "eval_s": round(time.time() - t0, 1),
           "tta": a.tta, "tile_votes": a.tile_votes}
    if rc != 0:
        row["error"] = f"rc={rc}"
    else:
        txt = buf.getvalue()
        row["summary"] = json.loads(txt[txt.find("{"):])
        if csv_name:
            src = os.path.join(a.out_path, "IoU-results.csv")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(REPO, "benchmarks", csv_name))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(f"{tag}: miou={row.get('summary', {}).get('miou')} "
          f"({row['eval_s']}s)", file=sys.stderr, flush=True)


def main():
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    if "error" not in r:
                        done.add(r["arm"])
                except json.JSONDecodeError:
                    pass
    os.makedirs(EV, exist_ok=True)

    # 1. does the overlap-vote lever carry to geommed members? (cheap, warm
    #    after the storm this arm pays for the process)
    run("gm_votes3_s0",
        targs(ckpt(SW_GM, "attention_geommed", 0), DATA_GM,
              f"{EV}/votes_gm0", tile_votes=3), done)
    # 2. geommed best-config composition — headline candidate
    ens3 = ",".join(ckpt(SW_GM, "attention_geommed", s) for s in (0, 1, 2))
    run("gm_ens3_tta4_votes2",
        targs(ens3, DATA_GM, f"{EV}/gm_ens3_t4_v2", tta=4, tile_votes=2),
        done, csv_name="ens_fg_gm_best_r5.csv")
    # 3. cross-family 6-member ensemble (abs-radius members, both archs)
    mixed = ",".join(
        [ckpt(SW_R4, "attention_geom", s) for s in (0, 1, 2)]
        + [ckpt(SW_R4, "gru_geom", s, arch="gru") for s in (0, 1, 2)])
    run("mixed_ens6_tta4_votes2",
        targs(mixed, DATA_G, f"{EV}/mixed6_t4_v2", tta=4, tile_votes=2),
        done, csv_name="ens_fg_mixed6_r5.csv")
    print("geommed fullgeo eval bundle complete", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
