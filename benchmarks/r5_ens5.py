#!/usr/bin/env python
"""Round-5 ensemble-scaling arm at full geometry — GRU@geom ens5.

Round-5 measured GRU@geom ens3 x tta4 x votes2 = mIoU .8366 / tower .643 as
the best configuration at the reference's production geometry (2048 pts x 9
windows, `pointNet/collate_fns.py:17-18`). The round-3 ensemble-count study
(256-pt proxy) found member QUALITY, not count, sets the ensemble — but its
5->7->10 decline added strictly weaker members; 3->5 with equal-quality seeds
is untested at full geometry. This arm trains gru@geom seeds 3,4 (the
quality_sweep does that, appending their single-model rows to
results_fullgeo_r5.jsonl) and then scores:

  gru_ens5            single-pass (ensemble-scaling datum vs ens3 .8252-class)
  gru_ens5_tta4_votes2  the headline protocol at 5 members

Appends to benchmarks/results_fullgeo_evals_r5.jsonl (resumable, same row
schema as r5_fullgeo_evals.py); durable CSV for the composed row.
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

SW = os.environ.get("R5_FG_SCRATCH", "/tmp/r4/sw_fg")
DATA_G = os.environ.get("R5_FG_DATA_GEOM", "/tmp/r4/p2048w9g")
OUT = os.path.join(REPO, "benchmarks", "results_fullgeo_evals_r5.jsonl")
EV = "/tmp/r5/ev5"


def ckpt(seed):
    return os.path.join(SW, f"gru_geom_s{seed}", "checkpoints",
                        "gru_segmentation_best")


def targs(model_checkpoint, out, **kw):
    d = dict(dataset_path=DATA_G, model_checkpoint=model_checkpoint,
             path_list_files=DATA_G, out_path=out, arch="gru",
             task="segmentation", max_clusters=32, plot=False, backend="xla",
             tiler="balanced", transfer_dtype=None, tta=1, tile_votes=1,
             analysis=False)
    d.update(kw)
    return SimpleNamespace(**d)


def run(tag, a, done):
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
    missing = [s for s in range(5) if not os.path.exists(ckpt(s))]
    if missing:
        print(f"missing gru@geom checkpoints for seeds {missing}; train them "
              f"first (quality_sweep --families gru@geom --seeds ...)",
              file=sys.stderr)
        return 1

    ens5 = ",".join(ckpt(s) for s in range(5))
    run("gru_ens5", targs(ens5, f"{EV}/gens5"), done)
    run("gru_ens5_tta4_votes2",
        targs(ens5, f"{EV}/gens5_t4_v2", tta=4, tile_votes=2), done)
    src = f"{EV}/gens5_t4_v2/IoU-results.csv"
    if os.path.exists(src):
        shutil.copy(src, os.path.join(REPO, "benchmarks",
                                      "ens_fg_gru_ens5_r5.csv"))
    print("ens5 arm complete", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
