#!/usr/bin/env python
"""Round-5 full-geometry evaluation bundle — ONE process, strict order.

Runs every full-geometry (2048 pts x 9 windows) evaluation VERDICT r4 asks
for (#4 best-config composition, #7 overlap-vote + boundary attribution) in a
single process so the relay compile storms amortize (CLAUDE.md: the FIRST
evaluate_dataset with a new chunk shape pays ~20 min of compiles; warm evals
are ~3 min — never split these across processes).

Arms (appended to benchmarks/results_fullgeo_evals_r5.jsonl, resumable):
  votes3_geom_s{0,1,2}   attention@geom --tile_votes 3 (s0 also --analysis)
  single_geom_s0         attention@geom single-pass --analysis (paired anatomy)
  ens3_tta4_votes2       geom ensemble-of-3 x tta4 x votes2 (best config)
  votes3_plain_s{0,1,2}  plain attention --tile_votes 3 (lowest priority, last)

Checkpoints: the round-4 full-geometry sweep scratch (/tmp/r4/sw_fg).
Reference anchor for the protocol: the reference evaluates at batch-1 full
clouds with in-situ tiling (test_pointnet_att_segmen.py:140-177); this bundle
uses the same tiled evaluator as every BASELINE.md table (max_clusters 32).
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
DATA_P = os.environ.get("R5_FG_DATA_PLAIN", "/tmp/r4/p2048w9")
OUT = os.path.join(REPO, "benchmarks", "results_fullgeo_evals_r5.jsonl")
EV = "/tmp/r5/ev"


def ckpt(name, seed, arch="attention"):
    return os.path.join(SW, f"{name}_s{seed}", "checkpoints",
                        f"{arch}_segmentation_best")


def targs(model_checkpoint, data, out, **kw):
    d = dict(dataset_path=data, model_checkpoint=model_checkpoint,
             path_list_files=data, out_path=out, arch="attention",
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
        if a.analysis:
            # durable provenance (VERDICT r4 #6): copy the analysis artifact
            # out of /tmp into the committed benchmarks tree
            dst = os.path.join(REPO, "benchmarks", "analysis_fg_r5")
            os.makedirs(dst, exist_ok=True)
            src = os.path.join(a.out_path, "analysis.json")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(dst, f"{tag}_analysis.json"))
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

    # 1. overlap-vote at full geometry, geom family (VERDICT #7); s0 carries
    #    the boundary-attribution analysis
    for s in (0, 1, 2):
        run(f"votes3_geom_s{s}",
            targs(ckpt("attention_geom", s), DATA_G, f"{EV}/votes_g{s}",
                  tile_votes=3, analysis=(s == 0)), done)
    # 2. paired single-pass anatomy for the votes mechanism claim
    run("single_geom_s0",
        targs(ckpt("attention_geom", 0), DATA_G, f"{EV}/single_g0",
              analysis=True), done)
    # 3. best-config composition (VERDICT #4): geom ens3 x tta4 x votes2
    ens3 = ",".join(ckpt("attention_geom", s) for s in (0, 1, 2))
    run("ens3_tta4_votes2",
        targs(ens3, DATA_G, f"{EV}/ens3_t4_v2", tta=4, tile_votes=2), done)
    # durable CSV for the best-config row
    src = f"{EV}/ens3_t4_v2/IoU-results.csv"
    if os.path.exists(src):
        shutil.copy(src, os.path.join(REPO, "benchmarks", "ens_fg_best_r5.csv"))
    # 3b. GRU@geom composition — round-5 measured gru@geom as the strongest
    #     full-geometry single model (.8235±.0017, results_fullgeo_r5.jsonl),
    #     so its ens3 x tta4 x votes2 is the candidate headline row
    gens3 = ",".join(ckpt("gru_geom", s, arch="gru") for s in (0, 1, 2))
    run("gru_ens3_tta4_votes2",
        targs(gens3, DATA_G, f"{EV}/gens3_t4_v2", tta=4, tile_votes=2), done)
    src = f"{EV}/gens3_t4_v2/IoU-results.csv"
    if os.path.exists(src):
        shutil.copy(src, os.path.join(REPO, "benchmarks",
                                      "ens_fg_gru_best_r5.csv"))
    # 4. plain-family votes at full geometry (lowest priority — cuttable)
    for s in (0, 1, 2):
        run(f"votes3_plain_s{s}",
            targs(ckpt("attention", s), DATA_P, f"{EV}/votes_p{s}",
                  tile_votes=3), done)
    print("fullgeo eval bundle complete", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
