#!/bin/sh
# Round-5 TPU queue #1 — strict priority order per VERDICT r4 "Next round":
#   1. geom_tax_bench (compile storm — must never run in an endgame window)
#   2. serving medians (plain / ens5 / geom-f16 / geom-int8, 3 reps each)
#   3. full-geometry table completion (gru s1,s2 + gru@geom s0-2)
#   4. int8 wire quality cost (3 seeds, paired vs r4 geom single-pass rows)
#   5. full-geometry eval bundle (votes3 + analysis + ens3 x tta4 x votes2)
# Every phase appends to /tmp/r5/queue.status; kill the queue SHELL first
# when re-planning (CLAUDE.md queue discipline).
set -x
cd /root/repo
R=/tmp/r5
S4=/tmp/r4/sw256
FG=/tmp/r4/sw_fg
mkdir -p $R

# 1. geom serving-tax decomposition (VERDICT #3)
python benchmarks/geom_tax_bench.py --clouds 8 --points 50000 --iters 5 \
  > benchmarks/results_geomtax_r5.json 2> $R/geomtax.log || true
echo "R5: geomtax done" >> $R/queue.status

# 2. serving medians (VERDICT #2) — same scenario as every docs/design.md
# serving number: 32 x 50k-pt clouds, binary f16 HTTP wire, fast tiler,
# warm micro-batch shapes; 3 client reps per arm, median is the statistic.
B=checkpoints/attention_segmentation_best
PLAIN=$S4/attention_s0/$B
ENS5=$S4/attention_s0/$B,$S4/attention_s1/$B,$S4/attention_s2/$B,$S4/attention_s3/$B,$S4/attention_s4/$B
GEOM=$S4/attention_geom_s0/$B
M=benchmarks/results_serve_medians_r5.jsonl
W="--tiler fast --warmup 50000 --warmup_batches 1,2,4,8,16"
sh benchmarks/serve_medians.sh plain $M 9 float16 -- \
  --model_checkpoint $PLAIN $W
sh benchmarks/serve_medians.sh ens5 $M 9 float16 -- \
  --model_checkpoint $ENS5 $W
sh benchmarks/serve_medians.sh geom_f16 $M 15 float16 -- \
  --model_checkpoint $GEOM --transfer_dtype float16 $W
sh benchmarks/serve_medians.sh geom_int8 $M 15 float16 -- \
  --model_checkpoint $GEOM --transfer_dtype int8 $W
echo "R5: serve medians done" >> $R/queue.status

# 3. full-geometry table completion (VERDICT #4): GRU plain n=3, GRU@geom n=3
python benchmarks/quality_sweep.py \
  --data /tmp/r4/p2048w9 --out benchmarks/results_fullgeo_r5.jsonl \
  --families gru --seeds 1,2 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $FG
python benchmarks/quality_sweep.py \
  --data /tmp/r4/p2048w9g --out benchmarks/results_fullgeo_r5.jsonl \
  --families gru@geom --seeds 0,1,2 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $FG
echo "R5: fullgeo gru done" >> $R/queue.status

# 4. int8 wire Delta-mIoU (VERDICT #3): same checkpoints + evaluator as the
# r4 geom single-pass rows -> paired per-seed deltas
python benchmarks/quality_sweep.py \
  --data /tmp/r4/p256g --out benchmarks/results_int8_r5.jsonl \
  --families attention@geom --seeds 0,1,2 --eval_only \
  --transfer_dtype int8 --scratch $S4
echo "R5: int8 done" >> $R/queue.status

# 5. full-geometry eval bundle (VERDICT #4 best config + #7 votes/analysis)
python benchmarks/r5_fullgeo_evals.py > $R/fullgeo_evals.log 2>&1 || true
echo "R5: fullgeo evals done" >> $R/queue.status

echo "R5: queue1 COMPLETE" >> $R/queue.status
