#!/bin/sh
# Distribution-shift arms (VERDICT #6), run concurrently with queue3's
# training phases: eval-only, models fixed, one-knob-shifted test tiles.
set -x
cd /root/repo
R=/tmp/r4
S2=$R/sw256
for s in noise terrain density; do
  python benchmarks/quality_sweep.py \
    --data $R/p256_$s --out benchmarks/results_shift_${s}_r4.jsonl \
    --families attention --seeds 0,1,2 --eval_only --scratch $S2
  python benchmarks/quality_sweep.py \
    --data $R/p256g_$s --out benchmarks/results_shift_${s}_r4.jsonl \
    --families attention@geom --seeds 0,1,2 --eval_only --scratch $S2
done
echo "SHIFT_DONE" >> $R/queue.status
