#!/bin/sh
# Round-5 TPU queue #4 — waits for queue3, then:
#  10. re-fill the geommed terrain shift seed 0 (transient relay-compile
#      failure in queue2's pass; quality_sweep resumes past non-error rows).
#  11. attention@geommed at FULL geometry (2048x9), 3 seeds — paired against
#      the r4 abs-radius rows .8136/.8172/.8169 in results_fullgeo_r4.jsonl.
#  12. geommed + mixed-family composition evals (r5_geommed_fg_evals.py):
#      gm votes3, gm ens3 x tta4 x votes2, cross-family 6-member ensemble.
set -x
cd /root/repo
R=/tmp/r5
while ! grep -q "R5: queue3 COMPLETE" $R/queue.status 2>/dev/null; do sleep 60; done

python benchmarks/quality_sweep.py \
  --data $R/p256gm_terrain --out benchmarks/results_geommed_shift_terrain_r5.jsonl \
  --families attention@geommed --seeds 0 --eval_only --scratch $R/sw_gm \
  >> $R/queue4.log 2>&1 || true
echo "R5: geommed terrain refill done" >> $R/queue.status

python benchmarks/quality_sweep.py \
  --data $R/p2048w9gm --out benchmarks/results_geommed_fg_r5.jsonl \
  --families attention@geommed --seeds 0,1,2 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $R/sw_gmfg \
  >> $R/queue4.log 2>&1 || true
echo "R5: geommed fullgeo train done" >> $R/queue.status

python benchmarks/r5_geommed_fg_evals.py >> $R/queue4.log 2>&1 || true
echo "R5: geommed fullgeo evals done" >> $R/queue.status
echo "R5: queue4 COMPLETE" >> $R/queue.status
