#!/bin/sh
# Round-5 TPU queue #2 — waits for queue1, then:
#   6. density-conditioned eigenfeatures (VERDICT #5): train attention@geommed
#      3 seeds on the median-normalized datasets (/tmp/r5/p256gm*, built by
#      build_gm.sh from the SAME LAS bytes as r4's p256g*), then the shift
#      evals. Success bar: density/2 degradation -4.0 -> <= -3.0 with
#      unshifted quality unchanged.
#   7. geom-token attention arm (VERDICT #8 stretch): attention@geom+attg at
#      FULL geometry, 3 seeds, paired vs r4's attention@geom rows (.8159).
#
# REPRODUCIBILITY NOTE: build_gm.sh was an uncommitted /tmp helper (lost to
# the mid-round VM restart). Its job, to recreate before re-running this
# queue: regenerate the r4 synthetic LAS tiles (`ampnet synth`, hard-profile
# seeds as in r4_queues/queue.sh), then for each shift arm run
#   ampnet preprocess --geom_features --geom_radius_norm median \
#     --out_path /tmp/r5/p256gm<arm> ...   (256-pt geometry params)
# and append "GM_DATASETS_DONE" to /tmp/r5/queue.status.
set -x
cd /root/repo
R=/tmp/r5
mkdir -p $R
while ! grep -q "R5: queue1 COMPLETE" $R/queue.status 2>/dev/null; do sleep 60; done
while ! grep -q GM_DATASETS_DONE $R/queue.status 2>/dev/null; do sleep 60; done

# 6a. geommed trainings + base eval (256-pt geometry, same protocol as the
#     r4 shift table rows)
python benchmarks/quality_sweep.py \
  --data $R/p256gm --out benchmarks/results_geommed_r5.jsonl \
  --families attention@geommed --seeds 0,1,2 --epochs 80 --scratch $R/sw_gm
echo "R5: geommed train done" >> $R/queue.status

# 6b. geommed shift evals (models fixed, shifted test tiles)
for s in density noise terrain; do
  python benchmarks/quality_sweep.py \
    --data $R/p256gm_$s --out benchmarks/results_geommed_shift_${s}_r5.jsonl \
    --families attention@geommed --seeds 0,1,2 --eval_only --scratch $R/sw_gm
done
echo "R5: geommed shifts done" >> $R/queue.status

# 7. geom-token attention at full geometry (paired vs r4 attention@geom rows)
python benchmarks/quality_sweep.py \
  --data /tmp/r4/p2048w9g --out benchmarks/results_attg_fg_r5.jsonl \
  --families attention@geom+attg --seeds 0,1,2 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $R/sw_attg
echo "R5: attg fullgeo done" >> $R/queue.status
echo "R5: queue2 COMPLETE" >> $R/queue.status
