#!/bin/sh
# Round-4 follow-up TPU queue: KD geom-teacher->plain-student (VERDICT #3),
# overlap-vote arms (#5), geom serving tax (#4), serving medians (#7).
# Waits for queue.sh (QUEUE_ALL_DONE) so the chip is uncontended.
set -x
cd /root/repo
R=/tmp/r4
while ! grep -q QUEUE_ALL_DONE $R/queue.status 2>/dev/null; do sleep 60; done

S2=$R/sw256
GEO5=$S2/attention_geom_s0/checkpoints/attention_segmentation_best,$S2/attention_geom_s1/checkpoints/attention_segmentation_best,$S2/attention_geom_s2/checkpoints/attention_segmentation_best,$S2/attention_geom_s3/checkpoints/attention_segmentation_best,$S2/attention_geom_s4/checkpoints/attention_segmentation_best

# ---- KD: geom-ens5 teacher -> plain 9-col student, 3 seeds (VERDICT #3) ----
# Trains on p256g (batch carries 15 cols for the teacher; the student reads
# its 9-col prefix) and evaluates the student on the same test tiles reading
# only 9 cols — identical bytes to plain serving, zero geom serving cost.
python benchmarks/quality_sweep.py \
  --data $R/p256g --out benchmarks/results_kd_r4.jsonl \
  --families attention@kd --seeds 0,1,2 --epochs 80 --scratch $R/sw_kd \
  --distill_from "$GEO5" --distill_alpha 0.5 --distill_temp 2.0
echo "QUEUE2: kd done" >> $R/queue.status

# ---- Overlap-vote arms: re-score existing checkpoints (VERDICT #5) ----
python benchmarks/quality_sweep.py \
  --data $R/p256 --out benchmarks/results_votes_r4.jsonl \
  --families attention --seeds 0,1,2,3,4 --eval_only --tile_votes 3 \
  --scratch $R/sw256
python benchmarks/quality_sweep.py \
  --data $R/p256g --out benchmarks/results_votes_r4.jsonl \
  --families attention@geom --seeds 0,1,2,3,4 --eval_only --tile_votes 3 \
  --scratch $R/sw256
# best-config composition: geom ens5 x tta4 x votes2
python -m ampnet_tpu test $R/p256g --model_checkpoint "$GEO5" \
  --path_list_files $R/p256g --out_path $R/votes_best \
  --max_clusters 32 --tta 4 --tile_votes 2 > $R/votes_best.json || true
echo "QUEUE2: votes done" >> $R/queue.status

# ---- Geom serving tax decomposition on the real chip (VERDICT #4) ----
python benchmarks/geom_tax_bench.py --clouds 8 --points 50000 --iters 5 \
  > benchmarks/results_geomtax_r4.json 2> $R/geomtax.log || true
echo "QUEUE2: geomtax done" >> $R/queue.status

# ---- Serving medians: plain / ens5 / geom-f16 / geom-int8 (VERDICT #7) ----
ATT5=$S2/attention_s0/checkpoints/attention_segmentation_best,$S2/attention_s1/checkpoints/attention_segmentation_best,$S2/attention_s2/checkpoints/attention_segmentation_best,$S2/attention_s3/checkpoints/attention_segmentation_best,$S2/attention_s4/checkpoints/attention_segmentation_best
OUT=benchmarks/results_serving_medians_r4.jsonl
sh benchmarks/serve_medians.sh plain_f16 $OUT 9 float16 -- \
  --model_checkpoint $S2/attention_s0/checkpoints/attention_segmentation_best \
  --backend folded --tiler fast --transfer_dtype float16 --warmup 50000
sh benchmarks/serve_medians.sh ens5_f16 $OUT 9 float16 -- \
  --model_checkpoint "$ATT5" \
  --backend folded --tiler fast --transfer_dtype float16 --warmup 50000
sh benchmarks/serve_medians.sh geom_f16 $OUT 15 float16 -- \
  --model_checkpoint $S2/attention_geom_s0/checkpoints/attention_segmentation_best \
  --backend folded --tiler fast --transfer_dtype float16 --warmup 50000
sh benchmarks/serve_medians.sh geom_int8 $OUT 15 float16 -- \
  --model_checkpoint $S2/attention_geom_s0/checkpoints/attention_segmentation_best \
  --backend folded --tiler fast --transfer_dtype int8 --warmup 50000
echo "QUEUE2: serving medians done" >> $R/queue.status
echo "QUEUE2_ALL_DONE" >> $R/queue.status
