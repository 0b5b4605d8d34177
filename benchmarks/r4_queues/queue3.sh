#!/bin/sh
# Round-4 FINAL TPU queue — strict priority order for the remaining wall
# clock (queue1/2 replanned at T-2.5h). Each phase appends to queue.status.
set -x
cd /root/repo
R=/tmp/r4
S2=$R/sw256
GEO5=$S2/attention_geom_s0/checkpoints/attention_segmentation_best,$S2/attention_geom_s1/checkpoints/attention_segmentation_best,$S2/attention_geom_s2/checkpoints/attention_segmentation_best,$S2/attention_geom_s3/checkpoints/attention_segmentation_best,$S2/attention_geom_s4/checkpoints/attention_segmentation_best

# 1. geom at the reference's production geometry (VERDICT #1 core question)
python benchmarks/quality_sweep.py \
  --data $R/p2048w9g --out benchmarks/results_fullgeo_r4.jsonl \
  --families attention@geom --seeds 0,1,2 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $R/sw_fg
echo "Q3: fullgeo geom done" >> $R/queue.status

# 2. KD: geom-ens5 teacher -> plain 9-col student (VERDICT #3)
python benchmarks/quality_sweep.py \
  --data $R/p256g --out benchmarks/results_kd_r4.jsonl \
  --families attention@kd --seeds 0,1,2 --epochs 80 --scratch $R/sw_kd \
  --distill_from "$GEO5" --distill_alpha 0.5 --distill_temp 2.0
echo "Q3: kd done" >> $R/queue.status

# 3. overlap-vote arms (VERDICT #5): 3 paired seeds, plain + geom
python benchmarks/quality_sweep.py \
  --data $R/p256 --out benchmarks/results_votes_r4.jsonl \
  --families attention --seeds 0,1,2 --eval_only --tile_votes 3 --scratch $S2
python benchmarks/quality_sweep.py \
  --data $R/p256g --out benchmarks/results_votes_r4.jsonl \
  --families attention@geom --seeds 0,1,2 --eval_only --tile_votes 3 --scratch $S2
echo "Q3: votes done" >> $R/queue.status

# 4. distribution-shift arms (VERDICT #6): models fixed, shifted test tiles
for s in noise terrain density; do
  python benchmarks/quality_sweep.py \
    --data $R/p256_$s --out benchmarks/results_shift_${s}_r4.jsonl \
    --families attention --seeds 0,1,2 --eval_only --scratch $S2
  python benchmarks/quality_sweep.py \
    --data $R/p256g_$s --out benchmarks/results_shift_${s}_r4.jsonl \
    --families attention@geom --seeds 0,1,2 --eval_only --scratch $S2
done
echo "Q3: shift done" >> $R/queue.status

# 5. GRU at full geometry, 1 seed each (family ordering signal)
python benchmarks/quality_sweep.py \
  --data $R/p2048w9 --out benchmarks/results_fullgeo_r4.jsonl \
  --families gru --seeds 0 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $R/sw_fg
python benchmarks/quality_sweep.py \
  --data $R/p2048w9g --out benchmarks/results_fullgeo_r4.jsonl \
  --families gru@geom --seeds 0 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $R/sw_fg
echo "Q3: gru fullgeo done" >> $R/queue.status

# 6. geom serving tax decomposition (VERDICT #4 evidence)
python benchmarks/geom_tax_bench.py --clouds 8 --points 50000 --iters 5 \
  > benchmarks/results_geomtax_r4.json 2> $R/geomtax.log || true
echo "Q3: geomtax done" >> $R/queue.status

# 7. best-config composition: geom ens5 x tta4 x votes2
python -m ampnet_tpu test $R/p256g --model_checkpoint "$GEO5" \
  --path_list_files $R/p256g --out_path $R/votes_best \
  --max_clusters 32 --tta 4 --tile_votes 2 > $R/votes_best.json || true
echo "Q3: votes best done" >> $R/queue.status

# 8. serving medians, newest lever first (likely cut by round end)
OUT=benchmarks/results_serving_medians_r4.jsonl
sh benchmarks/serve_medians.sh geom_int8 $OUT 15 float16 -- \
  --model_checkpoint $S2/attention_geom_s0/checkpoints/attention_segmentation_best \
  --backend folded --tiler fast --transfer_dtype int8 --warmup 50000
sh benchmarks/serve_medians.sh geom_f16 $OUT 15 float16 -- \
  --model_checkpoint $S2/attention_geom_s0/checkpoints/attention_segmentation_best \
  --backend folded --tiler fast --transfer_dtype float16 --warmup 50000
sh benchmarks/serve_medians.sh plain_f16 $OUT 9 float16 -- \
  --model_checkpoint $S2/attention_s0/checkpoints/attention_segmentation_best \
  --backend folded --tiler fast --transfer_dtype float16 --warmup 50000
echo "Q3: serving medians done" >> $R/queue.status
echo "Q3_ALL_DONE" >> $R/queue.status
