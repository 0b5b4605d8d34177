#!/bin/sh
# Round-4 TPU job queue (VERDICT r3 #1 #6 + retrains for #3/#5).
# Sequential — one chip. Resumable: quality_sweep skips (family,seed) rows
# already in each --out. Run detached: setsid sh /tmp/r4/queue.sh
set -x
cd /root/repo
R=/tmp/r4

# ---- phase 0 (CPU): full-geometry dataset with 9 REAL windows per cloud ----
# Same hard-generator params/seed as round 3 (make_hard_dataset.sh) except
# windows_per_tile 3->9: the reference's production geometry is 2048 pts x <=9
# windows (ref collate_fns.py:17-18, README.md:40-46); 9-window tiles avoid
# padding 3 real windows to 9.
if [ ! -d $R/p2048w9 ]; then
  AMPNET_PLATFORM=cpu python -m ampnet_tpu synth \
    --out_path $R/las9 --n_tiles 40 --windows_per_tile 9 \
    --points_per_window 12000 --window_size 100 \
    --scene hard --terrain_relief 12 --point_jitter 0.45 \
    --landscape_fraction 0.25 --seed 7
  AMPNET_PLATFORM=cpu python -m ampnet_tpu preprocess \
    --in_path $R/las9 --out_path $R/p2048w9 \
    --n_points 2048 --max_windows 9 --min_points 512 \
    --artifact_format pt --seed 7
  AMPNET_PLATFORM=cpu python -m ampnet_tpu preprocess \
    --in_path $R/las9 --out_path $R/p2048w9g \
    --n_points 2048 --max_windows 9 --min_points 512 \
    --artifact_format pt --seed 7 --geom_features
fi
echo "QUEUE: datasets ready" >> $R/queue.status

# ---- phase 1 (TPU): canary — one full-geometry arm to validate + time ----
python benchmarks/quality_sweep.py \
  --data $R/p2048w9 --out benchmarks/results_fullgeo_r4.jsonl \
  --families attention --seeds 0 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $R/sw_fg
echo "QUEUE: canary done" >> $R/queue.status

# ---- phase 2 (TPU): 256-geometry retrains (round-3 ckpts were wiped) ----
# 5 seeds plain + geom attention: teacher pool for KD, members for ens5,
# subjects for the shift + overlap-vote arms.
python benchmarks/quality_sweep.py \
  --data $R/p256 --out benchmarks/results_p256_r4.jsonl \
  --families attention --seeds 0,1,2,3,4 --epochs 80 --scratch $R/sw256
python benchmarks/quality_sweep.py \
  --data $R/p256g --out benchmarks/results_p256_r4.jsonl \
  --families attention@geom --seeds 0,1,2,3,4 --epochs 80 --scratch $R/sw256
echo "QUEUE: p256 retrains done" >> $R/queue.status

# ---- phase 3 (TPU): full-geometry sweep, plain + geom, 3 seeds ----
python benchmarks/quality_sweep.py \
  --data $R/p2048w9 --out benchmarks/results_fullgeo_r4.jsonl \
  --families attention,gru --seeds 0,1,2 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $R/sw_fg
python benchmarks/quality_sweep.py \
  --data $R/p2048w9g --out benchmarks/results_fullgeo_r4.jsonl \
  --families attention@geom,gru@geom --seeds 0,1,2 --epochs 80 --batch_size 8 \
  --n_points 2048 --n_windows 9 --scratch $R/sw_fg
echo "QUEUE: fullgeo sweep done" >> $R/queue.status

# ---- phase 4 (TPU): full-geometry best-config (ens3 x tta4) + per-seed tta4 ----
S=$R/sw_fg
ATT=$S/attention_geom_s0/checkpoints/attention_segmentation_best,$S/attention_geom_s1/checkpoints/attention_segmentation_best,$S/attention_geom_s2/checkpoints/attention_segmentation_best
GRU=$S/gru_geom_s0/checkpoints/gru_segmentation_best,$S/gru_geom_s1/checkpoints/gru_segmentation_best,$S/gru_geom_s2/checkpoints/gru_segmentation_best
for arm in att_ens3:1 att_ens3_tta4:4 gru_ens3:1 gru_ens3_tta4:4; do
  name=${arm%:*}; tta=${arm#*:}
  case $name in att*) CK=$ATT;; *) CK=$GRU;; esac
  python -m ampnet_tpu test $R/p2048w9g --model_checkpoint "$CK" \
    --path_list_files $R/p2048w9g --out_path $R/ens_fg_$name \
    --max_clusters 32 --tta $tta > $R/ens_fg_$name.json || true
done
python benchmarks/quality_sweep.py \
  --data $R/p2048w9g --out benchmarks/results_fullgeo_tta_r4.jsonl \
  --families attention@geom,gru@geom --seeds 0,1,2 \
  --eval_only --tta 4 --scratch $S
echo "QUEUE: fullgeo ens/tta done" >> $R/queue.status

# ---- phase 5 (TPU): distribution-shift arms (VERDICT #6) ----
# Trained 256-geometry models held fixed; evaluate on one-knob-shifted test
# generators (noise x2 / terrain x2 / density /2), plain vs geom vs ens5xtta4.
for s in noise terrain density; do
  python benchmarks/quality_sweep.py \
    --data $R/p256_$s --out benchmarks/results_shift_${s}_r4.jsonl \
    --families attention --seeds 0,1,2,3,4 --eval_only --scratch $R/sw256
  python benchmarks/quality_sweep.py \
    --data $R/p256g_$s --out benchmarks/results_shift_${s}_r4.jsonl \
    --families attention@geom --seeds 0,1,2,3,4 --eval_only --scratch $R/sw256
done
S2=$R/sw256
ATT5=$S2/attention_s0/checkpoints/attention_segmentation_best,$S2/attention_s1/checkpoints/attention_segmentation_best,$S2/attention_s2/checkpoints/attention_segmentation_best,$S2/attention_s3/checkpoints/attention_segmentation_best,$S2/attention_s4/checkpoints/attention_segmentation_best
GEO5=$S2/attention_geom_s0/checkpoints/attention_segmentation_best,$S2/attention_geom_s1/checkpoints/attention_segmentation_best,$S2/attention_geom_s2/checkpoints/attention_segmentation_best,$S2/attention_geom_s3/checkpoints/attention_segmentation_best,$S2/attention_geom_s4/checkpoints/attention_segmentation_best
for s in base noise terrain density; do
  case $s in base) DP=$R/p256; DG=$R/p256g;; *) DP=$R/p256_$s; DG=$R/p256g_$s;; esac
  python -m ampnet_tpu test $DP --model_checkpoint "$ATT5" \
    --path_list_files $DP --out_path $R/shift_${s}_plain_ens \
    --max_clusters 32 --tta 4 > $R/shift_${s}_plain_ens.json || true
  python -m ampnet_tpu test $DG --model_checkpoint "$GEO5" \
    --path_list_files $DG --out_path $R/shift_${s}_geom_ens \
    --max_clusters 32 --tta 4 > $R/shift_${s}_geom_ens.json || true
done
echo "QUEUE: shift arms done" >> $R/queue.status
echo "QUEUE_ALL_DONE" >> $R/queue.status
