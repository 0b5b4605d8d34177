#!/bin/sh
# Round-3 boundary-aware lever protocol (BASELINE.md "Boundary-aware levers").
#
# Measures, at 5 paired seeds on the hard benchmark, the two levers the error
# anatomy (`ampnet test --analysis`) motivated:
#   @edge — in-window DGCNN-style kNN edge aggregation (train --local_agg edge)
#   @geom — offline full-density covariance eigenfeatures (--geom_features)
# plus re-run plain baselines on the SAME dataset build so per-seed deltas are
# paired, then the composition arms on the @geom checkpoints: ensemble-of-5
# (comma-separated --model_checkpoint) alone and x --tta 4, and per-seed TTA4
# re-scores (quality_sweep --eval_only --tta 4).
#
# Expects the two dataset builds from make_hard_dataset.sh:
#   sh benchmarks/make_hard_dataset.sh /tmp/hard_r3
#   sh benchmarks/make_hard_dataset.sh /tmp/hard_r3_geom geom
# Runs on the real TPU (do NOT set AMPNET_PLATFORM); sequential — one chip.
# Measured round-3 results: geom +11.3/+10.9 mIoU (attention/GRU, positive
# every seed), edge -3.4/-1.1; geom x ens5 x tta4 = mIoU 0.820 either family.
set -ex
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/qsweep_levers}"
mkdir -p "$OUT"

python benchmarks/quality_sweep.py \
  --data /tmp/hard_r3/proc --out "$OUT/edge.jsonl" \
  --families attention,gru,attention@edge,gru@edge --seeds 0,1,2,3,4 \
  --epochs 80 --scratch "$OUT/edge_scratch"
python benchmarks/quality_sweep.py \
  --data /tmp/hard_r3_geom/proc --out "$OUT/geom.jsonl" \
  --families attention@geom,gru@geom --seeds 0,1,2,3,4 \
  --epochs 80 --scratch "$OUT/geom_scratch"

S="$OUT/geom_scratch"
ATT=$S/attention_geom_s0/checkpoints/attention_segmentation_best,$S/attention_geom_s1/checkpoints/attention_segmentation_best,$S/attention_geom_s2/checkpoints/attention_segmentation_best,$S/attention_geom_s3/checkpoints/attention_segmentation_best,$S/attention_geom_s4/checkpoints/attention_segmentation_best
GRU=$S/gru_geom_s0/checkpoints/gru_segmentation_best,$S/gru_geom_s1/checkpoints/gru_segmentation_best,$S/gru_geom_s2/checkpoints/gru_segmentation_best,$S/gru_geom_s3/checkpoints/gru_segmentation_best,$S/gru_geom_s4/checkpoints/gru_segmentation_best
for arm in att_ens5:1 att_ens5_tta4:4 gru_ens5:1 gru_ens5_tta4:4; do
  name=${arm%:*}; tta=${arm#*:}
  case $name in att*) CK=$ATT;; *) CK=$GRU;; esac
  python -m ampnet_tpu test /tmp/hard_r3_geom/proc --model_checkpoint "$CK" \
    --path_list_files /tmp/hard_r3_geom/proc --out_path "$OUT/ens_$name" \
    --max_clusters 32 --tta $tta > "$OUT/ens_$name.json"
done

python benchmarks/quality_sweep.py \
  --data /tmp/hard_r3_geom/proc --out "$OUT/geom_tta.jsonl" \
  --families attention@geom,gru@geom --seeds 0,1,2,3,4 \
  --eval_only --tta 4 --scratch "$S"

# whole-cloud families with the geom columns (completes the lever table)
python benchmarks/quality_sweep.py \
  --data /tmp/hard_r3_geom/proc --out "$OUT/wc_geom.jsonl" \
  --families classic@geom,pointnet2@geom --seeds 0,1,2,3,4 \
  --epochs 80 --scratch "$OUT/wc_scratch"
echo LEVER_SWEEP_DONE
