#!/bin/sh
# Round-3 HARD synthetic benchmark dataset (VERDICT r2 #1).
#
# 40 tiles x 3 windows of ~12k points: hard scenes (class imbalance, building/
# pole confusers, lines-through-canopy, density gradients, dropout holes, sensor
# noise), 12 m of terrain relief under everything (the HAG stage has real work),
# lognormal per-window point counts (arbitrary-scale realism), 25 % landscape
# windows (classification negatives). Preprocessed at the round-2 parity-protocol
# geometry (n_points 256, max_windows 5, .pt artifacts) so the reference torch
# trainer reads the exact same bytes (benchmarks/parity/ref_train.py).
#
# Usage: sh benchmarks/make_hard_dataset.sh [OUT_DIR] [geom]
#   (default /tmp/hard_r3; pass 'geom' as the 2nd arg to append the offline
#    eigenfeature columns — preproc/geomfeat.py — for '@geom' sweep arms;
#    the first 13 columns and the splits stay byte-identical either way)
set -e
OUT="${1:-/tmp/hard_r3}"
GEOM=""
[ "$2" = "geom" ] && GEOM="--geom_features"
export AMPNET_PLATFORM=cpu
python -m ampnet_tpu synth \
  --out_path "$OUT/las" --n_tiles 40 --windows_per_tile 3 \
  --points_per_window 12000 --window_size 100 \
  --scene hard --terrain_relief 12 --point_jitter 0.45 \
  --landscape_fraction 0.25 --seed 7
python -m ampnet_tpu preprocess \
  --in_path "$OUT/las" --out_path "$OUT/proc" \
  --n_points 256 --max_windows 5 --min_points 512 \
  --artifact_format pt --seed 7 $GEOM
echo "hard benchmark dataset in $OUT/proc"
