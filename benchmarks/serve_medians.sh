#!/bin/sh
# Serving-throughput medians (VERDICT r3 weak #5 / task #7): for each headline
# config, start `ampnet serve`, wait for /healthz, run serve_http_bench 3x
# against the warm server, and record every client JSON line — the summary
# statistic for docs/design.md is the MEDIAN sustained across runs, with
# best-observed as a footnote (same honesty standard as the pinned CPU
# baseline).
#
# Usage: sh benchmarks/serve_medians.sh <name> <out_jsonl> <features> \
#            <client_dtype> -- <ampnet serve args...>
set -x
NAME=$1; OUT=$2; FEATS=$3; CDTYPE=$4
shift 4
[ "$1" = "--" ] && shift
PORT=8431
python -m ampnet_tpu serve --host 127.0.0.1 --port $PORT "$@" \
  > /tmp/serve_${NAME}.log 2>&1 &
SRV=$!
echo $SRV > /tmp/serve_${NAME}.pid
# wait up to 40 min for warmup compiles through the relay (5 micro-batch-shape
# programs x 3-6 min cold each — healthz only comes up after cmd_serve warmup)
i=0
until curl -sf http://127.0.0.1:$PORT/healthz >/dev/null 2>&1; do
  i=$((i+1)); [ $i -gt 480 ] && { echo "SERVER TIMEOUT"; kill $SRV; exit 1; }
  sleep 5
done
for rep in 1 2 3; do
  row=$(python benchmarks/serve_http_bench.py --port $PORT \
        --clouds 32 --points 50000 --features $FEATS --dtype $CDTYPE \
        | tail -1)
  echo "{\"config\": \"$NAME\", \"rep\": $rep, \"result\": $row}" >> $OUT
done
kill $SRV 2>/dev/null
wait $SRV 2>/dev/null
exit 0
