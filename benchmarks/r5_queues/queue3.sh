#!/bin/sh
# Round-5 TPU queue #3 (endgame) — waits for queue2, then:
#   8. re-run the fullgeo eval bundle: picks up the GRU@geom composition arm
#      (added after queue1 launched) and any arm queue1's pass did not reach
#      (the bundle is resumable by arm tag).
#   9. bench.py preflight — confirms the driver's end-of-round run will hit
#      the persistent cache and that the reordered artifact reads correctly.
set -x
cd /root/repo
R=/tmp/r5
while ! grep -q "R5: queue2 COMPLETE" $R/queue.status 2>/dev/null; do sleep 60; done

python benchmarks/r5_fullgeo_evals.py >> $R/fullgeo_evals.log 2>&1 || true
echo "R5: fullgeo evals pass2 done" >> $R/queue.status

python bench.py > $R/bench_preflight.out 2> $R/bench_preflight.err || true
echo "R5: bench preflight done" >> $R/queue.status
echo "R5: queue3 COMPLETE" >> $R/queue.status
