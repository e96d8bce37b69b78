#!/bin/bash
# Interleaved bench A/B: base (dd7dbc9) vs HEAD, 3 rounds each, alternating.
OUT=/tmp/ab_r17_results.jsonl
rm -f $OUT
for i in 1 2 3; do
  for side in base head; do
    if [ "$side" = base ]; then DIR=/tmp/base_dd7dbc9; else DIR=/root/repo; fi
    echo "=== round $i side $side $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >> $OUT
    (cd $DIR && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 timeout 900 python bench.py 2>/dev/null | tail -1) >> $OUT
  done
done
echo DONE >> $OUT
