#!/bin/bash
# 4-core outlier re-runs (discipline: re-run any leg deviating >10% from the
# session's C/L fit of adjacent legs; first 4c leg measured 561 s vs 442
# predicted with an anomalous reps stage).
cd /root/repo
LOG=BENCH/raw_scale_r5_600k.jsonl
for i in 1 2; do
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"600k_4cores_rerun$i\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c 0-3 python bench.py --scale-worker data/scaling_600000 4 2>/dev/null \
    | grep '^{' >> "$LOG"
done
rm -rf /dev/shm/dupion_scale_*
echo RERUNDONE
