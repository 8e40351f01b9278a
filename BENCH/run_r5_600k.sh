#!/bin/bash
# Round-5 quiet-session legs, STRICTLY SEQUENTIAL (scaling-measurement
# discipline: nothing else may run concurrently; pairs stage is
# DRAM-bandwidth-bound and any co-running work skews the N-vs-4N ratio).
cd /root/repo
LOG=BENCH/raw_scale_r5_600k.jsonl
: > "$LOG"
for leg in "0-7 8" "0-1 2"; do
  set -- $leg
  echo "{\"leg\": \"600k_${2}cores\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_600000 "$2" 2>/dev/null \
    | grep '^{' >> "$LOG"
done
echo "{\"leg\": \"600k_planted\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_600000 2>/dev/null \
  | grep '^{' >> "$LOG"
echo ALLDONE
