#!/bin/bash
# Round-5 quiet-session batch 1, STRICTLY SEQUENTIAL (scaling-measurement
# discipline: nothing else runs concurrently; pairs is DRAM-bandwidth-bound).
cd /root/repo
LOG=BENCH/raw_scale_r5_600k.jsonl
: > "$LOG"
for leg in "0-7 8" "0-1 2"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"600k_${2}cores\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_600000 "$2" 2>/dev/null \
    | grep '^{' >> "$LOG"
done
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"600k_planted\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_600000 2>/dev/null \
  | grep '^{' >> "$LOG"

DLOG=BENCH/raw_scale_r5_docs.jsonl
: > "$DLOG"
python bench.py --gen-doc-fixture data/docs_scaling_300000 300000 2>/dev/null
python bench.py --gen-doc-fixture data/docs_scaling_600000 600000 2>/dev/null
for leg in "0-7 8 300000" "0-7 8 600000" "0-1 2 600000"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"docs_${3}_${2}cores\", \"start\": \"$(date -Is)\"}" >> "$DLOG"
  taskset -c "$1" python bench.py --doc-scale-worker "data/docs_scaling_$3" "$2" 2>/dev/null \
    | grep '^{' >> "$DLOG"
done
echo ALLDONE
