#!/bin/bash
# Legs-only re-run of run_r5_1200k.sh (fixture already generated).
# STRICTLY SEQUENTIAL, quiet session: the first attempt's 8-core leg was
# contaminated by a concurrent pytest run and was killed + discarded.
cd /root/repo
LOG=BENCH/raw_scale_r5_1200k.jsonl
: > "$LOG"
export SPARK_GRAFT_BANDS2_MIN=1000000
for leg in "0-7 8" "0-1 2"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"1200k_${2}cores_2band\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_1200000 "$2" 2>/dev/null \
    | grep '^{' >> "$LOG"
done
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"1200k_planted_2band\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_1200000 2>/dev/null \
  | grep '^{' >> "$LOG"
echo ALLDONE
