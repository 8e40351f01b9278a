#!/bin/bash
# Truly-final-code re-run of the 600k N->4N gate legs, including the
# empty-branch elision in candidate_pairs (46a5162) and the bench warm-min
# hardening. Same measurement discipline as BENCH/SCALING_RUN.md: pinned
# cores, fresh JVM per leg, /dev/shm scratch, 128 shuffle partitions,
# strictly sequential, quiet host. Fixture pre-generated (untimed) at
# data/scaling_600000.
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_600k_final2.jsonl
: > "$LOG"
for leg in "0-7 8" "0-1 2"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"600k_${2}cores_final2\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_600000 "$2" 2>/dev/null \
    | grep '^{' >> "$LOG"
done
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"600k_planted_final2\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_600000 2>/dev/null \
  | grep '^{' >> "$LOG"
echo ALLDONE600FINAL2
