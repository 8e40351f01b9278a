#!/bin/bash
# Resume of run_r5_postfix_600k.sh: the 8-core leg completed (189.35 s,
# recorded in raw_scale_r5_600k_postfix.jsonl) but the host restarted
# during the 2-core leg. This script APPENDS the remaining legs
# (2-core + planted check) under the same measurement discipline:
# pinned cores, fresh JVM, /dev/shm scratch, quiet host, sequential.
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_600k_postfix.jsonl
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"600k_2cores_postfix\", \"start\": \"$(date -Is)\", \"note\": \"resumed after host restart\"}" >> "$LOG"
taskset -c 0-1 python bench.py --scale-worker data/scaling_600000 2 2>/dev/null \
  | grep '^{' >> "$LOG"
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"600k_planted_postfix\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_600000 2>/dev/null \
  | grep '^{' >> "$LOG"
echo ALLDONE600RESUME
