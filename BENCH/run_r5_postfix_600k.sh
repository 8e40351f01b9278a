#!/bin/bash
# Post-fix (bb6f724: over-cap SIMHASH buckets -> hub star links, not phash
# sub-banding) re-run of the 600k legs on FINAL round-5 code. Same
# measurement discipline as BENCH/SCALING_RUN.md: pinned cores, fresh JVM
# per leg, /dev/shm scratch, 128 shuffle partitions, strictly sequential,
# quiet host. Stage A (this script) assumes the fixture already exists at
# data/scaling_600000 (generated separately so the untimed gen phase can
# overlap other work; the LEGS run on a quiet host).
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_600k_postfix.jsonl
: > "$LOG"
for leg in "0-7 8" "0-1 2"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"600k_${2}cores_postfix\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_600000 "$2" 2>/dev/null \
    | grep '^{' >> "$LOG"
done
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"600k_planted_postfix\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_600000 2>/dev/null \
  | grep '^{' >> "$LOG"
echo ALLDONE600
