#!/bin/bash
# Post-fix (bb6f724) 1-core and 4-core legs at 1.2M — completes the core
# matrix on final code: with the existing 2v8 pairing
# (raw_scale_r5_1200k_postfix.jsonl) this gives a 1v4 pairing and enough
# points for a C/L wall model fit. Same discipline as SCALING_RUN.md:
# quiet host, taskset pinning, tmpfs scratch cleared between legs.
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_1200k_1v4.jsonl
: > "$LOG"
export SPARK_GRAFT_BANDS2_MIN=1000000
for leg in "0-3 4" "0 1"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"1200k_${2}cores_2band_postfix\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_1200000 "$2" 2>/dev/null \
    | grep '^{' >> "$LOG"
done
rm -rf /dev/shm/dupion_scale_*
echo ALLDONE1V4
