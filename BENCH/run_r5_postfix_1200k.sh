#!/bin/bash
# Post-fix (bb6f724) re-run of the 1.2M forced-2-band legs — the leg whose
# pre-fix pairs stage measured 483.6 s at 8 cores (4.6x wall for 2x input),
# attributed by BENCH/diag_band_sources.py to over-cap SIMHASH members
# routed through phash sub-banding (28.6e9 sub-bucket comparisons,
# BENCH/diag_1200k.json). Assumes data/scaling_1200000 exists (gen phase
# separate); legs run on a quiet host, same discipline as SCALING_RUN.md.
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_1200k_postfix.jsonl
: > "$LOG"
export SPARK_GRAFT_BANDS2_MIN=1000000
for leg in "0-7 8" "0-1 2"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"1200k_${2}cores_2band_postfix\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_1200000 "$2" 2>/dev/null \
    | grep '^{' >> "$LOG"
done
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"1200k_planted_2band_postfix\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_1200000 2>/dev/null \
  | grep '^{' >> "$LOG"
echo ALLDONE1200
