#!/bin/bash
# 1 vs 4 single-core-executor legs at 1.2M on the truly-final code
# (batching 2ad2220 + elision 46a5162) — the exact N -> 4N executor shape
# the north rule names, paired with raw_scale_r5_1200k_final3.jsonl's 2v8
# legs for a full core matrix on this code. Same discipline: quiet host,
# pinned cores, fresh JVM per leg, /dev/shm scratch, page-cache pretouch.
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_1200k_final3_1v4.jsonl
ERR=BENCH/final3_1200k_1v4
: > "$LOG"
export SPARK_GRAFT_BANDS2_MIN=1000000
cat data/scaling_1200000/*.parquet > /dev/null 2>&1 || true
for leg in "0-3 4" "0 1"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"1200k_${2}cores_2band_final3\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_1200000 "$2" 2>"$ERR.${2}c.err" \
    | grep '^{' >> "$LOG" || { echo "LEG ${2}c FAILED — see $ERR.${2}c.err"; exit 1; }
done
rm -rf /dev/shm/dupion_scale_*
echo ALLDONE1200FINAL3_1V4
