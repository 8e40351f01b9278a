#!/bin/bash
# Final-code (incl. 5869245 exact-signature twin collapse) re-run of the
# 1.2M forced-2-band 2v8 legs + planted-truth check. The twin collapse
# changes the pairs stage wherever exact-(phash,simhash) twins exist — at
# 1.2M the planted 12,000-member mega-cluster is exactly such a crowd, so
# the gate evidence must be re-measured on truly-final code. Assumes
# data/scaling_1200000 exists; legs run pinned on a quiet host, same
# discipline as SCALING_RUN.md. stderr preserved per leg.
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_1200k_final.jsonl
ERR=BENCH/final1200k
: > "$LOG"
export SPARK_GRAFT_BANDS2_MIN=1000000
for leg in "0-7 8" "0-1 2"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"1200k_${2}cores_2band_final\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_1200000 "$2" 2>"$ERR.${2}c.err" \
    | grep '^{' >> "$LOG" || { echo "LEG ${2}c FAILED — see $ERR.${2}c.err"; exit 1; }
done
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"1200k_planted_2band_final\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_1200000 2>"$ERR.planted.err" \
  | grep '^{' >> "$LOG" || { echo "PLANTED CHECK FAILED — see $ERR.planted.err"; exit 1; }
echo ALLDONE1200FINAL
