#!/bin/bash
# End-of-round-code re-run of the 1.2M forced-2-band 2v8 gate legs +
# planted-truth check (incl. batch pixel signatures 2ad2220 and the
# empty-branch elision 46a5162). Same discipline as SCALING_RUN.md:
# pinned cores, fresh JVM per leg, /dev/shm scratch, 128 shuffle
# partitions, quiet host, sequential. Fixture pre-generated (untimed) at
# data/scaling_1200000.
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_1200k_final2.jsonl
ERR=BENCH/final2_1200k
: > "$LOG"
export SPARK_GRAFT_BANDS2_MIN=1000000
for leg in "0-7 8" "0-1 2"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"1200k_${2}cores_2band_final2\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_1200000 "$2" 2>"$ERR.${2}c.err" \
    | grep '^{' >> "$LOG" || { echo "LEG ${2}c FAILED — see $ERR.${2}c.err"; exit 1; }
done
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"1200k_planted_2band_final2\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_1200000 2>"$ERR.planted.err" \
  | grep '^{' >> "$LOG" || { echo "PLANTED CHECK FAILED — see $ERR.planted.err"; exit 1; }
echo ALLDONE1200FINAL2
