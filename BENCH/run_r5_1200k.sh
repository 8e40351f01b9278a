#!/bin/bash
# 1.2M-image leg (round-5 verdict task #2): exercises the 2x32-bit band plan
# + radius-6 prefilter via SPARK_GRAFT_BANDS2_MIN=1000000 (the plan step 20M+
# reps would select in production; the sandbox cannot hold a 20M fixture).
# Disk swap first: the 1.2M fixture (~52G) needs the 300k+600k fixtures gone.
# The fixture is written with honest 256 KiB pages (synth_spark row.check.min
# fix), so these legs also evidence the page-selective verify gather engaging:
# the leg JSON's gather counters report bytes_read / bytes_total.
cd /root/repo
LOG=BENCH/raw_scale_r5_1200k.jsonl
: > "$LOG"
rm -rf data/scaling_300000 data/scaling_600000
python bench.py --gen-fixture data/scaling_1200000 1200000 2>/dev/null
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
