#!/bin/bash
# Quiet-host re-run of the 1.2M forced-2-band 2v8 timing legs on the
# truly-final code (2ad2220 + 46a5162). The first attempt
# (raw_scale_r5_1200k_final2.jsonl) was contaminated: a concurrent
# orchestrating session was actively running commands during the 8-core
# leg (pairs 117->217s vs the pre-batching final run on an idle host,
# while the 2-core leg IMPROVED 1.37x) — so those walls are kept only as
# a contamination record, like raw_scale_r5_600k_contaminated.jsonl.
# This run: pinned cores, fresh JVM per leg, /dev/shm scratch, 128
# shuffle partitions, fixture page-cache pretouched (untimed), host
# otherwise idle, sequential. Planted-truth at 1.2M already passed on
# this exact code (raw_scale_r5_1200k_final2.jsonl last line).
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_1200k_final3.jsonl
ERR=BENCH/final3_1200k
: > "$LOG"
export SPARK_GRAFT_BANDS2_MIN=1000000
# pretouch: both legs should see the same warm page cache (57 GB fixture,
# 128 GB RAM) — the contaminated run's 8c leg likely paid cold reads after
# prior sessions' 48 GB JVMs evicted the cache.
cat data/scaling_1200000/*.parquet > /dev/null 2>&1 || true
for leg in "0-7 8" "0-1 2"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"1200k_${2}cores_2band_final3\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_1200000 "$2" 2>"$ERR.${2}c.err" \
    | grep '^{' >> "$LOG" || { echo "LEG ${2}c FAILED — see $ERR.${2}c.err"; exit 1; }
done
rm -rf /dev/shm/dupion_scale_*
echo ALLDONE1200FINAL3
