#!/bin/bash
# Round-5 full pinned core matrix at 600k, one quiet session, strictly
# sequential. 1v4 is the closest sandbox analog of 1 -> 4 single-core
# executors (each real executor brings its own DRAM; on this one-host box
# every extra core pair shares the same controllers, so efficiency falls
# with absolute core count — see BENCH/BASELINE.md C/L decomposition).
# 2 and 8 are replicates of the legs already taken earlier this session.
cd /root/repo
LOG=BENCH/raw_scale_r5_600k.jsonl   # append to the session log
for leg in "0 1" "0-3 4" "0-7 8" "0-1 2"; do
  set -- $leg
  rm -rf /dev/shm/dupion_scale_*
  echo "{\"leg\": \"600k_${2}cores_matrix\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --scale-worker data/scaling_600000 "$2" 2>/dev/null \
    | grep '^{' >> "$LOG"
done
rm -rf /dev/shm/dupion_scale_*
echo MATRIXDONE
