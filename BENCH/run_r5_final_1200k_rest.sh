#!/bin/bash
cd /root/repo
set -e
LOG=BENCH/raw_scale_r5_1200k_final.jsonl
export SPARK_GRAFT_BANDS2_MIN=1000000
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"1200k_2cores_2band_final\", \"start\": \"$(date -Is)\"}" >> "$LOG"
taskset -c 0-1 python bench.py --scale-worker data/scaling_1200000 2 2>BENCH/final1200k.2c.err \
  | grep '^{' >> "$LOG" || { echo "LEG 2c FAILED"; exit 1; }
rm -rf /dev/shm/dupion_scale_*
echo "{\"leg\": \"1200k_planted_2band_final\", \"start\": \"$(date -Is)\"}" >> "$LOG"
SPARK_GRAFT_CPUS=16 python bench.py --check-planted data/scaling_1200000 2>BENCH/final1200k.planted.err \
  | grep '^{' >> "$LOG" || { echo "PLANTED FAILED"; exit 1; }
echo ALLDONE1200FINALREST
