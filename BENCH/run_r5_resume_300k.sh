#!/bin/bash
# Resume-at-scale evidence (north_rule: "resumable from checkpoint with
# per-partition lineage + metrics"): the per-row incremental resume was
# pytest-proven at 500 rows (tests/test_resume.py); this measures it at
# 300k. Three checkpointed runs at pinned 8 cores, quiet host:
#   leg A  cold checkpoint -> full-build wall
#   delta  append 3,000 rows (1% daily-append shape) as NEW part files
#   leg B  same checkpoint -> expect features.rows_reused=300000,
#          rows_recomputed=3000, prior pair verdicts reused, wall << leg A
#   leg C  nothing changed -> every stage resumes whole (read-back only)
cd /root/repo
set -e
FIX=data/scaling_resume_300k
CKPT=data/ckpt_resume_300k
LOG=BENCH/raw_scale_r5_resume300k.jsonl
: > "$LOG"
rm -rf "$CKPT" /dev/shm/dupion_resume_*
python bench.py --gen-fixture "$FIX" 300000 2>/dev/null | grep '^{' >> "$LOG" || true
echo "{\"leg\": \"resume300k_A_cold\", \"start\": \"$(date -Is)\"}" >> "$LOG"
taskset -c 0-7 python bench.py --resume-worker "$FIX" "$CKPT" 8 2>/dev/null \
  | grep '^{' >> "$LOG"
echo "{\"leg\": \"resume300k_delta_append\", \"start\": \"$(date -Is)\"}" >> "$LOG"
python bench.py --append-delta "$FIX" 300000 3000 2>/dev/null | grep '^{' >> "$LOG" || true
echo "{\"leg\": \"resume300k_B_incremental\", \"start\": \"$(date -Is)\"}" >> "$LOG"
taskset -c 0-7 python bench.py --resume-worker "$FIX" "$CKPT" 8 2>/dev/null \
  | grep '^{' >> "$LOG"
echo "{\"leg\": \"resume300k_C_unchanged\", \"start\": \"$(date -Is)\"}" >> "$LOG"
taskset -c 0-7 python bench.py --resume-worker "$FIX" "$CKPT" 8 2>/dev/null \
  | grep '^{' >> "$LOG"
rm -rf /dev/shm/dupion_resume_*
echo ALLDONERESUME
