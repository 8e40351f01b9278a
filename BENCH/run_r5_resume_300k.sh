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
# stderr goes to per-leg files under BENCH/ (a prior run's 2>/dev/null ate
# the failure); any leg that emits no JSON aborts the harness loudly.
cd /root/repo
set -e
FIX=data/scaling_resume_300k
CKPT=data/ckpt_resume_300k
LOG=BENCH/raw_scale_r5_resume300k.jsonl
ERR=BENCH/resume300k
: > "$LOG"
rm -rf "$CKPT" /dev/shm/dupion_resume_*
python bench.py --gen-fixture "$FIX" 300000 2>"$ERR.gen.err" | grep '^{' >> "$LOG" || true
echo "{\"leg\": \"resume300k_A_cold\", \"start\": \"$(date -Is)\"}" >> "$LOG"
taskset -c 0-7 python bench.py --resume-worker "$FIX" "$CKPT" 8 2>"$ERR.A.err" \
  | grep '^{' >> "$LOG" || { echo "LEG A FAILED — see $ERR.A.err"; exit 1; }
echo "{\"leg\": \"resume300k_delta_append\", \"start\": \"$(date -Is)\"}" >> "$LOG"
python bench.py --append-delta "$FIX" 300000 3000 2>"$ERR.delta.err" | grep '^{' >> "$LOG" || true
echo "{\"leg\": \"resume300k_B_incremental\", \"start\": \"$(date -Is)\"}" >> "$LOG"
taskset -c 0-7 python bench.py --resume-worker "$FIX" "$CKPT" 8 2>"$ERR.B.err" \
  | grep '^{' >> "$LOG" || { echo "LEG B FAILED — see $ERR.B.err"; exit 1; }
echo "{\"leg\": \"resume300k_C_unchanged\", \"start\": \"$(date -Is)\"}" >> "$LOG"
taskset -c 0-7 python bench.py --resume-worker "$FIX" "$CKPT" 8 2>"$ERR.C.err" \
  | grep '^{' >> "$LOG" || { echo "LEG C FAILED — see $ERR.C.err"; exit 1; }
rm -rf /dev/shm/dupion_resume_*
echo ALLDONERESUME
