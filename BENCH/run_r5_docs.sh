#!/bin/bash
# Doc-path scale legs (round-5 verdict task #3 evidence): growth law of the
# pairs stage (300k -> 600k docs at 8 cores; criterion <= ~2.2x wall for 2x
# input) + a 2v8 pairing at 600k docs. Strictly sequential, taskset-pinned.
cd /root/repo
LOG=BENCH/raw_scale_r5_docs.jsonl
: > "$LOG"
python bench.py --gen-doc-fixture data/docs_scaling_300000 300000 2>/dev/null
python bench.py --gen-doc-fixture data/docs_scaling_600000 600000 2>/dev/null
for leg in "0-7 8 300000" "0-7 8 600000" "0-1 2 600000"; do
  set -- $leg
  echo "{\"leg\": \"docs_${3}_${2}cores\", \"start\": \"$(date -Is)\"}" >> "$LOG"
  taskset -c "$1" python bench.py --doc-scale-worker "data/docs_scaling_$3" "$2" 2>/dev/null \
    | grep '^{' >> "$LOG"
done
echo ALLDONE
