#!/bin/bash
# A/B-interleaved bench: round-1 commit (896239d) vs HEAD, 3 reps each,
# alternating within one window so host noise hits both sides equally.
set -u
OUT=/root/repo/BENCH/runs/ab_r3.jsonl
: > "$OUT"
for rep in 1 2 3; do
  for side in r01 head; do
    dir=/dev/shm/r01wt; [ "$side" = head ] && dir=/root/repo
    t0=$(date +%s)
    line=$(cd "$dir" && SPARK_GRAFT_CPUS=32 timeout 1500 python bench.py 2>/dev/null | grep '^{"metric' | tail -1)
    t1=$(date +%s)
    echo "{\"rep\": $rep, \"side\": \"$side\", \"wall_outer\": $((t1-t0)), \"result\": ${line:-null}}" >> "$OUT"
    echo "done rep=$rep side=$side outer=$((t1-t0))s" >&2
  done
done
echo AB_DONE >&2
