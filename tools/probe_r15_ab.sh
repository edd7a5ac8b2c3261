#!/bin/bash
# r15 groupPairs one-exchange A/B (verdict item 3): interleaved arms at
# sf10, 4 reps each, with the RunOne `metrics` instrument. On this round's
# starvation-wave host-day wall-clock swings 10-80x between consecutive
# runs, so the adjudicating numbers are executor CPU seconds and shuffle
# bytes (load-invariant); wall time is recorded for completeness.
# Arm A (old: distinct-then-join, two exchanges) = /tmp/classes_before;
# Arm B (new: repartition-on-g, one exchange)    = target/scala-2.13/classes.
set -u
SF10=${SF10:-/root/repo/.scale/sf10}
OUT=${OUT:-/root/repo/.scale/probe_r15_ab.log}
cd /root/repo
run() { # run <arm> <classes> <query>
  echo "[ab] arm=$1 $3 begin $(date +%T)" | tee -a "$OUT"
  GRAFT_CLASSES=$2 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
    timeout 3600 tools/runjava.sh graft.RunOne "$3" "$SF10" metrics 2>/dev/null \
    | grep -E '^\[runone\]|^\[metrics\]' | sed "s/^/[$1] /" | tee -a "$OUT"
}
echo "[ab] start $(date +%T)" | tee -a "$OUT"
for rep in 1 2 3 4; do
  for q in q_kcore q_label_prop q_triangle_count; do
    run A /tmp/classes_before "$q"
    run B target/scala-2.13/classes "$q"
  done
done
echo "[ab] done $(date +%T)" | tee -a "$OUT"
