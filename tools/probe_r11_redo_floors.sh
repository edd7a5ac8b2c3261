#!/bin/bash
# r11 redo probes: t_upsert_bucketed sf100 crashed on the (now fixed)
# cross-JVM scratch collision; q_kcore sf100 overlapped a Verify run.
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r11.log
log() { echo "$1" | tee -a "$OUT"; }
run() {
  local sf=$1 q=$2 extra=${3:-}
  log "[probe] $q @ $sf begin $(date +%T) (redo)"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf $extra" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|Exception|Killed' | head -20 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
run /root/repo/.scale/sf100 t_upsert_bucketed
run /root/repo/.scale/sf100 q_kcore
# re-attribute the r10 562s slot: drops now staged outside the timed pass
run /root/repo/.scale/sf100 st_substr_gate
# the order-statistics count plan at factor 1000 (old pair plan timed out)
run /root/repo/.scale/sf100 q_range_join
# re-run: the 12:03 attempt raced a concurrent sbt compile and died silently
run /root/repo/.scale/sf100 x_leakage_split nowarm
# RunOne-isolated sf10 floors for the relational heavies probed at sf100
# (in-board sf10 numbers carry up to ~3.5x GC noise; ratios need floors)
for q in q9_profit_proxy q5_local_supplier q18_large_orders q_ntile t_upsert_bucketed st_upsert_merge q_kcore q_triangle_count q_range_join q_asof_native x_leakage_split_fast; do
  run /root/repo/.scale/sf10 $q
done
log "[probe] r11b redo done $(date +%T)"
