#!/bin/bash
# r11 probe suite: sf100 relational heavies (VERDICT item 1), sf100
# leakage exact/fast single-pass (item 5), sf10 cutover floor checks.
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r11.log
log() { echo "$1" | tee -a "$OUT"; }
run() { # run <sfdir> <query> [nowarm]
  local sf=$1 q=$2 extra=${3:-}
  log "[probe] $q @ $sf begin $(date +%T)"
  GRAFT_VERIFY_DEBUG=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf $extra" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|^\[verify-cutover\]|Exception|Killed' | head -20 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
SF100=/root/repo/.scale/sf100
SF10=/root/repo/.scale/sf10
# sf100 relational (two-pass steady state, matching prior probe regime)
for q in q9_profit_proxy q5_local_supplier q18_large_orders q_ntile t_upsert_bucketed st_upsert_merge q_kcore q_triangle_count q_range_join; do
  run $SF100 $q
done
# sf100 leakage exact/fast: single-pass (spill-bound verify tier)
run $SF100 x_leakage_split nowarm
run $SF100 x_leakage_split_fast nowarm
# sf10 cutover floor checks (verify branch + floors for the two ex-weak)
run $SF10 d_dedup_ppjoin
run $SF10 x_leakage_split
run $SF10 d_dedup_ngram_jaccard
run $SF10 d_dedup_components
# sf10 control stamp for this host-day
run $SF10 q3_shipping
run $SF10 q1_agg
log "[probe] r11 suite done $(date +%T)"
