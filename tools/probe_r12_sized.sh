#!/bin/bash
# r12 probe suite:
#  - sized-partition adjudication of the r11 sf100 residuals (verdict
#    item 1): q5_local_supplier / q18_large_orders / q_triangle_count at
#    SPARK_GRAFT_SHUFFLE=256 (partitions ~ data: sf10 runs its natural
#    32), vs same-day sf10 references;
#  - new floors for the r12 graph plans (scale-aware q_kcore /
#    q_label_prop, materialized peel/triangles);
#  - q_peak_concurrency_global at sf100 (verdict item 8: the dense
#    single-group regime);
#  - same-day ambient control stamps (q1_agg / q3_shipping).
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r12.log
log() { echo "$1" | tee -a "$OUT"; }
run() { # run <sfdir> <query> <shuffle> [nowarm]
  local sf=$1 q=$2 sh=$3 extra=${4:-}
  log "[probe] $q @ $sf shuffle=$sh begin $(date +%T)"
  GRAFT_VERIFY_DEBUG=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
    SPARK_GRAFT_SHUFFLE=$sh \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf $extra" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|^\[verify-cutover\]|Exception|Killed' \
    | head -20 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
SF100=/root/repo/.scale/sf100
SF10=/root/repo/.scale/sf10
# same-day sf10 references (natural 32-partition regime) + controls
for q in q1_agg q3_shipping q5_local_supplier q18_large_orders \
         q_triangle_count q_kcore q_label_prop q_peak_concurrency_global \
         q_interval_union; do
  run $SF10 $q 32
done
# sf100 sized regime (256 partitions ~ 10x the sf10 sizing)
for q in q5_local_supplier q18_large_orders q_triangle_count \
         q_kcore q_label_prop q_peak_concurrency_global q_interval_union; do
  run $SF100 $q 256
done
# the two residuals ALSO at the old fixed-32 regime for the A/B
run $SF100 q18_large_orders 32
run $SF100 q5_local_supplier 32
# verdict item 5: RunOne-isolate d_dedup_resolve's sf0.1 in-board
# doubling (1.43 -> 2.99 s r10 -> r11, unadjudicated) + the machinery-
# sharing x_dedup_eval as its same-host control
run /root/testdata/sf0.1 d_dedup_resolve 32
run /root/testdata/sf0.1 x_dedup_eval 32
log "[probe] r12 sized suite done $(date +%T)"
