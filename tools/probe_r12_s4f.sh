#!/bin/bash
# r12 session 4 addendum 4: re-probe the three Materialize'd operators
# (q_basket_affinity, q_rfm_segments, x_dist_drift) at factor 1000 after
# the multi-consumer audit — sf10@32 refs re-run same-session.
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r12_s4.log
log() { echo "$1" | tee -a "$OUT"; }
run() {
  local sf=$1 q=$2 sh=$3
  log "[probe] $q @ $sf shuffle=$sh begin $(date +%T)"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=$sh \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|Exception|Killed' | head -10 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
for q in q_basket_affinity q_rfm_segments x_dist_drift; do
  run /root/repo/.scale/sf100 $q 256
done
log "[probe] r12 s4f addendum done $(date +%T)"
