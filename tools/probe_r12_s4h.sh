#!/bin/bash
# r12 session 4 addendum 6: factor-1000 datapoints for the final operator
# batch (x_lang_confusion, q_ship_latency) — same-day sf10@32 vs sf100@256.
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
for q in x_lang_confusion q_ship_latency; do
  run /root/repo/.scale/sf10 $q 32
done
for q in x_lang_confusion q_ship_latency; do
  run /root/repo/.scale/sf100 $q 256
done
log "[probe] r12 s4h addendum done $(date +%T)"
