#!/bin/bash
# r12 session 4 addendum 3: factor-1000 datapoint for x_dist_drift (the
# total-variation corpus drift monitor) — same-day sf10@32 vs sf100@256.
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
run /root/repo/.scale/sf10 x_dist_drift 32
run /root/repo/.scale/sf100 x_dist_drift 256
log "[probe] r12 s4e addendum done $(date +%T)"
