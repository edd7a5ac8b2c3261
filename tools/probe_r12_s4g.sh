#!/bin/bash
# r12 session 4 addendum 5: factor-1000 datapoint for st_drift_gate (the
# streaming corpus-drift gate) — same-day sf10@32 vs sf100@256.
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
run /root/repo/.scale/sf10 st_drift_gate 32
run /root/repo/.scale/sf100 st_drift_gate 256
log "[probe] r12 s4g addendum done $(date +%T)"
