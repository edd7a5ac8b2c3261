#!/bin/bash
# r12 follow-up: sf10 floor stamps for the round's remaining new slots
# (q_event_transitions landed after the main suite was authored), plus
# the d_dedup_ppjoin sf0.1 fast-path check (r11 carried weak flag: the
# direct-verify branch now skips the exact-dup collapse + fingerprint
# packing below the 1M-candidate cutover — claim needs a same-host
# number next to its controls).
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r12.log
log() { echo "$1" | tee -a "$OUT"; }
run() { # run <sfdir> <query> <shuffle>
  local sf=$1 q=$2 sh=$3
  log "[probe] $q @ $sf shuffle=$sh begin $(date +%T)"
  GRAFT_VERIFY_DEBUG=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
    SPARK_GRAFT_SHUFFLE=$sh \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|^\[verify-cutover\]|Exception|Killed' \
    | head -20 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
run /root/repo/.scale/sf10 q_event_transitions 32
# sf0.1 fast-path spot: ppjoin + the same controls the r9/r11 boards used
run /root/testdata/sf0.1 d_dedup_ppjoin 32
run /root/testdata/sf0.1 q1_agg 32
run /root/testdata/sf0.1 q3_shipping 32
log "[probe] r12 followup done $(date +%T)"
