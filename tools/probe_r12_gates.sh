#!/bin/bash
# r12 batch 3: scale datapoints for the round's remaining new slots —
# the two streaming gates and the WET ingest e2e. sf10 at the natural 32
# regime, sf100 at 256; [phase] stamps separate drop staging (once per
# JVM) from stream+publish, the st_substr_gate attribution discipline.
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r12.log
log() { echo "$1" | tee -a "$OUT"; }
run() { # run <sfdir> <query> <shuffle>
  local sf=$1 q=$2 sh=$3
  log "[probe] $q @ $sf shuffle=$sh begin $(date +%T)"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=$sh \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|Exception|Killed' | head -10 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
for q in st_range_gate st_event_transitions x_wet_ingest_e2e; do
  run /root/repo/.scale/sf10 $q 32
done
for q in st_range_gate st_event_transitions x_wet_ingest_e2e; do
  run /root/repo/.scale/sf100 $q 256
done
log "[probe] r12 gates suite done $(date +%T)"
