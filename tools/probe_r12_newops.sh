#!/bin/bash
# r12 batch 2: scale datapoints for the operators that landed THIS round
# (q_price_band / q_user_gaps / q_event_transitions / x_shingle_novelty):
# sf10 references at the natural 32-partition regime, sf100 at the sized
# 256 regime — same-day pairs, same discipline as probe_r12_sized.sh.
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r12.log
log() { echo "$1" | tee -a "$OUT"; }
run() { # run <sfdir> <query> <shuffle>
  local sf=$1 q=$2 sh=$3
  log "[probe] $q @ $sf shuffle=$sh begin $(date +%T)"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=$sh \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf" 2>&1 \
    | grep -E '^\[runone\]|Exception|Killed' | head -10 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
# documents at both factors (relational-only regen earlier in the session)
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g sbt -batch \
  "runMain graft.ScaleGen /root/testdata/sf0.1 /root/repo/.scale/sf10 100 documents" \
  >> /root/repo/.scale/gen_docs.log 2>&1
log "[gen] sf10 documents rc=$?"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g sbt -batch \
  "runMain graft.ScaleGen /root/testdata/sf0.1 /root/repo/.scale/sf100 1000 documents" \
  >> /root/repo/.scale/gen_docs.log 2>&1
log "[gen] sf100 documents rc=$?"
for q in q_price_band q_user_gaps x_shingle_novelty; do
  run /root/repo/.scale/sf10 $q 32
done
for q in q_price_band q_user_gaps q_event_transitions x_shingle_novelty; do
  run /root/repo/.scale/sf100 $q 256
done
log "[probe] r12 newops suite done $(date +%T)"
