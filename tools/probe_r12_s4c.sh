#!/bin/bash
# r12 session 4 addendum: factor-1000 datapoints for the second operator
# batch (q_rfm_segments, x_vocab_coverage) over the dirs probe_r12_s4.sh
# generated — same-day sf10@32 refs vs sf100@256, the standing discipline.
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r12_s4.log
log() { echo "$1" | tee -a "$OUT"; }
run() { # run <sfdir> <query> <shuffle>
  local sf=$1 q=$2 sh=$3
  log "[probe] $q @ $sf shuffle=$sh begin $(date +%T)"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=$sh \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|Exception|Killed' | head -10 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
# x_token_pmi re-probed after the narrow-scan total fix (its first sf100
# datapoint, 1.58x, included a third execution of the vocabulary agg).
for q in q_rfm_segments x_vocab_coverage x_token_pmi; do
  run /root/repo/.scale/sf10 $q 32
done
for q in q_rfm_segments x_vocab_coverage x_token_pmi; do
  run /root/repo/.scale/sf100 $q 256
done
log "[probe] r12 s4c addendum done $(date +%T)"
