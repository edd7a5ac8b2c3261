#!/bin/bash
# r14 probe suite:
#  - verdict item 7 "done" check: q_kcore / q_label_prop x3 same-day
#    isolated runs after the serialized-round + eager-free loop rework
#    must land within 1.5x of each other (the 36-165 s swing band);
#  - verdict item 3: q17_small_quantity isolation (the one unadjudicated
#    >2x board flag, 21.0 s vs floor 6.4);
#  - re-stamp the stale st_lsh_gate floor (176.02 > the 128.7 in-board);
#  - ambient controls (q1_agg / q3_shipping) for the host-day stamp.
set -u
SF_DIR=${SF_DIR:-/root/repo/.scale/sf10}
OUT=${OUT:-/root/repo/.scale/probe_r14.log}
QUERIES=${@:-q1_agg q3_shipping q_kcore q_kcore q_kcore q_label_prop q_label_prop q_label_prop q17_small_quantity q17_small_quantity st_lsh_gate}
cd /root/repo
echo "[r14] start $(date +%T) queries: $QUERIES" | tee -a "$OUT"
for q in $QUERIES; do
  echo "[r14] $q begin $(date +%T)" | tee -a "$OUT"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
    timeout 3600 sbt -batch "runMain graft.RunOne $q $SF_DIR" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|Exception|Error' | head -10 | tee -a "$OUT"
  echo "[r14] $q end $(date +%T)" | tee -a "$OUT"
done
echo "[r14] all done $(date +%T)" | tee -a "$OUT"
