#!/bin/bash
# Factor-1000 scale probe: RunOne-isolated steady-state seconds at sf100
# for the scale-claim survivors (VERDICT r9 item 1). Compare each against
# 10x its sf10 floor (tools/floors_sf10.json) — linear claims should land
# near 10x; super-linear is a scale bug to fix and re-measure.
# Usage: SPARK_DRIVER_MEM=64g tools/probe_sf100.sh [query ...]
set -u
SF_DIR=${SF_DIR:-/root/repo/.scale/sf100}
OUT=${OUT:-/root/repo/.scale/probe_sf100.log}
QUERIES=${@:-s_ann_lsh x_leakage_split_banded_fast d_dedup_ngram_sketch m_features_build d_dedup_components x_leakage_split_banded d_minhash_portable q_geo_nearest_grid}
cd /root/repo
echo "[probe] start $(date +%T) queries: $QUERIES" | tee -a "$OUT"
for q in $QUERIES; do
  echo "[probe] $q begin $(date +%T)" | tee -a "$OUT"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $SF_DIR" 2>&1 \
    | grep -E '^\[runone\]|Exception|Error' | head -20 | tee -a "$OUT"
  echo "[probe] $q end $(date +%T) rc=$?" | tee -a "$OUT"
done
echo "[probe] all done $(date +%T)" | tee -a "$OUT"
