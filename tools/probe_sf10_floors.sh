#!/bin/bash
# RunOne-isolated sf10 floors for the >20 s board slots (VERDICT r9 item
# 6) plus re-measures after this round's changes (bucketed upsert sink,
# geo anchor cap, provable df-cut). Append results to floors_sf10.json
# by hand after eyeballing stability.
set -u
SF_DIR=${SF_DIR:-/root/repo/.scale/sf10}
OUT=${OUT:-/root/repo/.scale/probe_sf10_floors.log}
QUERIES=${@:-st_upsert_merge q_geo_nearest d_dedup_ngram_sketch x_dsir_select q17_small_quantity x_charlm_score q_kcore q_range_join x_passage_mine}
cd /root/repo
echo "[floors] start $(date +%T) queries: $QUERIES" | tee -a "$OUT"
for q in $QUERIES; do
  echo "[floors] $q begin $(date +%T)" | tee -a "$OUT"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
    timeout 3600 sbt -batch "runMain graft.RunOne $q $SF_DIR" 2>&1 \
    | grep -E '^\[runone\]|Exception|Error' | head -10 | tee -a "$OUT"
  echo "[floors] $q end $(date +%T) rc=$?" | tee -a "$OUT"
done
echo "[floors] all done $(date +%T)" | tee -a "$OUT"
