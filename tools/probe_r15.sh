#!/bin/bash
# r15 probe suite (r14 verdict items 2/3/6/7/8):
#  - item 2: same-day isolation of the three sf0.1 upticks
#    (d_dedup_resolve 2.34x, x_contamination 1.92x, d_dedup_ngram_jaccard
#    1.67x) and the two sf10 in-board flags (x_leakage_split, x_dist_drift);
#  - item 3: q_kcore / q_label_prop x3 same-day runs — the residual
#    I/O-side swing band must land within 1.5x;
#  - item 6/7: st_lsh_gate re-probe after the tiered fold (plan changed)
#    plus the 24-batch per-batch flatness probe (LshFlatnessProbe);
#  - item 8: ambient controls (q1_agg / q3_shipping) for the host-day stamp.
set -u
SF01=${SF01:-/root/testdata/sf0.1}
SF10=${SF10:-/root/repo/.scale/sf10}
OUT=${OUT:-/root/repo/.scale/probe_r15.log}
cd /root/repo
run_one() { # run_one <query> <sfdir> [extra]
  echo "[r15] $1 @$2 begin $(date +%T)" | tee -a "$OUT"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
    timeout 3600 tools/runjava.sh graft.RunOne $1 $2 ${3:-} 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|Exception|Error' | head -10 | tee -a "$OUT"
  echo "[r15] $1 end $(date +%T)" | tee -a "$OUT"
}
echo "[r15] start $(date +%T)" | tee -a "$OUT"
# controls first — the host-day stamp every adjudication normalizes by
run_one q1_agg "$SF10"; run_one q3_shipping "$SF10"
# item 2a: sf0.1 upticks, two isolated runs each
for q in d_dedup_resolve x_contamination d_dedup_ngram_jaccard; do
  run_one $q "$SF01"; run_one $q "$SF01"
done
# item 2b: sf10 in-board flags, one more same-day isolation each
run_one x_leakage_split "$SF10"; run_one x_dist_drift "$SF10"; run_one x_dist_drift "$SF10"
# item 3: the graph-loop swing band — 3 same-day runs each, within 1.5x
for i in 1 2 3; do run_one q_kcore "$SF10"; done
for i in 1 2 3; do run_one q_label_prop "$SF10"; done
# item 6/7: tiered-fold st_lsh_gate re-stamp + per-batch flatness
run_one st_lsh_gate "$SF10"
echo "[r15] lshflat sf10 begin $(date +%T)" | tee -a "$OUT"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
  timeout 7200 tools/runjava.sh graft.LshFlatnessProbe $SF10 24 4 2 2>&1 \
  | grep -E '^\[lshflat\]|Exception|Error' | head -40 | tee -a "$OUT"
echo "[r15] all done $(date +%T)" | tee -a "$OUT"
