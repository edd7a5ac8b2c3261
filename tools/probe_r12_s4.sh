#!/bin/bash
# r12 session 4: (a) ambient controls at sf10 to judge this host-day vs the
# r11 floor stamp (q1_agg 1.23 / q3_shipping 4.46); (b) if normal, re-floor
# the four r12 provisional slow-host stamps (q_kcore, q_label_prop,
# q_peak_concurrency_global, q_interval_union — verdict/builder candidate 1);
# (c) factor-1000 datapoints for THIS session's operators (q_path_trigrams,
# q_basket_affinity, x_token_pmi, st_quota_gate): sf10 references at the
# natural 32-partition regime, sf100 at the sized 256 regime — same-day
# pairs, the probe_r12_sized.sh discipline.
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r12_s4.log
mkdir -p /root/repo/.scale
log() { echo "$1" | tee -a "$OUT"; }
run() { # run <sfdir> <query> <shuffle>
  local sf=$1 q=$2 sh=$3
  log "[probe] $q @ $sf shuffle=$sh begin $(date +%T)"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=$sh \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|Exception|Killed' | head -10 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
# Regenerate scale data (the .scale dir does not survive sessions).
gen() { # gen <dest> <factor> <comma-separated-tables>
  local dest=$1 fac=$2 tabs=$3
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g sbt -batch \
    "runMain graft.ScaleGen /root/testdata/sf0.1 $dest $fac $tabs" \
    >> /root/repo/.scale/gen_s4.log 2>&1
  log "[gen] $dest ($tabs) rc=$?"
}
TABS=events,documents,lineitem,part,supplier,orders,nation,region,customer
gen /root/repo/.scale/sf10 100 $TABS
gen /root/repo/.scale/sf100 1000 $TABS

# (a) ambient controls — same-day floor-stamp comparison
run /root/repo/.scale/sf10 q1_agg 32
run /root/repo/.scale/sf10 q3_shipping 32

# (c) this session's new operators: sf10 refs then sf100 sized
for q in q_path_trigrams q_basket_affinity x_token_pmi st_quota_gate; do
  run /root/repo/.scale/sf10 $q 32
done
for q in q_path_trigrams q_basket_affinity x_token_pmi st_quota_gate; do
  run /root/repo/.scale/sf100 $q 256
done

# (b) re-floor candidates — only meaningful if (a) shows a normal host-day;
# run them regardless and let the floors update use the control stamps.
for q in q_kcore q_label_prop q_peak_concurrency_global q_interval_union q_event_transitions; do
  run /root/repo/.scale/sf10 $q 32
done
log "[probe] r12 s4 suite done $(date +%T)"
