#!/bin/bash
# r13 probe suite:
#  - verdict item 2 "done" check: q_geo_nearest_grid at sf10 with NO env
#    override (the operator-side input-sized repartition in
#    Geo.nearestFacilityGrid is the default now — the global
#    initialPartitionNum variants were A/B-measured and REJECTED) must
#    land within 2x of its 9.63 s sized floor;
#  - verdict item 3: re-floor the r12 provisional stamps (q_kcore,
#    q_label_prop, q_peak_concurrency_global, q_interval_union,
#    q_event_transitions + the session-4 slots) with same-day ambient
#    controls;
#  - verdict item 4: q_basket_affinity's new single-consumer bitmap plan
#    at sf10 (target <= 20 s) and factor 1000 (target <= 0.67x growth).
set -u
cd /root/repo
OUT=/root/repo/.scale/probe_r13.log
log() { echo "$1" | tee -a "$OUT"; }
run() { # run <sfdir> <query> [extra]
  local sf=$1 q=$2 extra=${3:-}
  log "[probe] $q @ $sf begin $(date +%T)"
  GRAFT_VERIFY_DEBUG=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
    timeout 5400 sbt -batch "runMain graft.RunOne $q $sf $extra" 2>&1 \
    | grep -E '^\[runone\]|^\[phase\]|Exception|Killed' \
    | head -20 | tee -a "$OUT"
  log "[probe] $q end $(date +%T)"
}
SF100=/root/repo/.scale/sf100
SF10=/root/repo/.scale/sf10
# same-day ambient controls first
run $SF10 q1_agg
run $SF10 q3_shipping
# item 2: the geo grid join under the sized DEFAULT (no env)
run $SF10 q_geo_nearest_grid
# item 4: the new basket plan, both factors
run $SF10 q_basket_affinity
run $SF100 q_basket_affinity nowarm
# item 3: re-floor the five provisional stamps
run $SF10 q_kcore
run $SF10 q_label_prop
run $SF10 q_peak_concurrency_global
run $SF10 q_interval_union
run $SF10 q_event_transitions
# item 3: session-4 slots
run $SF10 q_path_trigrams
run $SF10 x_token_pmi
run $SF10 q_rfm_segments
run $SF10 x_vocab_coverage
run $SF10 q_overlap_join
run $SF10 x_dist_drift
run $SF10 x_lang_confusion
run $SF10 q_ship_latency
run $SF10 q_user_gaps
run $SF10 x_shingle_novelty
run $SF10 q_price_band
# new r13 ops at sf10 (first same-round scale datapoints)
run $SF10 st_lsh_gate
run $SF10 x_xlsx_ingest_e2e
log "[probe] r13 suite done $(date +%T)"
