#!/bin/bash
# r12 optimization-loop probe: TimeProbe timings + formatted plans for the
# touched query set. Usage: tools/r12_probe.sh <tag>  (tag = before|after)
set -e
TAG=${1:?tag}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
QS_HEAVY="q_bowtie,q_bridges,q_graph_robustness,q_lof,q_closeness,q_cosupplier_reach,q_lot_sizing,q_incremental_cc_delete,q_cc_star,q_betweenness,q_salsa,q_global_efficiency,q_critical_slack,q_diameter_sweep,q_msf,q_eccentricity,q_harmonic,q_betweenness_sampled"
QS_MID="q_label_prop,q_bfs_levels,q_dag_longest,q_shortest_paths,q_widest_paths,q_kcore,q_hits,q_pagerank_converged,q_luby_mis,q_graph_coloring,q_deepwalk,q_item_cf,q_cf_recall,q_knn_classify,q_grid_clusters,q_influence_seeds"
QS_CHEAP="q_text_tokens,q_topk_orders,q_theil_index,q_tpch_pricing,q_asof_join,q_json_extract"
mkdir -p plans/r12
sbt -batch "runMain graft.TimeProbe $SF $QS_HEAVY 3" \
    "runMain graft.TimeProbe $SF $QS_MID 3" \
    "runMain graft.TimeProbe $SF $QS_CHEAP 3" 2>&1 | grep ^TIME | tee /tmp/r12_time_$TAG.txt
