"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``aicoe_osc_demo_spark/``; this module just
exposes its query catalog.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the demo1-equivalent
    multi-join revenue rollup (left join + broadcast dims + group-by SUM —
    demo1-join-tables.ipynb cells 7-9 / Superset slice 7 shape)."""
    from aicoe_osc_demo_spark.plans import QUERIES

    return QUERIES["join_multiway_revenue_by_nation"](spark, "/root/testdata/sf0.001")


# Driver-verification scheduling: the per-round correctness gate checks the
# FIRST 50 registry entries.  r7 window = the 45 entries the driver has
# never (or not since r02) confirmed green, exactly as VERDICT r6 asked:
# the 26 late-r6 additions (all judge-verified via tools/check_correctness.py
# at sf0.01 in the r6 judging pass) and the 19 entries that rolled past
# position 50 in r6 (pipeline_llm_curation, join_multiway_revenue_by_nation,
# and the r02-era agg/join/dedup block).  The remaining 5 slots start the
# five entries whose CODE PATH changed this round -- the PQ family now
# serves from a process-scoped written index (train once per sf_dir,
# read the codes tables), so the changed path re-verifies under the
# driver per the changed-code-outranks-rotation norm.  No new r7
# queries are placed inside the window -- the 11 new entries
# (events_lag_features, events_retention_cohorts, events_rfm_scores,
# incremental_join_maintenance, llm_corpus_resemblance,
# llm_ivfpq_recall, llm_perplexity_buckets, llm_dedup_rate_by_source,
# layout_bucketed_join, llm_keep_canonical,
# llm_knn_graph's artifact-served rewrite) are local-oracle-verified
# this round (LOCAL_CORRECTNESS_r7.txt) and front the r8 window, so
# the 45-entry verification debt clears in one pass.  Still rolling
# after this window (r8 rotation backlog, r02-green, code unchanged):
# the filter family, proj_select_columns, reshape_struct_unpack,
# sample_*, set_*, text_* families, window_argmax/rank/topk.
_DRIVER_CHECK_PRIORITY = [
    # --- 26 late-r6 additions: first driver check ---
    "incremental_agg_maintenance",
    "layout_column_stats",
    "diag_skew_report",
    "llm_triangle_count",
    "privacy_k_anonymity",
    "llm_label_propagation",
    "diag_table_diff",
    "events_sliding_hll_users",
    "diag_join_explosion",
    "events_winsorize",
    "quality_rater_kappa",
    "llm_novelty_score",
    "llm_rand_projection",
    "llm_corpus_overlap",
    "llm_weighted_sample",
    "events_cooccurrence_lift",
    "llm_source_divergence",
    "events_time_weighted_avg",
    "events_transition_matrix",
    "linkage_fs_scores",
    "agg_grouping_sets",
    "window_ntile_deciles",
    "window_percentile_bins",
    "events_decayed_counts",
    "events_mad_outliers",
    "layout_column_histograms",
    # --- 19 rolled past position 50 in r6 ---
    "pipeline_llm_curation",
    "join_multiway_revenue_by_nation",
    "agg_count_by_group",
    "agg_distinct_count",
    "agg_global_sum",
    "agg_having_groups",
    "agg_pricing_summary",
    "agg_sum_avg_by_group",
    "agg_summary_stats",
    "dedup_distinct_rows",
    "dedup_keep_first_per_key",
    "incremental_skip_processed",
    "join_broadcast_dims",
    "join_cross_small",
    "join_left_orders_customer",
    "join_semi",
    "join_top_unshipped_orders",
    "order_limit",
    "reshape_melt",
    # --- code paths changed in r7 (PQ family -> index serving) ---
    "llm_pq_codes",
    "llm_pq_adc_topk",
    "llm_pq_refine_topk",
    "llm_pq_recall",
    "llm_ivfpq_topk",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    driver's 50-entry correctness window covers the families not yet
    driver-verified (see _DRIVER_CHECK_PRIORITY)."""
    from aicoe_osc_demo_spark.plans import QUERIES

    ordered = {n: QUERIES[n] for n in _DRIVER_CHECK_PRIORITY if n in QUERIES}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from aicoe_osc_demo_spark.plans import ORACLE

    return dict(ORACLE)
