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
# FIRST 50 registry entries.  r9 window = the 50 oracled entries added during
# r7/r8 that the driver has never hash-checked (all local-oracle green in
# LOCAL_CORRECTNESS_r8.txt and the three-scale sweep), fronted by the four
# entries whose code changes this round (ADVICE fixes: events_stl_anomalies
# MAD-zero guard, join_returned_revenue_topk integer-cent rank key,
# llm_bm25_from_index cache keying, graph_kcore_copurchase self-loop guard).
# The two rows-only-by-design entries (llm_fuzzy_ratio_join,
# ml_relevance_training_metrics) got their rows-only driver record in r8 and
# are pytest-pinned, so they do not take r9 slots even though the fuzzy join
# gains a pruned fast path this round.  Still rolling after this window
# (r10 backlog, all local-oracle green at three scales since r8):
# agg_gini_concentration, agg_weighted_percentiles, diag_correlation_matrix,
# events_ab_test, events_asof_nearest, events_asof_tolerance,
# events_cross_correlation, events_cumulative_new_users, events_cusum_changepoint,
# events_dow_seasonality, events_incident_overlap, events_ohlc_bars,
# events_path_trigrams, events_timed_funnel, layout_hilbert_key,
# llm_hard_negatives, ml_group_regression, privacy_dp_counts,
# privacy_l_diversity, quality_benford_audit, quality_quantile_normalize
# plus the NINE r9-session additions (local-oracle green at all three
# scales this round, LOCAL_CORRECTNESS_r9.txt): join_exists_order_priority_bkt,
# join_returned_revenue_topk_bkt, agg_custdist, join_large_quantity_orders,
# join_dormant_rich_customers, join_market_share, llm_heaps_law,
# llm_bigram_entropy, llm_temperature_mixture, plus the batch-J TPC-H
# shapes join_unshipped_topk_revenue (Q3), agg_forecast_revenue_delta (Q6),
# join_small_quantity_loss (Q17), and the experimentation/eval batch K
# events_cuped, quality_ks_test, ml_auc_rank — these front the r10 window
# per the rotation convention, then the r03/r04 oldest-green rotation
# resumes (llm_chunk_documents block, agg/events r04 block) so no entry's
# driver evidence goes >~5 rounds stale.
_DRIVER_CHECK_PRIORITY = [
    # --- code changed this round (ADVICE fixes) ---
    "events_stl_anomalies",
    "join_returned_revenue_topk",
    "llm_bm25_from_index",
    "graph_kcore_copurchase",
    # --- never-driver-checked r7/r8 additions (46) ---
    "join_exists_order_priority",
    "join_part_value_share",
    "join_single_late_supplier",
    "window_percent_rank_cume",
    "join_nation_trade_volume",
    "agg_promo_share",
    "filter_or_of_ands",
    "agg_share_to_parent",
    "join_cheapest_supplier_per_part",
    "text_char_entropy",
    "text_readability",
    "llm_centroid_outliers",
    "llm_lsh_threshold_curve",
    "ml_calibration_bins",
    "events_retention_d1_d7",
    "events_time_to_convert",
    "events_theil_sen_trend",
    "events_anomaly_ewma",
    "events_interval_coverage",
    "events_attribution_last_touch",
    "events_wilson_ci",
    "events_entry_exit_matrix",
    "events_stickiness_dau_mau",
    "events_stl_decompose",
    "events_retention_halflife",
    "events_growth_accounting",
    "events_pareto_deciles",
    "events_concurrency_peak",
    "events_backtest_seasonal_naive",
    "ml_time_split_report",
    "events_attribution_linear",
    "events_error_budget_burn",
    "events_session_depth_histogram",
    "join_top_supplier_share",
    "agg_mode_per_group",
    "agg_distribution_shape",
    "quality_psi_drift",
    "privacy_t_closeness",
    "llm_dedup_cluster_sizes",
    "llm_filter_funnel",
    "llm_rank_fusion",
    "llm_source_logodds",
    "llm_rake_keywords",
    "llm_pack_utilization",
    "llm_pmi_collocations",
    "llm_zipf_fit",
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
