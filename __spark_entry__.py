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
# FIRST 50 registry entries.  r10 window = the ENTIRE remaining
# never-driver-checked backlog (42 entries: the 21 r7/r8 leftovers, the 15
# r9-session additions, the 5 r10-session additions — TPC-H Q9/Q12/Q16/Q20
# shapes + the streaming heavy-hitters serving query — and
# layout_bucketed_join, whose memo keying changed this round), fronted by
# the entries whose CODE changed this round (ADVICE fixes: ml_auc_rank +
# quality_ks_test NULL-before-window, join_market_share integer-cent share
# key, the three bucketed-serve entries' mtime memo key).  That drains the
# backlog to ZERO with 8 slots left, which resume the oldest-green r03
# rotation (llm_heavy_hitters_sketch .. llm_chunk_documents).  The two
# rows-only-by-design entries (llm_fuzzy_ratio_join,
# ml_relevance_training_metrics) are pytest-pinned and take no slots even
# though the fuzzy join's NULL-text prune contract changed this round (the
# parity property test now covers NULL text).  After this window the
# rotation continues with the r03/r04 oldest-green blocks
# (llm_per_host_cap, llm_mixture_sample, llm_pii_scrub, llm_url_host_stats,
# llm_quality_resample, multimodal_frame_sample, then the agg/events r04
# block) so no entry's driver evidence goes >~5 rounds stale.
# r11 backlog (landed after this window filled, local-oracle green at
# three scales, LOCAL_CORRECTNESS_r10_scales.txt addendum):
# agg_bootstrap_ci (Poisson bootstrap CI, md5-deterministic weights),
# quality_krippendorff_alpha (panel agreement, integer coincidence sums),
# join_top_revenue_supplier (TPC-H Q15 — completes all 22 TPC-H shapes),
# ml_pr_curve (threshold sweep off the score-vocabulary table),
# events_survival_km (Kaplan-Meier with right-censoring, nano-log product),
# events_markov_2step (sparse transition-matrix square),
# quality_chi2_independence (contingency grid incl. zero cells + Cramér's V),
# quality_anova_f (one-way ANOVA from exact integer moments), and
# quality_mann_kendall (integer S + tie-corrected variance trend test).
_DRIVER_CHECK_PRIORITY = [
    # --- code changed this round (ADVICE fixes) ---
    "ml_auc_rank",
    "quality_ks_test",
    "join_market_share",
    "join_exists_order_priority_bkt",
    "join_returned_revenue_topk_bkt",
    "layout_bucketed_join",
    # --- never-driver-checked r7/r8 leftovers (21) ---
    "agg_gini_concentration",
    "agg_weighted_percentiles",
    "diag_correlation_matrix",
    "events_ab_test",
    "events_asof_nearest",
    "events_asof_tolerance",
    "events_cross_correlation",
    "events_cumulative_new_users",
    "events_cusum_changepoint",
    "events_dow_seasonality",
    "events_incident_overlap",
    "events_ohlc_bars",
    "events_path_trigrams",
    "events_timed_funnel",
    "layout_hilbert_key",
    "llm_hard_negatives",
    "ml_group_regression",
    "privacy_dp_counts",
    "privacy_l_diversity",
    "quality_benford_audit",
    "quality_quantile_normalize",
    # --- never-driver-checked r9 additions (10 more) ---
    "agg_custdist",
    "join_large_quantity_orders",
    "join_dormant_rich_customers",
    "llm_heaps_law",
    "llm_bigram_entropy",
    "llm_temperature_mixture",
    "join_unshipped_topk_revenue",
    "agg_forecast_revenue_delta",
    "join_small_quantity_loss",
    "events_cuped",
    # --- r10-session additions (5) ---
    "join_product_type_profit",
    "join_shipmode_priority",
    "agg_parts_supplier_counts",
    "join_excess_shipping_share",
    "llm_heavy_hitters_serving",
    # --- oldest-green rotation (last driver-green r03) ---
    "llm_heavy_hitters_sketch",
    "llm_fuzzy_jaccard_join",
    "ml_qa_inference_topk",
    "ml_no_answer_aggregate",
    "ml_group_metrics",
    "reshape_flatten",
    "reshape_gather_table_text",
    "llm_chunk_documents",
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
