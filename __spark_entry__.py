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
# FIRST 50 registry entries.  r11 window = (a) every entry whose CODE or
# ORACLE changed in the r11 flake-proofing sweep (FLAKE_AUDIT_r11.md): the
# r10 red row llm_heaps_law and its regr/corr/stddev siblings, the
# sum-then-quantize TPC-H rank keys (Q1/Q3/Q9/Q10/Q14/Q15 + gini), the
# events value-sum family, the BM25 scoring family, and the four
# LSH/semdedup entries whose plan construction moved to parquet-footer
# statistics (results unchanged — re-certified anyway); then (b) the full
# r11 backlog — the 9 entries that landed after the r10 window filled
# (bootstrap CI, Krippendorff, Q15 [already in (a)], PR curve, KM
# survival, Markov-square, chi-square, ANOVA F, Mann-Kendall); remaining
# slots resume the oldest-green r03 rotation.  The two
# rows-only-by-design entries (llm_fuzzy_ratio_join,
# ml_relevance_training_metrics) are pytest-pinned and take no slots.
# r12 backlog (landed after this window filled; local-oracle green at all
# three scales + hand-computed pytest cases in test_round11_operators.py):
# quality_jsd_drift (bounded Jensen-Shannon drift companion of PSI),
# llm_tokenizer_fertility (tokens-per-word / chars-per-token per language
# through the corpus-trained BPE), and llm_ndcg_eval (position-sensitive
# NDCG@5 of the LSH ANN vs the exact ranking, exact pico-integer DCG/IDCG
# folds).
_DRIVER_CHECK_PRIORITY = [
    # --- (a) r11 flake-proofing sweep: code/oracle changed this round ---
    "llm_heaps_law",
    "llm_zipf_fit",
    "ml_group_regression",
    "events_retention_halflife",
    "diag_correlation_matrix",
    "events_cross_correlation",
    "join_product_type_profit",
    "join_returned_revenue_topk",
    "join_returned_revenue_topk_bkt",
    "join_unshipped_topk_revenue",
    "join_top_revenue_supplier",
    "agg_gini_concentration",
    "agg_pricing_summary",
    "agg_sum_avg_by_group",
    "agg_summary_stats",
    "agg_global_sum",
    "agg_promo_share",
    "events_windowed_counts",
    "events_hypertable_rollup",
    "events_gapfill_locf",
    "events_daily_type_matrix",
    "events_trailing_hour_avg",
    "events_winsorize",
    "events_time_to_convert",
    "events_backtest_seasonal_naive",
    "events_attribution_linear",
    "llm_lm_perplexity",
    "llm_perplexity_buckets",
    "ml_relevance_inference",
    "join_top_supplier_share",
    "privacy_t_closeness",
    "quality_psi_drift",
    "llm_bm25_topk",
    "llm_bm25_from_index",
    "llm_retrieve_rerank",
    "llm_rank_fusion",
    "llm_embedding_near_dup",
    "llm_semantic_dedup",
    "llm_keep_canonical",
    "llm_semdedup",
    "llm_kmeans_clusters",
    # --- (b) r11 backlog: landed after the r10 window filled ---
    "agg_bootstrap_ci",
    "quality_krippendorff_alpha",
    "ml_pr_curve",
    "events_survival_km",
    "events_markov_2step",
    "quality_chi2_independence",
    "quality_anova_f",
    "quality_mann_kendall",
    # --- oldest-green rotation (last driver-green r03) ---
    "llm_heavy_hitters_sketch",
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
