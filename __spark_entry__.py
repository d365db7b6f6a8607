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
# FIRST 50 registry entries.  Rounds 2+3 left exactly 25 queries without a
# driver-green CORRECTNESS row; this round fronts all 25 (closing full
# catalog coverage across r02+r03+r04), then re-verifies every query whose
# code path changed this round (LSH/ANN rework, SimHash form selection,
# pack_offset_bins guard, Bloom parametrization, negative-sample /
# cluster-convergence touch-ups), then the judge's must-verify set.
# Names absent from this list follow in registry order.
_DRIVER_CHECK_PRIORITY = [
    # --- the 25 never-driver-checked entries (r2+r3 rotations missed) ---
    "pipeline_llm_curation",
    "incremental_upsert_latest",
    "events_pivot_type_columns",
    "events_trailing_hour_avg",
    "events_funnel_counts",
    "events_retention_cohorts",
    "agg_rollup_revenue",
    "agg_cube_revenue",
    "agg_filtered_counts",
    "window_running_sum",
    "window_lag_delta",
    "join_full_outer",
    "set_union_missing_cols",
    "llm_vocab_topk",
    "llm_length_histogram",
    "llm_stratified_sample",
    "multimodal_metadata",
    "text_fingerprint",
    "events_json_extract",
    "text_levenshtein_match",
    "ml_train_dev_split_sizes",
    # new in r4: M6 fine-tune loop, deterministic-HLL sketch, LM perplexity
    "ml_qa_finetune_loss",
    "llm_hll_vocab_estimate",
    "llm_lm_perplexity",
    "llm_cms_token_counts",
    "text_lang_id_trigram",
    "events_hll_daily_users",
    "llm_prefix_jaccard_join",
    "llm_duplicate_spans",
    "join_salted_skew",
    "agg_quantile_sketch",
    "events_grouped_quantiles",
    "llm_semantic_dedup",
    "events_range_join_binned",
    # rows-only entries (no oracle — driver records the weaker rows check)
    "llm_fuzzy_ratio_join",
    "pipeline_text_curation",
    "reshape_nest_squad",
    "ml_relevance_training_metrics",
    # --- code paths changed in r4: re-verify under the driver ---
    "llm_ann_lsh_topk",
    "llm_embedding_near_dup",
    "llm_ann_candidate_count",
    "llm_lsh_candidate_count",
    "llm_simhash_fingerprints",
    "llm_simhash_pairs",
    "llm_pack_offset_bins",
    "llm_bloom_prefilter",
    "llm_incremental_near_dedup",
    "curation_negative_sample",
    "llm_dedup_clusters",
    # --- judge's must-verify set + strongest families as fillers ---
    "llm_minhash_lsh_pairs",
    "curation_answer_offsets",
    "events_asof_join",
    "ml_relevance_inference",
    "multimodal_features",
    "llm_exact_dedup",
    "llm_minhash_signatures",
    "llm_ngram_jaccard_pairs",
    "llm_incremental_dedup",
    "llm_contamination_check",
    "text_winnow_fingerprint",
    "llm_cosine_topk",
    "llm_ivf_topk",
    "llm_bm25_topk",
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
