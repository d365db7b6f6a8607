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
# FIRST 50 registry entries.  r13 window = (a) the r13 backlog — the 2
# entries that landed after the r12 window filled (llm_kn_perplexity —
# interpolated Kneser-Ney bigram perplexity, the KenLM/CCNet smoothing;
# llm_good_turing_coverage — simple Good-Turing unseen-mass + hapax ratio;
# both local-oracle green at all three scales + hand-computed pytest in
# test_round12_operators.py); (b) the two r05-rotation entries that rolled
# when the r12 window filled (pipeline_text_curation, reshape_nest_squad);
# then (c) the oldest-green rotation continuing into the r06 cohort — the
# 36-entry r06 batch is now the oldest driver evidence; 46 of its 50
# entries fit this window, the last 4 (llm_dedup_clusters,
# llm_lm_perplexity, llm_segment_dedup, join_anti) roll to the r14
# window.  The two rows-only-by-design entries (llm_fuzzy_ratio_join,
# ml_relevance_training_metrics) are pytest-pinned and take no slots —
# and as of r13 each has a value-hashed companion entry
# (llm_fuzzy_candidates_profile, ml_relevance_split_profile) oracling its
# SQL-expressible prefix.
_DRIVER_CHECK_PRIORITY = [
    # --- (a) r13 backlog: landed after the r12 window filled ---
    "llm_kn_perplexity",
    "llm_good_turing_coverage",
    # --- (b) r05-rotation entries that rolled from the r12 window ---
    "pipeline_text_curation",
    "reshape_nest_squad",
    # --- (c) oldest-green rotation: last driver-green r06 (46 of 50) ---
    "llm_pq_refine_topk",
    "llm_bpe_merge_loop",
    "llm_bpe_encode",
    "llm_tfidf_keywords",
    "incremental_apply_cdc",
    "quality_expectations",
    "layout_zorder_key",
    "llm_semdedup",
    "llm_knn_graph",
    "llm_dsir_resample",
    "llm_mmr_diverse_topk",
    "multimodal_phash_dedup",
    "llm_c4_rules",
    "llm_token_budget_plan",
    "llm_pagerank",
    "llm_cross_corpus_links",
    "llm_feature_hash_embed",
    "llm_sq_codes",
    "llm_sq_recon_error",
    "llm_leakage_safe_split",
    "llm_vocab_coverage",
    "llm_bpe_pair_counts",
    "llm_ann_recall",
    "llm_ivf_recall",
    "llm_pq_recall",
    "llm_corpus_report",
    "llm_pq_codes",
    "events_gapfill_locf",
    "events_scd2_type_history",
    "events_scd2_pointintime",
    "llm_incremental_near_dedup",
    "text_lang_id_trigram",
    "text_winnow_fingerprint",
    "llm_minhash_signatures",
    "llm_minhash_lsh_pairs",
    "llm_simhash_fingerprints",
    "llm_simhash_pairs",
    "llm_ngram_jaccard_pairs",
    "llm_embedding_near_dup",
    "llm_ann_candidate_count",
    "llm_contamination_check",
    "llm_prefix_jaccard_join",
    "llm_duplicate_spans",
    "llm_lsh_candidate_count",
    "llm_repetition_stats",
    "llm_containment_pairs",
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
