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
# FIRST 50 registry entries.  r14 window (VERDICT r13 "Next round" #3) =
# (a) the 4 r06-rotation entries that rolled when the r13 window filled;
# (b) the r13 rewrites the driver has not re-hashed post-change — r13
# touched 64 entries through shared-operator edits but its window covered
# only ~20 of them; the 10 biggest unwindowed rewrites named by the r13
# verdict come first, then the remaining touched-but-unwindowed entries
# (Lloyd/PQ family, same-key-window rewrites, input spreads,
# bounded-table checkpoints, retention family, checkpoint-policy changes);
# (c) every entry the r14 optimization round itself changed (shared
# matched-postings rank fusion, novelty window, PQ LUT single-pass +
# serving checkpoint, ivf norm hoist, mixture/curation checkpoints, chi2
# gate, t-closeness two-level rollup) so the driver re-hashes this
# round's rewrites.  Four r13-touched entries whose shared-operator
# changes are already covered by in-window siblings yielded slots
# (llm_tokenizer_fertility — BPE family, llm_bpe_* driver-green r13;
# events_retention_halflife — built on in-window retention_cohorts;
# llm_pmi_collocations / llm_heaps_law — the bounded-checkpoint pattern
# verified via in-window llm_perplexity_buckets / quality_mann_kendall).
# The two rows-only-by-design entries (llm_fuzzy_ratio_join,
# ml_relevance_training_metrics) are pytest-pinned and take no slots;
# their value-hashed companion entries stand in
# (llm_fuzzy_candidates_profile below; ml_relevance_split_profile was
# driver-green in r13).
_DRIVER_CHECK_PRIORITY = [
    # --- (a) r06-rotation entries that rolled from the r13 window ---
    "llm_dedup_clusters",
    "llm_lm_perplexity",
    "llm_segment_dedup",
    "join_anti",
    # --- (b) r13/r14 rewrites not yet driver-hashed post-change ---
    "llm_kmeans_routed",
    "llm_bm25_topk",
    "llm_rank_fusion",
    "events_retention_d1_d7",
    "events_retention_cohorts",
    "events_attribution_linear",
    "llm_fuzzy_candidates_profile",
    "text_char_entropy",
    "join_single_late_supplier",
    "llm_cosine_topk",
    "llm_retrieve_rerank",
    "llm_ivfpq_recall",
    "llm_ivfpq_topk",
    "join_top_supplier_share",
    "llm_centroid_outliers",
    "pipeline_llm_curation",
    "llm_rake_keywords",
    "llm_rand_projection",
    "layout_hilbert_key",
    "llm_corpus_overlap",
    "llm_source_divergence",
    "llm_bigram_entropy",
    "llm_perplexity_buckets",
    "llm_semantic_dedup",
    "llm_keep_canonical",
    "quality_mann_kendall",
    "agg_share_to_parent",
    "events_cooccurrence_lift",
    "llm_dedup_cluster_sizes",
    "llm_label_propagation",
    "graph_kcore_copurchase",
    "llm_ndcg_eval",
    "window_percentile_bins",
    "ml_time_split_report",
    "quality_chi2_independence",
    # --- (c) entries the r14 optimization round changed ---
    "llm_novelty_score",
    "llm_bleu_doc_pairs",
    "llm_mixture_sample",
    "llm_temperature_mixture",
    "llm_pq_adc_topk",
    "llm_pq_refine_topk",
    "llm_pq_recall",
    "llm_ann_recall",
    "llm_ivf_topk",
    "llm_ivf_recall",
    "privacy_t_closeness",
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
