"""Curation operators (SURVEY.md §2: P9, J6, J7, J8, J11, F10, F11).

These re-express the reference's training-data curation joins:

- valid (kpi_id, data_type) pair check against the KPI dictionary
  (ref: /root/reference/src/components/preprocessing/table_curator.py:311-323,
  src/components/utils/qa_utils.py:113-134)
- answer-offset search with the numeric-boundary guard and the FARM 0-offset
  workaround (ref: base_kpi_inference_curator.py:129-156)
- synthetic-positive discovery across other pages of the same PDF
  (ref: kpi_inference_curator.py:468-529)
- deterministic negative sampling (ref: text_curator.py:190-258) — the
  reference's seeded rejection loops become hash-ranked window picks,
  reproducible under any partitioning.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from ..functions.hashing import md5_hex


def valid_pair_filter(
    df: DataFrame, dim: DataFrame, key: str, value_col: str, allowed_col: str = "allowed"
) -> DataFrame:
    """P9 — keep rows whose value is in the dimension's allowed-list for the
    key.  The dimension is broadcast (KPI-dictionary-sized)."""
    return df.join(F.broadcast(dim), on=key).filter(
        F.array_contains(F.col(allowed_col), F.col(value_col))
    )


def find_answer_start(answer: str, text: str) -> list[int]:
    """F11/J6 — all match offsets of answer in text, replicating
    base_kpi_inference_curator.py:129-156 EXACTLY:

    - only dots are escaped (the reference escapes '.' char-by-char, not
      re.escape — other metacharacters pass through);
    - purely numeric answers are guarded by a non-digit on EITHER side
      (union of '[^0-9]ans' shifted +1 and 'ans[^0-9]'), so "0" does not
      match inside "2016" but DOES match in "10a" (digit before, non-digit
      after — the reference accepts one-sided boundaries);
    - offsets are returned unshifted; the FARM 0-offset workaround lives in
      ``farm_zero_shift`` (the reference applies it in the callers,
      kpi_inference_curator.py:355-360, shifting ALL offsets).

    The reference returns ``list(set(...))`` (arbitrary order); this sorts
    for determinism.
    """
    if not answer or text is None:
        return []
    escaped = "".join("\\." if c == "." else c for c in answer)
    try:
        if answer.isnumeric():
            m1 = [m.start() + 1 for m in re.finditer("[^0-9]" + escaped, text)]
            m2 = [m.start() for m in re.finditer(escaped + "[^0-9]", text)]
            return sorted(set(m1 + m2))
        return sorted(m.start() for m in re.finditer(escaped, text))
    except re.error:
        # un-escaped metacharacters crash the reference; degrade to no-match
        return []


@F.pandas_udf(ArrayType(IntegerType()))
def find_answer_start_udf(answer: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series([find_answer_start(a, t) for a, t in zip(answer, text)])


def farm_zero_shift(df: DataFrame, text_col: str, starts_col: str) -> DataFrame:
    """The FARM-bug workaround (kpi_inference_curator.py:355-360): if any
    offset is 0, prepend a space to the paragraph and shift ALL offsets +1.
    Pure column expressions."""
    has_zero = F.array_contains(F.col(starts_col), 0)
    return df.withColumn(
        text_col, F.when(has_zero, F.concat(F.lit(" "), F.col(text_col))).otherwise(F.col(text_col))
    ).withColumn(
        starts_col,
        F.when(has_zero, F.transform(F.col(starts_col), lambda x: x + 1)).otherwise(
            F.col(starts_col)
        ),
    )


def answer_containment_join(
    annotations: DataFrame,
    paragraphs: DataFrame,
    on: list[str],
    answer_col: str = "answer",
    text_col: str = "text",
) -> DataFrame:
    """J6 — candidate equi-join on the blocking keys, then keep pairs whose
    paragraph contains the answer (offset list non-empty)."""
    joined = annotations.join(paragraphs, on=on)
    return joined.withColumn(
        "answer_start", find_answer_start_udf(F.col(answer_col), F.col(text_col))
    ).filter(F.size("answer_start") > 0)


def extra_answerable_join(
    annotations: DataFrame,
    paragraphs: DataFrame,
    doc_key: str,
    page_col: str,
    answer_col: str = "answer",
    text_col: str = "text",
) -> DataFrame:
    """J7 — synthetic-positive discovery: for each annotation, scan OTHER
    pages of the same document for paragraphs containing the answer
    (kpi_inference_curator.py:468-529).  Equi-join on the document key keeps
    the search candidate-pruned."""
    ann = annotations.alias("ann")
    par = paragraphs.alias("par")
    cand = ann.join(par, on=doc_key).filter(
        F.col(f"ann.{page_col}") != F.col(f"par.{page_col}")
    )
    return cand.withColumn(
        "answer_start", find_answer_start_udf(F.col(f"ann.{answer_col}"), F.col(f"par.{text_col}"))
    ).filter(F.size("answer_start") > 0)


def rank_prefilter_threshold(k: int, n_pool: int, oversample: int = 16) -> str | None:
    """First-8-hex-digit md5 threshold that keeps an expected
    ``oversample * k`` candidates out of ``n_pool`` per group.  Returns None
    when the filter would not prune (small pools), so callers can skip it."""
    if n_pool <= 0 or oversample * k >= n_pool:
        return None
    frac = (oversample * k) / n_pool
    thr = min(16**8 - 1, max(1, int(frac * 16**8) + 1))
    return format(thr, "08x")


def negative_sample(
    positives: DataFrame,
    pool: DataFrame,
    group_cols: list[str],
    pool_id: str,
    k: int,
    salt: str = "neg",
    pool_count: int | None = None,
    oversample: int = 16,
) -> DataFrame:
    """J11 — deterministic negative pairing: for each group (question), rank
    the candidate pool by a content hash of (salt, group, candidate id) and
    take k.  Replaces the reference's seeded rejection loops
    (text_curator.py:190-258) with a reproducible, shuffle-stable pick.

    ``pool`` must already exclude known positives (anti-join upstream, J8).

    Scale: the naive shape materializes |groups| x |pool| candidate rows and
    fully sorts each group just to keep k.  Because the rank key is a uniform
    md5, the k smallest ranks of a group land below a static hash threshold
    t ~ oversample*k/|pool| with overwhelming probability, so we prefilter
    candidates to ``md5 < t`` BEFORE the window — per-group candidates become
    O(k*oversample) — and fall back to a full scan only for groups the
    prefilter under-filled (< k survivors).  The pick is hash-identical to
    the naive ranking: if a group has >= k survivors below t, the k smallest
    overall are all below t.

    The threshold needs |pool|: when ``pool_count`` is given it is a Python
    constant; when omitted the threshold becomes a runtime scalar (a one-row
    count aggregate broadcast-joined into the plan), so construction stays
    fully lazy and no eager job runs — any threshold yields the identical
    pick because the fallback rescans under-filled groups.  The
    under-filled-group fallback is a second scan of the pool that unions
    into the plan; it reads zero rows for groups the prefilter satisfied,
    but callers who know the prefilter always fills (oversample >= 16 and
    |pool| >> k) can treat its cost as the anti-join on group keys only.
    """
    from pyspark.sql import Window

    keys = positives.select(*group_cols).distinct()
    shared = [c for c in group_cols if c in pool.columns]

    def candidates(g: DataFrame) -> DataFrame:
        return g.join(pool, on=shared) if shared else g.crossJoin(pool)

    rank_key = md5_hex(F.lit(salt), *[F.col(c) for c in group_cols], F.col(pool_id))
    w = Window.partitionBy(*group_cols).orderBy(rank_key.asc())

    if pool_count is not None:
        thr = rank_prefilter_threshold(k, pool_count, oversample)
        if thr is None:
            cand = candidates(keys)
            return (
                cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
            )
        pref = candidates(keys).filter(F.substring(rank_key, 1, 8) < thr)
    else:
        # Lazy threshold: same arithmetic as rank_prefilter_threshold, but
        # over a runtime one-row count broadcast-joined into the plan.  A
        # no-prune pool (oversample*k >= n) maps to 'zzzzzzzz', which keeps
        # every hex-prefixed row.
        stats = pool.agg(F.count(F.lit(1)).alias("_pool_n"))
        raw = (
            (F.lit(float(oversample * k)) / F.col("_pool_n")) * F.lit(float(16**8))
        ).cast("long") + 1
        thr_int = F.least(F.lit(16**8 - 1), F.greatest(F.lit(1), raw))
        thr_col = F.when(
            (F.col("_pool_n") <= 0) | (F.lit(oversample * k) >= F.col("_pool_n")),
            F.lit("zzzzzzzz"),
        ).otherwise(F.lower(F.lpad(F.conv(thr_int.cast("string"), 10, 16), 8, "0")))
        pref = (
            candidates(keys)
            .crossJoin(F.broadcast(stats))
            .filter(F.substring(rank_key, 1, 8) < thr_col)
            .drop("_pool_n")
        )
    ranked = pref.withColumn("rn", F.row_number().over(w)).withColumn(
        "grp_n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    filled = ranked.filter((F.col("grp_n") >= k) & (F.col("rn") <= k)).drop("rn", "grp_n")

    # groups with < k survivors (including zero-survivor groups) rescan the
    # full pool — expected to be a vanishing fraction at oversample >= 16
    satisfied = filled.select(*group_cols).distinct()
    under = keys.join(satisfied, on=group_cols, how="left_anti")
    fallback = (
        candidates(under).withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
    )
    return filled.unionByName(fallback)
