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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from ..functions.hashing import md5_hex
from .relational import top_k_per_group


def valid_pair_filter(
    df: DataFrame, dim: DataFrame, key: str, value_col: str, allowed_col: str = "allowed"
) -> DataFrame:
    """P9 — keep rows whose value is in the dimension's allowed-list for the
    key.  The dimension is broadcast (KPI-dictionary-sized)."""
    return df.join(F.broadcast(dim), on=key).filter(
        F.array_contains(F.col(allowed_col), F.col(value_col))
    )


@F.pandas_udf(ArrayType(IntegerType()))
def find_answer_start_udf(answer: pd.Series, text: pd.Series) -> pd.Series:
    """F11/J6 — all match offsets of answer in text, replicating
    base_kpi_inference_curator.py:129-156:

    - the answer is regex-escaped (F10) for literal matching;
    - purely numeric answers are guarded by non-digit context so "0" does
      not match inside "2016";
    - a match at offset 0 is shifted to 1 by prepending a space upstream in
      the reference (FARM bug workaround) — represented here by mapping
      offset 0 → 1 exactly as the reference's downstream sees it.
    """

    def offsets(ans: str, txt: str) -> list[int]:
        if not ans or txt is None:
            return []
        if ans.strip().isdigit():
            pat = r"(?<![0-9])" + re.escape(ans) + r"(?![0-9])"
        else:
            pat = re.escape(ans)
        out = []
        for m in re.finditer(pat, txt):
            start = m.start()
            out.append(1 if start == 0 else start)
        return out

    return pd.Series([offsets(a, t) for a, t in zip(answer, text)])


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


def negative_sample(
    positives: DataFrame,
    pool: DataFrame,
    group_cols: list[str],
    pool_id: str,
    k: int,
    salt: str = "neg",
) -> DataFrame:
    """J11 — deterministic negative pairing: for each group (question), rank
    the candidate pool by a content hash of (salt, group, candidate id) and
    take k.  Replaces the reference's seeded rejection loops
    (text_curator.py:190-258) with a reproducible, shuffle-stable pick.

    ``pool`` must already exclude known positives (anti-join upstream, J8).
    """
    from pyspark.sql import Window

    keys = positives.select(*group_cols).distinct()
    shared = [c for c in group_cols if c in pool.columns]
    cand = keys.join(pool, on=shared) if shared else keys.crossJoin(pool)
    rank_key = md5_hex(F.lit(salt), *[F.col(c) for c in group_cols], F.col(pool_id))
    w = Window.partitionBy(*group_cols).orderBy(rank_key.asc())
    return cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
