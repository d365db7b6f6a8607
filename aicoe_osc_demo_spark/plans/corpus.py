"""Retrieval and training-prep queries: BM25 lexical top-k, offset-based
sequence packing, sliding-window chunking.

BM25 constants are chosen exactly representable in binary (k1=1.5, b=0.75)
so the Spark and DuckDB double arithmetic is bit-identical term by term;
scores are additionally rounded to 6dp before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus import bm25_topk, chunk_documents, pack_offset_bins
from . import load, register

_BM25_SQL = """
    WITH q AS (
      SELECT doc_id AS q_id,
             array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS q_text
      FROM documents WHERE doc_id < 5
    ), qt AS (
      SELECT q_id, unnest(list_distinct(string_split(q_text, ' '))) AS term FROM q
    ), toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ), postings AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             AVG(len(string_split(text, ' '))) AS avgdl
      FROM documents
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM postings GROUP BY 1
    ), scored AS (
      SELECT qt.q_id, p.doc_id,
             ROUND(SUM(
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * 2.5) / (p.tf + 1.5 * (0.25 + 0.75 * p.dl / s.avgdl))
             ), 6) AS score
      FROM postings p
      JOIN qt ON p.term = qt.term
      JOIN dfreq d ON p.term = d.term
      CROSS JOIN stats s
      GROUP BY 1, 2
    )
    SELECT q_id, doc_id, score, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= 10
"""


@register("llm_bm25_topk", _BM25_SQL)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lexical retrieval baseline: 5 queries (first 3 words of docs 0-4)
    # against the whole corpus.  Postings equi-join a broadcast query-term
    # set — never doc x query all-pairs.
    d = load(spark, sf_dir, "documents")
    queries = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ").alias("q_text"),
    )
    return bm25_topk(d, queries, k=10, k1=1.5, b=0.75)


_PACK_SQL = """
    SELECT source AS shard, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(SUM(len(string_split(text, ' ')))
                  OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - len(string_split(text, ' ')) AS BIGINT) AS start_offset,
           CAST(floor((SUM(len(string_split(text, ' ')))
                  OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - len(string_split(text, ' '))) / 512) AS BIGINT) AS bin
    FROM documents
"""


@register("llm_pack_offset_bins", _PACK_SQL)
def llm_pack_offset_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming concat-and-slice packing layout: per-source token stream,
    # 512-token training bins, deterministic id order.
    d = load(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    return pack_offset_bins(d, token_col="n_tokens", budget=512, shard_col="source")


_CHUNK_SQL = """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), n AS (
      SELECT doc_id, w,
             CAST(greatest(ceil(CAST(len(w) - 8 AS DOUBLE) / 24), 1) AS INT) AS n_chunks
      FROM d
    ), e AS (
      SELECT doc_id, w, unnest(range(0, n_chunks)) AS chunk_id FROM n
    )
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS INT) AS n_chunk_tokens,
           array_to_string(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ') AS chunk_text
    FROM e
"""


@register("llm_chunk_documents", _CHUNK_SQL)
def llm_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Context-window chunking for retrieval indexing: 32-word chunks,
    # 8-word overlap (stride 24).
    return chunk_documents(load(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8)
