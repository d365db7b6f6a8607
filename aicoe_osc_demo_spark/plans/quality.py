"""Corpus-curation quality queries: Gopher-style repetition filters, PII
scrubbing, URL normalization, and quality-weighted resampling.

The PII and URL queries operate on deterministic fixture columns built from
``documents`` attributes inside the query itself (both the Spark plan and
the DuckDB oracle construct the identical string) — the synthetic tables
contain no natural emails/URLs, and this keeps the regex scrub genuinely
exercised AND oracle-verifiable on the driver's own data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    pii_counts,
    pii_redact,
    quality_score,
    url_host,
    url_normalize,
)
from ..operators.quality import repetition_stats, resample_by_quality
from . import load, register

_REP_SQL = """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), grams AS (
      SELECT doc_id,
             len(w) AS n_words,
             len(list_distinct(w)) AS n_distinct_words,
             unnest(list_transform(range(1, greatest(len(w) - 1, 1) + 1),
                    i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS g
      FROM base
    ), per_gram AS (
      SELECT doc_id, n_words, n_distinct_words, g, COUNT(*) AS cnt
      FROM grams GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id,
           CAST(n_words AS INT) AS n_words,
           ROUND(1.0 - n_distinct_words / CAST(n_words AS DOUBLE), 6) AS dup_word_frac,
           ROUND(1.0 - COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_ngram_frac,
           ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_ngram_frac
    FROM per_gram
    GROUP BY doc_id, n_words, n_distinct_words
"""


@register("llm_repetition_stats", _REP_SQL)
def llm_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher repetition family: duplicate-word fraction, duplicate-2-gram
    # fraction, top-2-gram share.  Exploded two-level aggregate — map-side
    # combine, shuffle carries (doc_id, gram, count), never text.
    return repetition_stats(load(spark, sf_dir, "documents"))


# Deterministic PII fixture: "reach <source><id>@ex<id%5>.com or
# 10.<id%256>.0.<id%100> call 555-<100+id%900>-0199 :: <text>".
_PII_SPARK = lambda: F.concat(  # noqa: E731
    F.lit("reach "),
    F.col("source"),
    F.col("doc_id").cast("string"),
    F.lit("@ex"),
    (F.col("doc_id") % 5).cast("string"),
    F.lit(".com or 10."),
    (F.col("doc_id") % 256).cast("string"),
    F.lit(".0."),
    (F.col("doc_id") % 100).cast("string"),
    F.lit(" call 555-"),
    (F.lit(100) + F.col("doc_id") % 900).cast("string"),
    F.lit("-0199 :: "),
    F.col("text"),
)

_PII_DUCK = (
    "'reach ' || source || CAST(doc_id AS VARCHAR) || '@ex' ||"
    " CAST(doc_id % 5 AS VARCHAR) || '.com or 10.' ||"
    " CAST(doc_id % 256 AS VARCHAR) || '.0.' ||"
    " CAST(doc_id % 100 AS VARCHAR) || ' call 555-' ||"
    " CAST(100 + doc_id % 900 AS VARCHAR) || '-0199 :: ' || text"
)

_PII_SQL = f"""
    WITH p AS (SELECT doc_id, {_PII_DUCK} AS pii_text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(pii_text, '{IPV4_RE}')) AS INT) AS n_ipv4,
           CAST(len(regexp_extract_all(pii_text, '{PHONE_RE}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(pii_text,
               '{EMAIL_RE}', '[EMAIL]', 'g'),
               '{IPV4_RE}', '[IP]', 'g'),
               '{PHONE_RE}', '[PHONE]', 'g') AS redacted
    FROM p
"""


@register("llm_pii_scrub", _PII_SQL)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PII scrub over the fixture column: count + redact emails, IPv4,
    # phone numbers.  Pure regex Column expressions, zero shuffle.
    d = load(spark, sf_dir, "documents").withColumn("pii_text", _PII_SPARK())
    return d.select("doc_id", *pii_counts(F.col("pii_text")), pii_redact(F.col("pii_text")))


# URL fixture: mixed-case host + tracking params + fragment, so
# normalization and host extraction both do real work.
_URL_SPARK = lambda: F.concat(  # noqa: E731
    F.lit("https://WWW."),
    F.col("source"),
    (F.col("doc_id") % 20).cast("string"),
    F.lit(".Example.COM/d/"),
    F.col("doc_id").cast("string"),
    F.lit("?utm_source=feed&page="),
    (F.col("doc_id") % 3).cast("string"),
    F.lit("#frag"),
)

_URL_DUCK = (
    "'https://WWW.' || source || CAST(doc_id % 20 AS VARCHAR) ||"
    " '.Example.COM/d/' || CAST(doc_id AS VARCHAR) ||"
    " '?utm_source=feed&page=' || CAST(doc_id % 3 AS VARCHAR) || '#frag'"
)

_URL_SQL = f"""
    WITH u AS (SELECT doc_id, {_URL_DUCK} AS url FROM documents),
    norm AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#:]+)', 1)) AS host,
             regexp_replace(regexp_replace(regexp_replace(url,
                 '#.*$', ''),
                 '(utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '', 'g'),
                 '[?&]$', '') AS url_norm
      FROM u
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT url_norm) AS BIGINT) AS n_urls
    FROM norm GROUP BY host
"""


@register("llm_url_host_stats", _URL_SQL)
def llm_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Host-level corpus stats over normalized URLs — the per-domain
    # accounting step of web-corpus curation (host allow/deny lists,
    # per-domain caps).  One hash aggregate on a short host key.
    d = load(spark, sf_dir, "documents").withColumn("url", _URL_SPARK())
    return (
        d.select(url_host(F.col("url")), url_normalize(F.col("url")))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url_norm").alias("n_urls"),
        )
    )


_N_BUCKETS = 5
_THRESH = [format(((b + 1) * (1 << 32)) // _N_BUCKETS - 1, "08x") for b in range(_N_BUCKETS)]
_THRESH_CASE = "CASE bucket " + " ".join(
    f"WHEN {b} THEN '{t}'" for b, t in enumerate(_THRESH)
) + " END"

# Quality expression — identical arithmetic to functions.analysis.quality_score,
# rounded to 6dp on BOTH sides before bucketing so the floor() boundary is
# taken on the same value.
_Q_DUCK = """ROUND((least(CAST(greatest(len(string_split(text,' ')),1) AS DOUBLE) / 100.0, 1.0)
        + (CASE WHEN CAST(greatest(length(text),1) AS DOUBLE) / CAST(greatest(len(string_split(text,' ')),1) AS DOUBLE) BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
        + (CASE WHEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text),1) AS DOUBLE) <= 0.1 THEN 1.0
                ELSE greatest(0.0, 1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text),1) AS DOUBLE)) END)
      ) / 3.0, 6)"""

_RESAMPLE_SQL = f"""
    WITH b AS (
      SELECT doc_id,
             least(CAST(floor({_Q_DUCK} * {_N_BUCKETS}) AS INT), {_N_BUCKETS - 1}) AS bucket,
             substr(md5('resample|' || CAST(doc_id AS VARCHAR)), 1, 8) AS hex8
      FROM documents
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN hex8 <= {_THRESH_CASE} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM b GROUP BY bucket
"""


@register("llm_quality_resample", _RESAMPLE_SQL)
def llm_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality-weighted subsampling: keep rate (bucket+1)/5 via md5 threshold
    # — deterministic, shuffle-free row decisions; one small aggregate on
    # top for the driver check.
    d = load(spark, sf_dir, "documents")
    sampled = resample_by_quality(
        d, F.round(quality_score(F.col("text")), 6), n_buckets=_N_BUCKETS
    )
    return sampled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
    )
