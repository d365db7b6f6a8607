"""Curation-pipeline queries (P9, J6, J7, J11, U7, U8, U9 of SURVEY.md §2).

The reference's curators join annotations against extracted paragraphs; here
the ``documents`` table plays both roles (``source`` is the "pdf name",
``doc_id`` the "page"), with answers constructed deterministically from the
text so both oracle sides see identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import get_text_section
from ..operators.curation import answer_containment_join, negative_sample, valid_pair_filter
from ..operators.reshape import gather_table_text, nest_to_squad
from . import load, register


@register(
    "curation_valid_pairs",
    """
    SELECT o_orderkey, o_orderpriority, o_orderstatus FROM (
      SELECT o_orderkey, o_orderpriority, o_orderstatus,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN ['O', 'P'] ELSE ['F'] END AS allowed
      FROM orders
    ) WHERE list_contains(allowed, o_orderstatus)
    """,
)
def curation_valid_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P9 — valid (kpi_id, data_type) pair check (table_curator.py:311-323):
    # the KPI-category dictionary becomes a broadcast dimension with an
    # allowed-list column; the check is array_contains after the map join.
    o = load(spark, sf_dir, "orders")
    dim = (
        o.select("o_orderpriority")
        .distinct()
        .withColumn(
            "allowed",
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                F.array(F.lit("O"), F.lit("P")),
            ).otherwise(F.array(F.lit("F"))),
        )
    )
    return valid_pair_filter(o, dim, "o_orderpriority", "o_orderstatus").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )


@register(
    "curation_answer_containment",
    """
    WITH ann AS (
      SELECT doc_id AS qid, lang,
             array_to_string(list_slice(string_split(text, ' '), 3, 5), ' ') AS answer
      FROM documents WHERE doc_id < 50
    ),
    par AS (SELECT doc_id AS cid, lang, text FROM documents WHERE doc_id >= 100)
    SELECT qid, cid, answer, CAST(strpos(text, answer) AS INT) AS first_pos
    FROM ann JOIN par USING (lang)
    WHERE strpos(text, answer) > 0
    """,
)
def curation_answer_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J6 (SQL-checkable form) — candidate equi-join on the blocking key, keep
    # pairs whose paragraph contains the answer; offset via instr.
    d = load(spark, sf_dir, "documents")
    ann = d.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("qid"),
        "lang",
        get_text_section(F.col("text"), 2, 5).alias("answer"),
    )
    par = d.filter(F.col("doc_id") >= 100).select(
        F.col("doc_id").alias("cid"), "lang", "text"
    )
    joined = ann.join(par, on="lang").withColumn(
        "first_pos", F.expr("instr(text, answer)").cast("int")
    )
    return joined.filter(F.col("first_pos") > 0).select("qid", "cid", "answer", "first_pos")


@register(
    "curation_answer_offsets",
    # Constructed answers are word tokens (non-numeric), so the reference's
    # offset search reduces to non-overlapping literal occurrence counting —
    # replace-based counting reproduces finditer's non-overlap semantics.
    """
    WITH ann AS (
      SELECT doc_id AS qid, lang,
             array_to_string(list_slice(string_split(text, ' '), 3, 5), ' ') AS answer
      FROM documents WHERE doc_id < 50
    ),
    par AS (SELECT doc_id AS cid, lang, text FROM documents WHERE doc_id >= 100)
    SELECT qid, cid,
           CAST((length(text) - length(replace(text, answer, ''))) / length(answer) AS INT)
             AS n_matches
    FROM ann JOIN par USING (lang)
    WHERE length(replace(text, answer, '')) < length(text)
    """,
)
def curation_answer_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J6/F10/F11 exact reference semantics — dot-escaped literal search via
    # the pandas UDF (base_kpi_inference_curator.py:129-156).
    d = load(spark, sf_dir, "documents")
    ann = d.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("qid"),
        "lang",
        get_text_section(F.col("text"), 2, 5).alias("answer"),
    )
    par = d.filter(F.col("doc_id") >= 100).select(
        F.col("doc_id").alias("cid"), "lang", "text"
    )
    out = answer_containment_join(ann, par, on=["lang"])
    return out.select("qid", "cid", F.size("answer_start").alias("n_matches"))


@register(
    "curation_extra_answerable",
    """
    WITH ann AS (
      SELECT doc_id AS ann_id, source,
             array_to_string(list_slice(string_split(text, ' '), 2, 4), ' ') AS answer
      FROM documents WHERE doc_id < 30
    ),
    par AS (SELECT doc_id AS page_id, source, text FROM documents)
    SELECT ann_id, COUNT(*) AS n_extra
    FROM ann JOIN par USING (source)
    WHERE page_id != ann_id AND strpos(text, answer) > 0
    GROUP BY ann_id
    """,
)
def curation_extra_answerable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J7 — synthetic-positive discovery on OTHER pages of the same document
    # (kpi_inference_curator.py:468-529): equi-join on the document key
    # (source), exclude the annotated page, containment predicate, count.
    d = load(spark, sf_dir, "documents")
    ann = d.filter(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("ann_id"),
        "source",
        get_text_section(F.col("text"), 1, 4).alias("answer"),
    )
    par = d.select(F.col("doc_id").alias("page_id"), "source", "text")
    joined = (
        ann.join(par, on="source")
        .filter(F.col("page_id") != F.col("ann_id"))
        .filter(F.expr("instr(text, answer)") > 0)
    )
    return joined.groupBy("ann_id").agg(F.count(F.lit(1)).alias("n_extra"))


@register(
    "curation_negative_sample",
    """
    WITH q AS (SELECT DISTINCT p_brand AS kpi_id FROM part),
    pool AS (SELECT doc_id FROM documents WHERE doc_id >= 250),
    ranked AS (
      SELECT kpi_id, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY kpi_id
               ORDER BY md5('neg' || '|' || kpi_id || '|' || CAST(doc_id AS VARCHAR)) ASC
             ) AS rn
      FROM q CROSS JOIN pool
    )
    SELECT kpi_id, doc_id FROM ranked WHERE rn <= 3
    """,
)
def curation_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J11 — deterministic negative pairing: hash-ranked pick of 3 negatives
    # per question (text_curator.py:190-258 rejection loops, made
    # shuffle-stable).
    positives = load(spark, sf_dir, "part").select(F.col("p_brand").alias("kpi_id")).distinct()
    pool = load(spark, sf_dir, "documents").filter(F.col("doc_id") >= 250).select("doc_id")
    out = negative_sample(positives, pool, ["kpi_id"], "doc_id", k=3, salt="neg")
    return out.select("kpi_id", "doc_id")


@register(
    "reshape_flatten",
    """
    SELECT doc_id,
           array_to_string(
             flatten([list_slice(string_split(text, ' '), 1, 3),
                      list_slice(string_split(text, ' '), 4, 6)]), ' ') AS joined
    FROM documents
    """,
)
def reshape_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U7 — flatten list-of-lists (text_curator.py:331-334).
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nested = F.array(F.slice(words, 1, 3), F.slice(words, 4, 3))
    return d.select("doc_id", F.array_join(F.flatten(nested), " ").alias("joined"))


@register(
    "reshape_gather_table_text",
    """
    SELECT doc_id,
      array_to_string(
        list_filter(
          flatten([
            [string_split(text, ' ')[1], '1 234'],
            ['2020', array_to_string(list_slice(string_split(text, ' '), 2, 3), ' '), '  ']
          ]),
          c -> NOT regexp_matches(c, '^\\W*[0-9]*\\W?[0-9]*?\\W*$') AND length(trim(c)) > 0
        ), ', ') AS table_text
    FROM documents
    """,
)
def reshape_gather_table_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U9/F15 — per-table text gathering: drop numeric-only cells, join the
    # rest with ', ' (farm_trainer.py:82-93).
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    cells = F.array(
        F.array(F.element_at(words, 1), F.lit("1 234")),
        F.array(F.lit("2020"), F.array_join(F.slice(words, 2, 2), " "), F.lit("  ")),
    )
    return gather_table_text(d.select("doc_id", cells.alias("cells"))).select(
        "doc_id", "table_text"
    )


@register(
    "pipeline_text_curation",
    # The full curator DAG replayed in SQL.  clean_text is the identity on
    # the synthetic documents table (printable ASCII, no doubled whitespace),
    # so the SQL elides the regex chain; every other stage is replicated
    # operation-for-operation, including the two-delimiter paragraph split,
    # the 1-based→0-based page shift, the year-in-question rewrite, the
    # hash-ranked negative pick, and the keep-positive dedup.
    """
    WITH ann0 AS (
      SELECT source AS company,
             source || '.pdf' AS source_file,
             'Brand#' || CAST((doc_id % 5) * 10 + 11 AS VARCHAR) AS kpi_id,
             CAST(2018 + doc_id % 5 AS INT) AS year,
             [doc_id % 3, doc_id % 3 + 1] AS source_page,
             array_to_string(list_slice(string_split(text, ' '), 3, 5), ' ') AS s1,
             array_to_string(list_slice(string_split(text, ' '), 6, 8), ' ') AS s2
      FROM documents
      WHERE doc_id < 50 AND doc_id % 7 <> 0
    ),
    ann AS (
      SELECT company, source_file, kpi_id, year, source_page,
             string_split_regex(s1 || '", "' || s2, '", "|","') AS paras
      FROM ann0
    ),
    expl AS (
      SELECT a.company, a.source_file, a.kpi_id, a.year,
             a.source_page[t.i] AS page, a.paras[t.i] AS context
      FROM ann a, UNNEST(generate_series(1, len(a.paras))) AS t(i)
    ),
    kpiq AS (
      SELECT kpi_id,
             'What is the exposure of ' || kpi_id || '?' AS question,
             length(kpi_id) % 2 = 0 AS add_year
      FROM (SELECT DISTINCT p_brand AS kpi_id FROM part)
    ),
    pos AS (
      SELECT e.source_file, e.page,
             CASE WHEN k.add_year
                  THEN string_split(k.question, '?')[1]
                       || ' in year ' || CAST(e.year AS VARCHAR) || '?'
                  ELSE k.question END AS question,
             e.context, 1 AS label
      FROM expl e JOIN kpiq k USING (kpi_id)
    ),
    pos_pages AS (SELECT DISTINCT source_file AS pdf_name, page FROM pos),
    pool AS (
      SELECT p.paragraph AS context,
             p.pdf_name || ':' || CAST(p.page AS VARCHAR) || ':' || p.paragraph AS pool_id
      FROM (SELECT source || '.pdf' AS pdf_name,
                   CAST(doc_id % 10 AS INT) AS page,
                   text AS paragraph
            FROM documents) p
      ANTI JOIN pos_pages pp ON p.pdf_name = pp.pdf_name AND p.page = pp.page
    ),
    negranked AS (
      SELECT q.question, pl.context,
             ROW_NUMBER() OVER (
               PARTITION BY q.question
               ORDER BY md5('textneg' || '|' || q.question || '|' || pl.pool_id) ASC
             ) AS rn
      FROM (SELECT DISTINCT question FROM pos) q CROSS JOIN pool pl
    ),
    dataset AS (
      SELECT question, context, label FROM pos
      UNION ALL
      SELECT question, context, 0 AS label FROM negranked WHERE rn <= 2
    )
    SELECT question, context, MAX(label) AS label
    FROM dataset GROUP BY question, context
    """,
)
def pipeline_text_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §3.3 — the full TEXT-curator DAG (filter → filename/page repair →
    # paragraph parse → explode → clean → broadcast KPI join → negative
    # sampling → dedup) over annotation-shaped rows derived from the test
    # tables.  Every stage is individually oracle-checked elsewhere, and
    # determinism under repartitioning is asserted in tests; the registered
    # SQL replays the whole chain so the driver hash-checks the composition.
    from ..pipelines import text_curation_pipeline

    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    s1 = F.array_join(F.slice(words, 3, 3), " ")
    s2 = F.array_join(F.slice(words, 6, 3), " ")
    annotations = d.filter(F.col("doc_id") < 50).select(
        F.col("source").alias("company"),
        F.concat(F.col("source"), F.lit(".pdf")).alias("source_file"),
        F.concat(F.lit("Brand#"), ((F.col("doc_id") % 5) * 10 + 11).cast("string")).alias(
            "kpi_id"
        ),
        (F.lit(2018) + F.col("doc_id") % 5).cast("int").alias("year"),
        F.when(F.col("doc_id") % 7 == 0, "TABLE").otherwise("TEXT").alias("data_type"),
        F.array((F.col("doc_id") % 3 + 1).cast("int"), (F.col("doc_id") % 3 + 2).cast("int")).alias(
            "source_page"
        ),
        F.concat(F.lit('["'), s1, F.lit('", "'), s2, F.lit('"]')).alias("relevant_paragraphs"),
    )
    paragraphs = d.select(
        F.concat(F.col("source"), F.lit(".pdf")).alias("pdf_name"),
        (F.col("doc_id") % 10).cast("int").alias("page"),
        F.col("text").alias("paragraph"),
    )
    kpi = (
        load(spark, sf_dir, "part")
        .select(F.col("p_brand").alias("kpi_id"))
        .distinct()
        .select(
            "kpi_id",
            F.concat(F.lit("What is the exposure of "), F.col("kpi_id"), F.lit("?")).alias(
                "question"
            ),
            (F.length("kpi_id") % 2 == 0).alias("add_year"),
        )
    )
    return text_curation_pipeline(spark, annotations, paragraphs, kpi, neg_pos_ratio=2)


@register(
    "reshape_nest_squad",
    """
    WITH flat AS (
      SELECT source AS source_file,
             array_to_string(list_slice(string_split(text, ' '), 1, 12), ' ') AS context,
             'What is in doc ' || CAST(doc_id AS VARCHAR) || '?' AS question,
             CAST(doc_id AS VARCHAR) AS example_id,
             array_to_string(list_slice(string_split(text, ' '), 2, 3), ' ') AS answer,
             CASE WHEN doc_id % 5 = 0 THEN CAST([] AS INTEGER[])
                  ELSE [2] END AS answer_start
      FROM documents WHERE doc_id < 100
    ),
    qas AS (
      SELECT source_file, context,
             list(struct_pack(
               id := example_id,
               question := question,
               answers := struct_pack(text := answer, answer_start := answer_start),
               is_impossible := len(answer_start) = 0
             ) ORDER BY example_id) AS qas
      FROM flat GROUP BY source_file, context
    ),
    paragraphs AS (
      SELECT source_file,
             list(struct_pack(context := context, qas := qas) ORDER BY context) AS paragraphs
      FROM qas GROUP BY source_file
    )
    SELECT source_file AS title,
           CAST(to_json(paragraphs) AS VARCHAR) AS paragraphs_json
    FROM paragraphs
    """,
)
def reshape_nest_squad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U8 — SQuAD v2 nesting via two-level sorted collect_list(struct)
    # (base_kpi_inference_curator.py:60-127).  The nested array-of-struct
    # result is emitted as a to_json canonical string so the driver's pandas
    # canonicalizer can sort/hash it (nested Python lists are unhashable);
    # nest_to_squad itself still returns the structured form and is covered
    # by test_nest_to_squad_structure.
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    flat = d.select(
        F.col("source").alias("source_file"),
        get_text_section(F.col("text"), 0, 12).alias("context"),
        F.concat(F.lit("What is in doc "), F.col("doc_id").cast("string"), F.lit("?")).alias(
            "question"
        ),
        F.col("doc_id").cast("string").alias("example_id"),
        get_text_section(F.col("text"), 1, 3).alias("answer"),
        F.when(F.col("doc_id") % 5 == 0, F.array().cast("array<int>"))
        .otherwise(F.array(F.lit(2)))
        .alias("answer_start"),
    )
    return nest_to_squad(flat).select(
        "title", F.to_json(F.col("paragraphs")).alias("paragraphs_json")
    )
