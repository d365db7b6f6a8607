"""Text-operator queries (SURVEY.md §2.8 F1-F20 + P6/P7) over the
``documents``/``events``/``part`` test tables.

Where a reference function needs dirty input the test tables don't have
(curly quotes, broken filenames, stringified lists), the query CONSTRUCTS the
dirty value deterministically from table columns first, then applies the
operator — both sides of the oracle see identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import doc_fingerprint, lang_id, quality_score, stopword_ratio
from ..functions.schema import snakify
from ..functions.text import (
    clean_page,
    clean_text,
    clean_text_kpi,
    get_pdf_name_right,
    get_text_section,
    is_not_short,
    parse_string_list,
    remove_html_tags,
    str_w_spaces_to_numeric,
    token_count,
    year_in_question,
)
from . import load, register


@register(
    "text_clean_curator",
    # Reference chain exactly (base_curator.py:41-48).  DuckDB's RE2 has no
    # lookarounds, so the two gated subs are expressed as literal-context
    # replaces ('[“'→'["', '”]'→'"]') — equivalent because the lookaround
    # only asserts a literal bracket that the replacement restores.
    """
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       '[“' || text || '”] “mid”' || chr(9) || chr(7) || chr(10),
                       '\\[“', '["', 'g'),
                     '”\\]', '"]', 'g'),
                   '“|”', '', 'g'),
                 '\\n|\\t', ' ', 'g'),
               '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\xff]', '', 'g'),
             '\\s{2,}', ' ', 'g') AS cleaned
    FROM documents
    """,
)
def text_clean_curator(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1 — curator clean_text (base_curator.py:33-49) over a dirty input that
    # exercises every sub: lookaround-gated '[“'/'”]' straightening, deletion
    # of ungated curls ('“mid”' → 'mid'), tab/newline → space, control-char
    # (BEL) deletion, whitespace collapse, and the no-trim quirk (result
    # keeps one trailing space).
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(F.lit("[“"), F.col("text"), F.lit("”] “mid”\t\x07\n"))
    return d.select("doc_id", clean_text(dirty).alias("cleaned"))


@register(
    "text_clean_kpi",
    # Reference chain exactly (base_kpi_inference_curator.py:24-58): the
    # F1-style quote/newline/collapse steps (note: '\n' only — tabs are NOT
    # substituted), then per-char deletion of the 13 regex metachars
    # ()^+*$|\\?[]{} (no '<'/'>'), then lowercase, then '\\.{2,}' runs are
    # DELETED (no space, no re-collapse, no trim).
    """
    SELECT doc_id,
           regexp_replace(
             lower(
               translate(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           text || ' [“CO2”] (A+B)* ... {x|y}? $5 ^2',
                           '\\[“', '["', 'g'),
                         '”\\]', '"]', 'g'),
                       '“|”', '', 'g'),
                     '\\n', ' ', 'g'),
                   '\\s{2,}', ' ', 'g'),
                 '()^+*$|\\?[]{}', '')),
             '\\.{2,}', '', 'g') AS cleaned
    FROM documents
    """,
)
def text_clean_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F2 — KPI clean_text over a dirty input exercising the gated-quote subs,
    # metachar deletion ('(A+B)*' → 'AB'), lowercasing, and the
    # dots-deleted-after-collapse quirk (' ... ' → '  ', a double space).
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(F.col("text"), F.lit(" [“CO2”] (A+B)* ... {x|y}? $5 ^2"))
    return d.select("doc_id", clean_text_kpi(dirty).alias("cleaned"))


@register(
    "text_remove_html",
    """
    SELECT doc_id,
           regexp_replace('<b>' || source || '</b> <i>' || text || '</i>', '<[^>]+>\\s?', '', 'g') AS stripped
    FROM documents
    """,
)
def text_remove_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F13 (nq_utils.py:19-21).
    d = load(spark, sf_dir, "documents")
    html = F.concat(F.lit("<b>"), F.col("source"), F.lit("</b> <i>"), F.col("text"), F.lit("</i>"))
    return d.select("doc_id", remove_html_tags(html).alias("stripped"))


@register(
    "text_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           len(string_split(text, ' ')) > 10 AS long_enough,
           array_to_string(list_slice(string_split(text, ' '), 1, 10), ' ') AS head_section
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F12/F14/P6 — token count, length predicate, token slice.
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        is_not_short(F.col("text"), 10).alias("long_enough"),
        get_text_section(F.col("text"), 0, 10).alias("head_section"),
    )


@register(
    "text_regex_filter",
    """
    SELECT doc_id, n_chars FROM documents
    WHERE regexp_matches(text, 'spark [a-z]+ table')
    """,
)
def text_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P7 — regex predicate (nq_utils.py:11-16 contains_table shape).
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("spark [a-z]+ table"))
        .select("doc_id", "n_chars")
    )


@register(
    "text_numeric_repair",
    """
    SELECT doc_id,
           CAST(replace(replace(CAST(doc_id AS VARCHAR) || ' ' || CAST(n_chars AS VARCHAR) || ',5', ' ', ''), ',', '.') AS DOUBLE) AS parsed_value
    FROM documents
    """,
)
def text_numeric_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F5 — "1 234,5" → 1234.5 (demo1-create-tables.ipynb cells 9, 11).
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("doc_id").cast("string"), F.lit(" "), F.col("n_chars").cast("string"), F.lit(",5")
    )
    return d.select("doc_id", str_w_spaces_to_numeric(dirty).alias("parsed_value"))


@register(
    "text_filename_repair",
    # Reference semantics exactly (qa_utils.py:76-87): first-".pdf" split for
    # names already ending in .pdf; ",pdf" typo; otherwise trim + append.
    """
    SELECT doc_id,
      CASE
        WHEN raw LIKE '%.pdf' THEN trim(split_part(raw, '.pdf', 1)) || '.pdf'
        WHEN raw LIKE '%,pdf' THEN trim(split_part(raw, ',pdf', 1)) || '.pdf'
        ELSE trim(raw) || '.pdf'
      END AS pdf_name
    FROM (
      SELECT doc_id,
        CASE doc_id % 4
          WHEN 0 THEN source || ',pdf'
          WHEN 1 THEN source || '.pdf.pdf'
          WHEN 2 THEN ' ' || source || ' '
          ELSE source || '.pdf'
        END AS raw
      FROM documents
    )
    """,
)
def text_filename_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F6 — get_pdf_name_right (qa_utils.py:76-87) over the four failure modes.
    d = load(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("source"), F.lit(",pdf")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.col("source"), F.lit(".pdf.pdf")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit(" "), F.col("source"), F.lit(" ")))
        .otherwise(F.concat(F.col("source"), F.lit(".pdf")))
    )
    return d.select("doc_id", get_pdf_name_right(raw).alias("pdf_name"))


@register(
    "text_clean_page",
    # Includes the reference's zero-padded case ('[1, 02]') that strict JSON
    # parsing would reject — each element is int-normalized (qa_utils.py:93-98).
    """
    SELECT doc_id,
           l[1] AS first_page,
           l[2] AS second_page,
           CAST(len(l) AS INT) AS n_pages
    FROM (
      SELECT doc_id,
             list_transform(
               string_split(regexp_replace(raw, '^\\[|\\]$', '', 'g'), ','),
               x -> CAST(trim(x) AS INT)) AS l
      FROM (
        SELECT doc_id,
               '[' || CAST(doc_id % 10 AS VARCHAR) || ', 0' || CAST(doc_id % 7 AS VARCHAR) || ']' AS raw
        FROM documents
      )
    )
    """,
)
def text_clean_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F7 — clean_page "[1, 02]" → [1, 2] (qa_utils.py:93-98).
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("["),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(", 0"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("]"),
    )
    pages = clean_page(raw)
    return d.select(
        "doc_id",
        F.element_at(pages, 1).alias("first_page"),
        F.element_at(pages, 2).alias("second_page"),
        F.size(pages).alias("n_pages"),
    )


@register(
    "text_parse_string_list",
    """
    SELECT doc_id,
           CAST(json_array_length(CAST(replace(raw, '''', '"') AS JSON)) AS INT) AS n_items,
           json_extract_string(CAST(replace(raw, '''', '"') AS JSON), '$[0]') AS first_item
    FROM (
      SELECT doc_id, '[''' || source || ''', ''' || lang || ''']' AS raw FROM documents
    )
    """,
)
def text_parse_string_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F8 — literal_eval of a single-quoted stringified list → from_json
    # (text_curator.py:260-299).
    d = load(spark, sf_dir, "documents")
    raw = F.concat(F.lit("['"), F.col("source"), F.lit("', '"), F.col("lang"), F.lit("']"))
    parsed = parse_string_list(raw)
    return d.select(
        "doc_id",
        F.size(parsed).alias("n_items"),
        F.element_at(parsed, 1).alias("first_item"),
    )


@register(
    "text_clean_paragraph",
    # F9 — the KPI curator's quirky paragraph-list parser: bracket-typo
    # repair (opener first, closer only if opener was fine), reject
    # unparseable, drop the '["' '"]' framing, split the body on BOTH
    # delimiters '", "' and '","' in position order.
    """
    SELECT doc_id,
           CASE WHEN valid THEN CAST(len(parts) AS INT) ELSE NULL END AS n_parts,
           CASE WHEN valid THEN parts[1] ELSE NULL END AS first_part
    FROM (
      SELECT doc_id, valid,
             string_split_regex(substr(fixed, 3, greatest(length(fixed) - 4, 0)), '", "|","') AS parts
      FROM (
        SELECT doc_id,
               fixed LIKE '[%' AND fixed LIKE '%]' AS valid,
               fixed
        FROM (
          SELECT doc_id,
            CASE
              WHEN substr(raw, 1, 1) IN ('{', ']') THEN '[' || substr(raw, 2)
              WHEN substr(raw, length(raw), 1) IN ('}', '[') THEN substr(raw, 1, length(raw) - 1) || ']'
              ELSE raw
            END AS fixed
          FROM (
            SELECT doc_id,
              CASE doc_id % 4
                WHEN 0 THEN '["' || s1 || '", "' || s2 || '"]'
                WHEN 1 THEN '{"' || s1 || '","' || s2 || '"]'
                WHEN 2 THEN '["' || s1 || '", "' || s2 || '","' || s1 || '"['
                ELSE 'garbage ' || s1
              END AS raw
            FROM (
              SELECT doc_id,
                     array_to_string(list_slice(string_split(text, ' '), 1, 2), ' ') AS s1,
                     array_to_string(list_slice(string_split(text, ' '), 3, 4), ' ') AS s2
              FROM documents
            )
          )
        )
      )
    )
    """,
)
def text_clean_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import clean_paragraph

    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    s1 = F.array_join(F.slice(words, 1, 2), " ")
    s2 = F.array_join(F.slice(words, 3, 2), " ")
    raw = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit('["'), s1, F.lit('", "'), s2, F.lit('"]')))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit('{"'), s1, F.lit('","'), s2, F.lit('"]')))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit('["'), s1, F.lit('", "'), s2, F.lit('","'), s1, F.lit('"[')),
        )
        .otherwise(F.concat(F.lit("garbage "), s1))
    )
    parts = clean_paragraph(raw)
    return d.select(
        "doc_id",
        F.size(parts).alias("n_parts"),
        F.element_at(parts, 1).alias("first_part"),
    )


@register(
    "text_year_in_question",
    """
    SELECT p_partkey,
      CASE WHEN p_size % 2 = 0
           THEN string_split(q, '?')[1] || ' in year ' || CAST(2020 + p_size % 5 AS VARCHAR) || '?'
           ELSE q
      END AS question
    FROM (SELECT p_partkey, p_size, 'What is the total ' || p_type || '?' AS q FROM part)
    """,
)
def text_year_in_question(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F17 — year-suffix question rewrite (kpi_inference_curator.py:121-125).
    p = load(spark, sf_dir, "part")
    q = F.concat(F.lit("What is the total "), F.col("p_type"), F.lit("?"))
    year = F.lit(2020) + F.col("p_size") % 5
    add_year = F.col("p_size") % 2 == 0
    return p.select("p_partkey", year_in_question(q, year, add_year).alias("question"))


@register(
    "text_page_shift",
    """
    SELECT event_id, CAST(user_id AS INT) + 1 AS page_1based, CAST(user_id AS INT) - 1 AS page_0based
    FROM events
    """,
)
def text_page_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F18 — the ±1 page-convention shift, preserved exactly
    # (text_curator.py:217,330).
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("user_id").cast("int") + 1).alias("page_1based"),
        (F.col("user_id").cast("int") - 1).alias("page_0based"),
    )


@register(
    "text_snakify_columns",
    "SELECT p_partkey AS part_key_id, p_retailprice AS avg_retail_price FROM part",
)
def text_snakify_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F3 — snakify normalization of ugly BI column names
    # (demo1-create-tables.ipynb cell 9): the Spark side renames through
    # snakify(); the oracle states the expected canonical names.
    p = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("Part  Key: ID"),
        F.col("p_retailprice").alias("Average Retail Price!"),
    )
    renamed = p.toDF(*[snakify(c) for c in p.columns])
    assert renamed.columns == ["part_key_id", "avg_retail_price"]
    return renamed


# --------------------------------------------------------------------------
# Text-analysis operators (LLM-pipeline surface)
# --------------------------------------------------------------------------

_SW_SQL = "('the','a','an','and','of','to','in','is','for','on')"


@register(
    "text_lang_id",
    f"""
    SELECT doc_id, lang,
           ROUND(CAST(len(list_filter(string_split(text, ' '), w -> w IN {_SW_SQL})) AS DOUBLE)
                 / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE), 6) AS sw_ratio,
           CASE WHEN CAST(len(list_filter(string_split(text, ' '), w -> w IN {_SW_SQL})) AS DOUBLE)
                     / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE) >= 0.05
                THEN 'en' ELSE 'unknown' END AS lang_pred
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Language-ID heuristic: stopword-hit ratio (pure column expression).
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.round(stopword_ratio(F.col("text")), 6).alias("sw_ratio"),
        lang_id(F.col("text")).alias("lang_pred"),
    )


_TRI_PHRASES = {
    0: " the thing and the nation for the motion",
    1: " der dichter und die schlechte kinder hier",
    2: " le jour les maisons des fleurs que est une",
}
# injected 3x so the injected language's trigram occurrences dominate the
# English-ish base text (fixture-injection pattern: identical construction
# in Spark and the oracle makes the classifier value-checkable on a
# monolingual synthetic corpus)
_TRI_SQL_TEXT = (
    "text || CASE doc_id % 3 "
    + " ".join(
        f"WHEN {k} THEN repeat('{v}', 3)" for k, v in _TRI_PHRASES.items()
    )
    + " END"
)


def _tri_score_sql(txt: str, prof: str) -> str:
    tg = f"list_transform(generate_series(1, greatest(length({txt}) - 2, 1)), i -> substr({txt}, i, 3))"
    return f"len(list_filter({tg}, x -> list_contains({prof}, x)))"


def _lang_trigram_sql() -> str:
    de = _tri_score_sql("t", "['der', 'die', 'und', 'ich', 'ein', 'sch', 'cht', 'nde']")
    en = _tri_score_sql("t", "['the', 'and', 'ing', 'ion', 'tio', 'for', 'tha', 'ent']")
    fr = _tri_score_sql("t", "['le ', 'les', 'des', 'que', 'ais', 'est', 'une', 'eur']")
    # fold in ascending language order, strict > to advance — mirrors
    # functions/analysis.py:lang_id_trigram exactly (ties -> earlier lang)
    return f"""
    WITH aug AS (SELECT doc_id, {_TRI_SQL_TEXT} AS t FROM documents),
    scores AS (SELECT doc_id, {de} AS s_de, {en} AS s_en, {fr} AS s_fr FROM aug),
    fold AS (
      SELECT doc_id, s_fr,
             CASE WHEN s_en > s_de THEN s_en ELSE s_de END AS s1,
             CASE WHEN s_en > s_de THEN 'en' ELSE 'de' END AS l1
      FROM scores
    )
    SELECT doc_id, CASE WHEN s_fr > s1 THEN 'fr' ELSE l1 END AS lang_pred
    FROM fold
    """


@register("text_lang_id_trigram", _lang_trigram_sql())
def text_lang_id_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Char-trigram n-gram language classifier (the multi-language upgrade of
    # text_lang_id's stopword gate): occurrences hitting per-language
    # profile sets, argmax with deterministic ties.  Pure Column pipeline —
    # per-row map over the scan, zero shuffle.  The query injects a
    # language phrase by doc_id % 3 so the monolingual synthetic corpus
    # exercises all three classes, value-checked against the oracle.
    from ..functions.analysis import lang_id_trigram
    from ..operators.relational import ensure_parallelism

    # classifier scoring is a compute-heavy narrow stage (24 literal
    # replaces per row); single-file inputs must not serialize it onto one
    # task — no-op on well-partitioned inputs
    d = ensure_parallelism(load(spark, sf_dir, "documents"))
    phrase = None
    for k, v in _TRI_PHRASES.items():
        branch = F.repeat(F.lit(v), 3)
        phrase = (
            F.when(F.col("doc_id") % 3 == k, branch)
            if phrase is None
            else phrase.when(F.col("doc_id") % 3 == k, branch)
        )
    aug = F.concat(F.col("text"), phrase)
    return d.select("doc_id", lang_id_trigram(aug).alias("lang_pred"))


@register(
    "text_quality_score",
    """
    SELECT doc_id,
      ROUND((least(CAST(greatest(len(string_split(text,' ')),1) AS DOUBLE) / 100.0, 1.0)
        + (CASE WHEN CAST(greatest(length(text),1) AS DOUBLE) / CAST(greatest(len(string_split(text,' ')),1) AS DOUBLE) BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
        + (CASE WHEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text),1) AS DOUBLE) <= 0.1 THEN 1.0
                ELSE greatest(0.0, 1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text),1) AS DOUBLE)) END)
      ) / 3.0, 6) AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pretraining-corpus quality filter score.
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(quality_score(F.col("text")), 6).alias("quality"))


@register(
    "text_group_concat",
    # listagg/string_agg with deterministic ordering — the "gather paragraphs
    # per page" shape (pdf_text_extractor page dict) as a portable aggregate.
    """
    SELECT lang,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def text_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "text_bpe_token_count",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[^A-Za-z\\s]')) AS INT) AS bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Token counting for data budgeting: whitespace tokens + a BPE-ish regex
    # estimate (greedy <=4-letter chunks + non-letter symbols) — the cheap
    # proxy pipelines use before a real tokenizer pass.
    d = load(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]{1,4}|[^A-Za-z\s]"), F.lit(0)))
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Document fingerprinting — md5 of normalized text.
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "text_winnow_fingerprint",
    # Winnowing (MOSS): positional 3-gram 32-bit hashes → minima over a
    # 4-hash sliding window → distinct sorted minima.  The oracle replays
    # the identical rolling scheme in DuckDB (md5-prefix hashes are
    # bit-identical across engines).
    """
    SELECT doc_id,
           CAST(len(fps) AS INT) AS n_fps,
           fps[1] AS min_fp,
           fps[len(fps)] AS max_fp
    FROM (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(1, greatest(len(hashes) - 3, 1) + 1),
               i -> list_aggregate(list_slice(hashes, i, i + 3), 'min')
             ))) AS fps
      FROM (
        SELECT doc_id,
               list_transform(
                 list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
                 ),
                 g -> CAST('0x' || substr(md5(g), 1, 8) AS BIGINT)
               ) AS hashes
        FROM documents
      )
    )
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rolling-hash winnowing fingerprints (Schleimer et al. SIGMOD'03) —
    # the near-dup fingerprint family beyond plain md5 (text_fingerprint).
    # Exploded + sliding-window-min shape; see operators/dedup.py.
    from ..operators.dedup import winnow_fingerprints

    d = load(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, "text", "doc_id", k=3, window=4)
    f = F.col("fingerprints")
    return fps.select(
        "doc_id",
        F.size(f).alias("n_fps"),
        F.element_at(f, 1).alias("min_fp"),
        F.element_at(f, -1).alias("max_fp"),
    )


@register(
    "text_char_entropy",
    # Identical nanobit-quantized -p*log2(p) terms summed as integers, so
    # the per-doc sum is independent of char iteration order; the final
    # 6dp rounding is integer half-up (floor((nb+500)/1000)/1e6) because
    # engine ROUND disagrees when the sum lands exactly on .5.
    """
    WITH ch AS (
      SELECT doc_id, unnest(split(text, '')) AS c, length(text) AS len
      FROM documents WHERE length(text) > 0
    ), cnt AS (
      SELECT doc_id, len, c, COUNT(*) AS k FROM ch GROUP BY 1, 2, 3
    ), term AS (
      SELECT doc_id, len,
             CAST(floor(-((k / CAST(len AS DOUBLE))
                          * (ln(k / CAST(len AS DOUBLE)) / ln(2.0))) * 1e9 + 0.5)
                  AS BIGINT) AS t
      FROM cnt
    )
    SELECT doc_id, CAST(MAX(len) AS BIGINT) AS n_chars,
           floor((CAST(SUM(t) AS BIGINT) + 500) / 1000.0) / 1e6 AS entropy_bits
    FROM term GROUP BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-document Shannon entropy of the character distribution -- the
    # model-free information-density filter next to the repetition/C4
    # rules.  The per-char run-length aggregate is an interpreted HOF (a
    # compute-heavy narrow stage), so single-row-group inputs must not
    # serialize it onto one task — ensure_parallelism spreads the scan
    # (no-op on well-partitioned 100 TB inputs).
    from ..functions.text import char_entropy
    from ..operators.relational import ensure_parallelism

    return (
        ensure_parallelism(load(spark, sf_dir, "documents"))
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            char_entropy("text").alias("entropy_bits"),
        )
    )


@register(
    "text_readability",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables,
           CASE WHEN len(regexp_extract_all(text, '[A-Za-z]+')) > 0
                 AND len(regexp_extract_all(text, '[.!?]+')) > 0
                THEN ROUND(206.835
                     - 1.015 * (len(regexp_extract_all(text, '[A-Za-z]+'))
                                / CAST(len(regexp_extract_all(text, '[.!?]+')) AS DOUBLE))
                     - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))
                               / CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE)),
                     6)
           END AS flesch
    FROM documents
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flesch reading-ease per document from three map-side regexp counts
    # -- the readability gate next to quality_score/C4 rules; zero
    # shuffles, documents score at scan speed.
    from ..functions.text import readability_features

    return load(spark, sf_dir, "documents").select(
        "doc_id", *readability_features("text")
    )
