"""Text-cleaning scalar functions, F1-F20 of SURVEY.md §2.8.

Each function re-expresses one reference scalar as a Spark Column expression
(regexp chains stay inside whole-stage codegen — no Python UDFs).  Reference
citations give the semantics being matched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# The 13 regex metacharacters the KPI curator deletes one-by-one
# (base_kpi_inference_curator.py:35-50).  NOTE: no '<', '>', and no '.'.
_KPI_SPECIAL_CHARS = "()^+*$|\\?[]{}"


def clean_text(c: Column) -> Column:
    """F1 — curator-flavor clean_text, replicating
    /root/reference/src/components/preprocessing/base_curator.py:33-49
    sub-by-sub:

    1. ``(?<=\\[)“`` → ``"``  (curly open straightened only right after ``[``)
    2. ``”(?=\\])`` → ``"``   (curly close straightened only right before ``]``)
    3. remaining ``“``/``”`` are DELETED (not straightened)
    4. ``\\n|\\t`` → space
    5. control + U+007F–U+00FF chars deleted
    6. whitespace runs collapsed to one space

    Single quotes are untouched and the result is NOT trimmed — both quirks
    are part of the contract (a trailing ``\\t`` leaves one trailing space).
    """
    c = F.regexp_replace(c, "(?<=\\[)“", '"')
    c = F.regexp_replace(c, "”(?=\\])", '"')
    c = F.regexp_replace(c, "“|”", "")
    c = F.regexp_replace(c, "\\n|\\t", " ")
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\xff]", "")
    c = F.regexp_replace(c, "\\s{2,}", " ")
    return c


def clean_text_kpi(c: Column) -> Column:
    """F2 — KPI-flavor clean_text, replicating
    base_kpi_inference_curator.py:16-58 sub-by-sub.  Differences from F1,
    kept exactly:

    - step 4 substitutes ``\\n`` ONLY (tabs survive into the ``\\s{2,}``
      collapse, so a lone tab stays a tab);
    - after the F1-style chain: delete the 13 regex metacharacters
      ``()^+*$|\\?[]{}`` (NOT ``<``/``>``), then lowercase, then DELETE
      ``\\.{2,}`` runs (no space substituted, no re-collapse, no trim —
      deleting ``...`` between two spaces leaves a double space).
    """
    c = F.regexp_replace(c, "(?<=\\[)“", '"')
    c = F.regexp_replace(c, "”(?=\\])", '"')
    c = F.regexp_replace(c, "“|”", "")
    c = F.regexp_replace(c, "\\n", " ")
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\xff]", "")
    c = F.regexp_replace(c, "\\s{2,}", " ")
    c = F.translate(c, _KPI_SPECIAL_CHARS, "")
    c = F.lower(c)
    c = F.regexp_replace(c, "\\.{2,}", "")
    return c


def normalize_text(c: Column) -> Column:
    """Extended curator-style normalizer (NOT the reference function —
    ``clean_text`` is the faithful one).  Straightens the full curly-quote
    families, maps single-quote variants, and trims; useful as a modern
    pretraining-corpus normalizer."""
    c = F.regexp_replace(c, "[“”„‟″‶]", '"')
    c = F.regexp_replace(c, "[‘’‚‛′‵]", "'")
    c = F.regexp_replace(c, "[\\n\\t]", " ")
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\xff]", "")
    c = F.regexp_replace(c, "\\s{2,}", " ")
    return F.trim(c)


def remove_html_tags(c: Column) -> Column:
    """F13 (ref: /root/reference/src/components/utils/nq_utils.py:19-21)."""
    return F.regexp_replace(c, "<[^>]+>\\s?", "")


def contains_table(c: Column) -> Column:
    """F14a — rlike ``<Table>.*</Table>`` (ref: nq_utils.py:11-16)."""
    return c.rlike("<Table>.*</Table>")


def is_not_short(c: Column, min_tokens: int = 10) -> Column:
    """F14b — whitespace token count > threshold (ref: nq_utils.py:24-26)."""
    return F.size(F.split(c, " ")) > min_tokens


def token_count(c: Column) -> Column:
    """Whitespace token count (quality predicates P6; ref:
    farm_trainer.py:116-117)."""
    return F.size(F.split(c, " "))


def get_text_section(c: Column, start: int, end: int) -> Column:
    """F12 — token slice ``doc.split(' ')[start:end]`` re-joined
    (ref: nq_utils.py:6-8)."""
    return F.array_join(F.slice(F.split(c, " "), start + 1, end - start), " ")


def str_w_spaces_to_numeric(c: Column) -> Column:
    """F5 — ``"1 234,5" → 1234.5``: drop spaces, comma→dot, cast double
    (ref: demo1-create-tables.ipynb cells 9, 11)."""
    return F.regexp_replace(F.regexp_replace(c, " ", ""), ",", ".").cast("double")


def get_pdf_name_right(c: Column) -> Column:
    """F6 — repair messy pdf filenames, replicating
    /root/reference/src/components/utils/qa_utils.py:76-87 EXACTLY:

    - endswith ".pdf"  → everything before the FIRST ".pdf", trimmed, + ".pdf"
      (so "a.pdf.pdf" → "a.pdf", and "a.pdfX.pdf" → "a.pdf" — quirk kept);
    - endswith ",pdf"  → before the FIRST ",pdf", trimmed, + ".pdf";
    - otherwise        → trimmed + ".pdf" (so " x.pdf " → "x.pdf.pdf",
      because the reference tests endswith on the UNtrimmed name — quirk
      kept).
    """
    return (
        F.when(c.rlike("\\.pdf$"), F.concat(F.trim(F.substring_index(c, ".pdf", 1)), F.lit(".pdf")))
        .when(c.rlike(",pdf$"), F.concat(F.trim(F.substring_index(c, ",pdf", 1)), F.lit(".pdf")))
        .otherwise(F.concat(F.trim(c), F.lit(".pdf")))
    )


def add_pdf_extension(c: Column) -> Column:
    """F20 (ref: kpi_inference_curator.py:561-569)."""
    return F.concat(c, F.lit(".pdf"))


def clean_page(c: Column) -> Column:
    """F7 — ``"[1, 02]"`` → ``[1, 2]``; null if not bracketed
    (ref: qa_utils.py:93-98 — the reference int-normalizes each
    comma-separated element, which also fixes zero-padded pages like '02'
    that strict JSON parsing would reject)."""
    inner = F.regexp_replace(c, "^\\[|\\]$", "")
    parsed = F.transform(F.split(inner, ","), lambda x: F.trim(x).cast("int"))
    return F.when(c.rlike("^\\[.*\\]$"), parsed).otherwise(F.lit(None))


def clean_paragraph_py(r: str | None) -> list[str] | None:
    """F9 — the KPI curator's quirky relevant-paragraphs parser
    (ref: kpi_inference_curator.py:194-271), reimplemented to its intent:

    - strip; repair single bracket/brace typos ('{'/']' opener → '[',
      '}'/'[' closer → ']');
    - reject (None) anything still not '[...]'-delimited;
    - drop the '["' / '"]' framing and split the body on BOTH paragraph
      delimiters '", "' and '","' in position order.

    The reference merges the two delimiter streams with a two-pointer loop
    (which crashes when one stream exhausts first — a latent bug); the
    position-ordered regex alternation produces the same segments on every
    input the reference survives.
    """
    if r is None:
        return None
    strp = r.strip()
    if not strp:
        return None
    if strp[0] in "{]":
        strp = "[" + strp[1:]
    elif strp[-1] in "}[":
        strp = strp[:-1] + "]"
    if not (strp.startswith("[") and strp.endswith("]")):
        return None
    import re as _re

    return _re.split('", "|","', strp[2:-2])


def clean_paragraph(c: Column) -> Column:
    """F9 as a pure Column expression (same semantics as
    ``clean_paragraph_py``).  The bracket-typo repair mirrors the
    reference's if/elif: the closer is only repaired when the opener was
    already fine."""
    strp = F.trim(c)
    head = F.substring(strp, 1, 1)
    tail = strp.substr(F.length(strp), F.lit(1))
    opener_bad = head.isin("{", "]")
    closer_bad = tail.isin("}", "[")
    fixed = (
        F.when(opener_bad, F.concat(F.lit("["), strp.substr(F.lit(2), F.length(strp))))
        .when(closer_bad, F.concat(strp.substr(F.lit(1), F.length(strp) - 1), F.lit("]")))
        .otherwise(strp)
    )
    valid = fixed.rlike("^\\[") & fixed.rlike("\\]$")
    body = fixed.substr(F.lit(3), F.greatest(F.length(fixed) - 4, F.lit(0)))
    parts = F.split(body, '", "|","')
    return F.when(valid & (F.length(strp) > 0), parts).otherwise(F.lit(None))


def parse_string_list(c: Column) -> Column:
    """F8 — tolerant ``ast.literal_eval`` of a stringified list; malformed →
    null (ref: text_curator.py:260-299).  Single-quoted python lists are
    normalized to JSON before parsing."""
    normalized = F.regexp_replace(c, "'", '"')
    return F.from_json(normalized, "array<string>")


def year_in_question(question: Column, year: Column, add_year: Column) -> Column:
    """F17 — ``q.split('?')[0] + ' in year {y}?'`` when the KPI wants a year
    (ref: kpi_inference_curator.py:121-125)."""
    rewritten = F.concat(
        F.split(question, "\\?").getItem(0), F.lit(" in year "), year.cast("string"), F.lit("?")
    )
    return F.when(add_year, rewritten).otherwise(question)


def page_shift(c: Column, delta: int) -> Column:
    """F18 — the 1-based (annotation) vs 0-based (extraction) page-number
    convention shift; must be exact (ref: text_curator.py:217,330)."""
    return (c.cast("int") + delta).alias("page")


def numeric_only_cell(c: Column) -> Column:
    """F15 — detector for number-only table cells, dropped before gathering
    table text (ref: farm_trainer.py:88-91)."""
    return c.rlike("^\\W*[0-9]*\\W?[0-9]*?\\W*$")


def char_entropy(text_col: str) -> Column:
    """Shannon entropy (bits/char) of a string's character distribution --
    the information-density quality signal: boilerplate and repeated
    filler score low, natural prose ~4 bits, random noise high.  Useful
    next to the repetition/C4 rules as a cheap model-free filter.

    Pure codegen'd expression -- ONE char-array materialization per row
    (the array appears exactly once, inside array_sort), then a single
    run-length aggregate pass turns sorted runs into -p*log2(p) terms;
    O(len log len) per document instead of the naive
    O(distinct x len) repeated-scan form (measured 15x faster on the
    documents table).  Zero shuffles: 100 TB of documents score at scan
    speed.  Each term is quantized to integer nanobits before the sum,
    so the per-document value is independent of char order and replays
    bit-identically in any engine.

    Takes the column NAME (the expression inlines it).
    """
    t = text_col
    chars = f"transform(sequence(1, length({t})), i -> substring({t}, i, 1))"
    term = (
        lambda k: f"bigint(floor(-(({k} / cast(length({t}) as double))"
        f" * (ln({k} / cast(length({t}) as double)) / ln(2.0))) * 1e9 + 0.5))"
    )
    agg = (
        f"aggregate(array_sort({chars}), "
        f"named_struct('p', cast(null as string), 'r', bigint(0), 'a', bigint(0)), "
        f"(s, c) -> IF(s.p IS NULL OR c = s.p, "
        f"named_struct('p', c, 'r', s.r + bigint(1), 'a', s.a), "
        f"named_struct('p', c, 'r', bigint(1), 'a', s.a + {term('s.r')})), "
        f"s -> s.a + IF(s.r > bigint(0), {term('s.r')}, bigint(0)))"
    )
    # final 6dp rounding in INTEGER arithmetic: a nanobit sum landing
    # exactly on the half boundary (e.g. ...7500) rounds differently
    # under Spark's decimal HALF_UP vs DuckDB's ROUND — floor((nb+500)
    # /1000) is the same long in any engine (bit this at sf0.1: 3 of
    # 5000 docs sat exactly on the boundary)
    return F.when(
        F.length(F.col(t)) > 0,
        F.floor((F.expr(agg) + F.lit(500)).cast("double") / 1000.0).cast("double")
        / F.lit(1e6),
    ).otherwise(F.lit(0.0))


def readability_features(text_col: str) -> list[Column]:
    """Flesch reading-ease features from three regexp counts -- words,
    sentences ([.!?] runs), and a vowel-group syllable estimate (the
    standard cheap heuristic).  All map-side codegen'd counts; the score
    is 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words), the
    classic curation-side readability gate (too-low = dense boilerplate,
    too-high = fragment noise).  Returns [n_words, n_sentences,
    n_syllables, flesch] columns; rows need n_words/n_sentences > 0
    guards upstream (the engine emits NULL score otherwise).
    """
    t = text_col
    words = F.expr(f"size(regexp_extract_all({t}, '[A-Za-z]+', 0))").cast("long")
    sents = F.expr(f"size(regexp_extract_all({t}, '[.!?]+', 0))").cast("long")
    sylls = F.expr(
        f"size(regexp_extract_all(lower({t}), '[aeiouy]+', 0))"
    ).cast("long")
    flesch = F.when(
        (words > 0) & (sents > 0),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (words.cast("double") / sents.cast("double"))
            - F.lit(84.6) * (sylls.cast("double") / words.cast("double")),
            6,
        ),
    )
    return [
        words.alias("n_words"),
        sents.alias("n_sentences"),
        sylls.alias("n_syllables"),
        flesch.alias("flesch"),
    ]
