"""Scalar Column-expression library (SURVEY.md §2.8, F1-F20) plus the
text-analysis functions an LLM-data pipeline needs (language ID, quality
scoring, token counting, fingerprinting).

Everything here is a pure ``pyspark.sql.functions`` composition — JVM-side,
whole-stage-codegen friendly, no Python in the hot path.
"""

from .text import (
    clean_text,
    clean_text_kpi,
    normalize_text,
    remove_html_tags,
    contains_table,
    is_not_short,
    token_count,
    get_text_section,
    str_w_spaces_to_numeric,
    get_pdf_name_right,
    add_pdf_extension,
    clean_page,
    clean_paragraph,
    clean_paragraph_py,
    parse_string_list,
    year_in_question,
    page_shift,
    numeric_only_cell,
)
from .schema import snakify, snakify_columns, schema_ddl
from .hashing import md5_hex, bucket_of, deterministic_split_flag, stable_shuffle_key
from .analysis import (
    stopword_ratio,
    lang_id,
    quality_score,
    doc_fingerprint,
    word_set,
)

__all__ = [
    "clean_text",
    "clean_text_kpi",
    "normalize_text",
    "remove_html_tags",
    "contains_table",
    "is_not_short",
    "token_count",
    "get_text_section",
    "str_w_spaces_to_numeric",
    "get_pdf_name_right",
    "add_pdf_extension",
    "clean_page",
    "clean_paragraph",
    "clean_paragraph_py",
    "parse_string_list",
    "year_in_question",
    "page_shift",
    "numeric_only_cell",
    "snakify",
    "snakify_columns",
    "schema_ddl",
    "md5_hex",
    "bucket_of",
    "deterministic_split_flag",
    "stable_shuffle_key",
    "stopword_ratio",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "word_set",
]
