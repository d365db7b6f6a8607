"""Property-style tests (SURVEY.md §5 plan): idempotence / closure laws for
the text scalar library, checked with hypothesis on the pure-Python mirrors
and batch-verified against the Column expressions in a single Spark pass.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aicoe_osc_demo_spark.functions import clean_paragraph_py
from aicoe_osc_demo_spark.functions.schema import snakify
from aicoe_osc_demo_spark.operators.curation import find_answer_start

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2060), max_size=80
)
words = st.text(alphabet=st.sampled_from("abcdefg"), min_size=1, max_size=8)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_snakify_idempotent_and_closed(s):
    once = snakify(s)
    # closure: output alphabet is [a-z0-9_] (plus anything casefold keeps)
    assert re.fullmatch(r"[^\s]*", once)
    assert " " not in once and not once.startswith("_") and not once.endswith("_")
    assert snakify(once) == once  # idempotent


@given(st.lists(words, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_clean_paragraph_roundtrip(parts):
    # a well-formed list string parses back to its parts (no delimiter
    # substrings inside the simple alphabet)
    raw = '["' + '", "'.join(parts) + '"]'
    assert clean_paragraph_py(raw) == parts


@given(words, st.lists(words, min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_find_answer_start_offsets_point_at_answer(answer, tokens):
    text = " ".join(tokens)
    for off in find_answer_start(answer, text):
        assert text[off : off + len(answer)] == answer


from hypothesis import assume


@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=100, deadline=None)
def test_numeric_answers_boundary_rules(n):
    answer = str(n)
    # standalone occurrence is always found at the right offset
    assert find_answer_start(answer, f"a {answer} b") == [2]
    # fully digit-embedded occurrence is rejected (pad digit must not occur
    # at the answer's own boundaries, else the pad run contains a shifted
    # one-sided occurrence the reference legitimately accepts)
    assume("9" not in answer)
    assert find_answer_start(answer, f"x 9{answer}9 x") == []


def test_clean_text_column_matches_python_batch(spark):
    # cross-check the Column implementation against a reference Python
    # mirror over a batch of adversarial inputs, one Spark job total
    samples = [
        "“a”  b\t‘c’",
        "   ",
        "x\n\ny",
        "already clean",
        "trail  ",
        "\t\tlead",
        'quotes "stay"',
        "[“gated”]",
        "“mixed [“inner”] outer”",
    ]

    def py_clean(s: str) -> str:
        # base_curator.py:41-48 verbatim
        s = re.sub("(?<=\\[)“", '"', s)
        s = re.sub("”(?=\\])", '"', s)
        s = re.sub("“|”", "", s)
        s = re.sub("\n|\t", " ", s)
        s = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\xff]", "", s)
        s = re.sub("\\s{2,}", " ", s)
        return s

    from aicoe_osc_demo_spark.functions import clean_text

    df = spark.createDataFrame([(s,) for s in samples], ["c"])
    got = [r.out for r in df.select(clean_text(F.col("c")).alias("out")).collect()]
    assert got == [py_clean(s) for s in samples]
