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


# --- round-3 curation ops: pure-Python mirrors of the Column regex chains ---

_TRACK = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?"


def url_norm_py(u: str) -> str:
    u = re.sub(r"#.*$", "", u)
    u = re.sub(_TRACK, "", u)
    u = re.sub(r"[?&]$", "", u)
    return u


_param_key = st.sampled_from(["k", "page", "id", "utm_source", "utm_medium", "gclid", "fbclid"])
_param = st.tuples(_param_key, st.text(alphabet=st.sampled_from("abc123"), max_size=4))


@given(
    st.text(alphabet=st.sampled_from("abcz."), min_size=1, max_size=12),
    st.lists(_param, max_size=4),
    st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_url_normalize_strips_all_tracking_and_is_idempotent(host, params, frag):
    url = "https://" + host + "/p"
    if params:
        url += "?" + "&".join(f"{k}={v}" for k, v in params)
    if frag:
        url += "#frag"
    got = url_norm_py(url)
    # no tracking parameter survives
    assert not re.search(r"[?&](utm_[a-z]+|fbclid|gclid)=", got)
    # every non-tracking param value survives
    for k, v in params:
        if not k.startswith(("utm_", "gclid", "fbclid")):
            assert f"{k}={v}" in got
    # no dangling separators, no fragment
    assert not got.endswith(("?", "&")) and "#" not in got
    assert url_norm_py(got) == got  # idempotent


def test_url_normalize_column_matches_mirror(spark):
    urls = [
        "https://a.com/p?utm_source=x&k=1#f",
        "https://b.io/?gclid=2",
        "https://c.de/p?k=1&utm_medium=m&j=2",
        "https://d.org/p#only-frag",
        "https://e.net/p?utm_campaign=",
    ]
    from aicoe_osc_demo_spark.functions.analysis import url_normalize

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r.url_norm for r in df.select(url_normalize(F.col("u"))).collect()]
    assert got == [url_norm_py(u) for u in urls]


@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=150, deadline=None)
def test_finetune_tree_merge_equals_flat_average(values, n_parts, fold_seed):
    # the finetune_qa contract: average_states(states, ws) ==
    # finalize_state(reduce(merge_states)) for ANY partitioning and ANY
    # merge tree shape — the property that makes the executor-side tree
    # reduction bit-identical to the driver-side flat average
    import pickle

    from aicoe_osc_demo_spark.training import arithmetic_qa_backend

    backend = arithmetic_qa_backend()
    # partition `values` deterministically from fold_seed
    parts: list[list[int]] = [[] for _ in range(n_parts)]
    for i, v in enumerate(values):
        parts[(i * 2654435761 + fold_seed) % n_parts].append(v)
    parts = [p for p in parts if p]

    import pandas as pd

    states, weights = [], []
    for p in parts:
        s, _ = backend.train_step(
            backend.init_state(), pd.DataFrame({"start_position": p})
        )
        states.append(s)
        weights.append(len(p))

    flat = backend.average_states(states, weights)

    # left-fold merge (one tree shape)
    acc, w = states[0], weights[0]
    for s, pw in zip(states[1:], weights[1:]):
        acc = backend.merge_states(acc, w, s, pw)
        w += pw
    assert pickle.loads(backend.finalize_state(acc)) == pickle.loads(flat)

    # balanced-tree merge (a different shape must give the same bits)
    level = list(zip(states, weights))
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level) - 1, 2):
            (s1, w1), (s2, w2) = level[i], level[i + 1]
            nxt.append((backend.merge_states(s1, w1, s2, w2), w1 + w2))
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    assert pickle.loads(backend.finalize_state(level[0][0])) == pickle.loads(flat)


@given(st.integers(min_value=0, max_value=10**6), st.text(max_size=8))
@settings(max_examples=100, deadline=None)
def test_tpe_draws_uniform_and_in_bounds(trial, seed):
    from aicoe_osc_demo_spark.training import _tpe_u, tpe_search

    u = _tpe_u(seed, "prior", trial, "x")
    assert 0.0 <= u < 1.0
    # proposals never escape the declared space, any phase, any dim kind
    out = tpe_search(
        {"a": ("uniform", -2.0, 3.0), "b": ("int", 1, 5), "c": ("loguniform", 1e-4, 1e2)},
        lambda p: p["a"],
        n_trials=8,
        n_startup=2,
        seed=seed or "s",
    )
    for t in out["trials"]:
        assert -2.0 <= t["params"]["a"] <= 3.0
        assert 1 <= t["params"]["b"] <= 5 and isinstance(t["params"]["b"], int)
        assert 1e-4 <= t["params"]["c"] <= 1e2 * (1 + 1e-9)


@given(st.integers(1, 200), st.integers(2, 40), st.integers(0, 20))
@settings(max_examples=200, deadline=None)
def test_chunk_layout_covers_every_word(n_words, chunk, overlap):
    # mirror of chunk_documents' layout arithmetic: full coverage, bounded
    # chunk count, exact overlap between consecutive full chunks
    if overlap >= chunk:
        return
    stride = chunk - overlap
    import math

    n_chunks = max(math.ceil(max(n_words - overlap, 1) / stride), 1)
    covered = set()
    prev = None
    for c in range(n_chunks):
        lo = c * stride
        hi = min(lo + chunk, n_words)
        cur = set(range(lo, min(hi, n_words)))
        covered |= cur
        if prev is not None and hi - lo == chunk and len(prev) == chunk:
            assert len(prev & cur) == overlap
        prev = cur
    assert covered == set(range(n_words))
    # no chunk beyond the doc except the mandatory first
    assert (n_chunks - 1) * stride < n_words or n_chunks == 1



@given(
    st.integers(min_value=0, max_value=2**60 - 1),
    st.sets(st.integers(min_value=0, max_value=59), max_size=5),
)
@settings(max_examples=300, deadline=None)
def test_phash_pigeonhole_band_guarantee(h, flips):
    # The banding recall proof behind phash_near_dup_pairs: any hash within
    # 5 bit flips of another MUST agree with it on at least one of the six
    # 10-bit bands (pigeonhole), so the band equi-join loses no pair the
    # Hamming filter would keep.
    h2 = h
    for j in flips:
        h2 ^= 1 << j
    bands1 = [(h >> (10 * k)) & 1023 for k in range(6)]
    bands2 = [(h2 >> (10 * k)) & 1023 for k in range(6)]
    assert any(a == b for a, b in zip(bands1, bands2))
