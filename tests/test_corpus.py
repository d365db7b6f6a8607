"""BM25 retrieval, sequence packing, document chunking."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aicoe_osc_demo_spark.operators.corpus import bm25_topk, chunk_documents, pack_offset_bins


def test_bm25_ranks_matching_doc_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple apple apple apple"),
            (3, "dog cat fish"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(10, "apple banana")], "q_id long, q_text string")
    rows = bm25_topk(docs, qs, k=3).orderBy("rank").collect()
    # doc 3 shares no terms -> absent; doc 1 matches both query terms
    assert [r.doc_id for r in rows] == [1, 2]
    assert rows[0].score > rows[1].score
    assert [r.rank for r in rows] == [1, 2]


def test_bm25_score_formula(spark):
    # single doc, single term: score = idf * tf(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    docs = spark.createDataFrame([(1, "x y"), (2, "z w")], "doc_id long, text string")
    qs = spark.createDataFrame([(0, "x")], "q_id long, q_text string")
    got = bm25_topk(docs, qs, k=5, k1=1.5, b=0.75).collect()[0]
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    expect = idf * (1 * 2.5) / (1 + 1.5 * (0.25 + 0.75 * 2 / 2))
    assert got.score == pytest.approx(round(expect, 6))
    assert got.doc_id == 1


def test_bm25_no_cartesian(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    qs = spark.createDataFrame([(0, "a")], "q_id long, q_text string")
    plan = bm25_topk(docs, qs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_pack_offset_bins(spark):
    df = spark.createDataFrame(
        [(1, "s", 300), (2, "s", 300), (3, "s", 300), (4, "t", 100)],
        "doc_id long, src string, n long",
    )
    rows = {
        (r.shard, r.doc_id): (r.start_offset, r.bin)
        for r in pack_offset_bins(df, token_col="n", budget=512, shard_col="src").collect()
    }
    # shard s: offsets 0, 300, 600 -> bins 0, 0, 1; shard t restarts at 0
    assert rows[("s", 1)] == (0, 0)
    assert rows[("s", 2)] == (300, 0)
    assert rows[("s", 3)] == (600, 1)
    assert rows[("t", 4)] == (0, 0)


def test_pack_offset_bins_requires_shard_col(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n long")
    with pytest.raises(ValueError, match="shard_col"):
        pack_offset_bins(df, token_col="n")
    # explicit opt-in keeps the old single-shard behavior for small inputs
    rows = pack_offset_bins(df, token_col="n", allow_single_shard=True).collect()
    assert rows[0].shard == "all" and rows[0].bin == 0


def test_chunk_documents_overlap_and_tail(spark):
    words = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=32, overlap=8).collect(), key=lambda r: r.chunk_id
    )
    # 40 words, stride 24 -> ceil((40-8)/24)=2 chunks
    assert [r.chunk_id for r in rows] == [0, 1]
    assert rows[0].n_chunk_tokens == 32
    assert rows[0].chunk_text.split(" ")[0] == "w0"
    # second chunk starts at word 24 (8-word overlap with chunk 0)
    assert rows[1].chunk_text.split(" ")[0] == "w24"
    assert rows[1].n_chunk_tokens == 16
    # every word covered
    covered = {w for r in rows for w in r.chunk_text.split(" ")}
    assert covered == set(words.split(" "))


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    assert len(rows) == 1 and rows[0].chunk_text == "a b c" and rows[0].n_chunk_tokens == 3


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_feature_hash_embed_unit_norm_and_determinism(spark):
    import math

    from aicoe_osc_demo_spark.operators.corpus import feature_hash_embed

    df = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "alpha alpha"), (3, "delta")],
        ["doc_id", "text"],
    )
    rows = feature_hash_embed(df, dim=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.dim] = r.val
    # unit norm per doc (up to the 6dp rounding of each component)
    for d, vec in by_doc.items():
        assert abs(sum(v * v for v in vec.values()) - 1.0) < 1e-4, (d, vec)
    # a single-token doc embeds as +-1 at one dimension
    assert len(by_doc[3]) == 1 and abs(abs(next(iter(by_doc[3].values()))) - 1.0) < 1e-9
    # identical runs are identical; same tokens -> same dims regardless of doc
    again = feature_hash_embed(df, dim=16).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # doc 2 ("alpha alpha") must use exactly the dimension "alpha" hashes to,
    # shared with doc 1's alpha component
    import hashlib

    alpha_dim = int(hashlib.md5(b"alpha").hexdigest()[:8], 16) % 16
    assert set(by_doc[2]) == {alpha_dim}
    assert alpha_dim in by_doc[1]


def _bpe_loop_mirror(word_freq: dict[str, int], n_merges: int):
    """Independent pure-Python greedy BPE (Sennrich et al. 2016 alg. 1):
    symbol-list state, left-to-right non-overlapping merge application."""
    state: dict[tuple[str, ...], int] = {}
    for w, f in word_freq.items():
        k = tuple(w)
        state[k] = state.get(k, 0) + f
    merges = []
    for step in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, cnt))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, f in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            nxt[k] = nxt.get(k, 0) + f
        state = nxt
    return merges


def test_bpe_train_merges_matches_reference_loop(spark):
    from aicoe_osc_demo_spark.operators.corpus import bpe_train_merges

    # corpus designed to exercise: overlap ("aaa" under an (a,a) merge),
    # fused symbols re-entering later merges, and the partial-symbol
    # hazard (after (c,a) fuses, word "cab"'s ["ca","b"] must NOT match
    # pair (a,b) against the tail of "ca")
    texts = [
        "cab cab cab cab",
        "ca ca ca ca ca",
        "aaab aaab",
        "ab ab ab",
        "banana",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    expected = _bpe_loop_mirror(wf, 5)
    got = [
        (r["step"], r["lhs"], r["rhs"], r["cnt"])
        for r in bpe_train_merges(df, n_merges=5).orderBy("step").collect()
    ]
    assert got == expected
    # determinism: a second run learns the identical merge table
    again = [
        (r["step"], r["lhs"], r["rhs"], r["cnt"])
        for r in bpe_train_merges(df, n_merges=5).orderBy("step").collect()
    ]
    assert again == expected


def test_bpe_encode_token_counts_matches_reference(spark):
    from aicoe_osc_demo_spark.operators.corpus import bpe_encode_token_counts

    texts = ["cab cab ab", "ca ca banana", "aaab ab"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    merges = _bpe_loop_mirror(wf, 4)

    def encode(word: str) -> int:
        syms = list(word)
        for _, left, right, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    expected = {
        i: sum(encode(w) for w in t.split(" ") if w) for i, t in enumerate(texts)
    }
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode_token_counts(df, n_merges=4).collect()
    }
    assert got == expected
    # untrained text still encodes (chars only): 1 token per char for a
    # word sharing no learned merge
    assert all(v > 0 for v in got.values())


def test_tfidf_keywords_formula_and_ranking(spark):
    from aicoe_osc_demo_spark.operators.corpus import tfidf_keywords

    df = spark.createDataFrame(
        [
            (0, "apple apple banana shared"),
            (1, "banana cherry shared"),
            (2, "cherry cherry cherry shared"),
        ],
        ["doc_id", "text"],
    )
    rows = tfidf_keywords(df, k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["term"], r["score"]) for r in rows}
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert got[(0, 1)][0] == "apple"
    assert abs(got[(0, 1)][1] - round(2 * math.log(3.0), 6)) < 1e-9
    assert got[(0, 2)][0] == "banana"
    # "shared" appears in every doc -> idf = ln(1) = 0: it can only fill
    # leftover slots (doc 2 has just two distinct terms), never rank 1
    assert all(
        got[(d, 1)][0] != "shared" and got[(d, 1)][1] > 0 for d in (0, 1, 2)
    )
    # doc 2: cherry tf=3 df=2 -> 3*ln(1.5)
    assert got[(2, 1)][0] == "cherry"
    assert abs(got[(2, 1)][1] - round(3 * math.log(1.5), 6)) < 1e-9


def test_bpe_tokenizer_roundtrip_through_parquet(spark, tmp_path):
    from aicoe_osc_demo_spark.operators.corpus import (
        bpe_encode_token_counts,
        bpe_encode_with_merges,
        bpe_train_merges,
    )

    texts = ["cab cab ab banana", "ca ca aaab", "ab ab cab"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    path = str(tmp_path / "tokenizer")
    bpe_train_merges(df, n_merges=4).write.parquet(path)

    loaded = spark.read.parquet(path)
    served = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode_with_merges(df, loaded).collect()
    }
    fresh = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode_token_counts(df, n_merges=4).collect()
    }
    assert served == fresh
    # the persisted-tokenizer plan is a pure projection chain over the
    # vocabulary — no broadcast replays, no checkpoints
    plan = bpe_encode_with_merges(df, loaded)._jdf.queryExecution().optimizedPlan().toString()
    assert "Scanned" not in plan  # (no checkpointed RDD scans)
    # and it encodes NEW text with the frozen tokenizer
    new_docs = spark.createDataFrame([(9, "cab banana zz")], ["doc_id", "text"])
    out = bpe_encode_with_merges(new_docs, loaded).collect()
    assert len(out) == 1 and out[0]["n_tokens"] > 0
