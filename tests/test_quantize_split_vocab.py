"""Round-6 additions: scalar quantization, leakage-safe split, vocabulary
coverage — unit semantics plus the scale-shape properties (no cartesian,
broadcast where claimed)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestScalarQuantize:
    def test_codes_cover_full_range_and_are_exact(self, spark):
        from aicoe_osc_demo_spark.operators.similarity import scalar_quantize

        df = _emb_df(
            spark,
            [
                (1, [0.0, -1.0]),
                (2, [5.0, 1.0]),
                (3, [10.0, 0.0]),
            ],
        )
        codes, stats = scalar_quantize(df, bits=8)
        got = {(r.vec_id, r.dim): r.code for r in codes.collect()}
        # dim 0: lo=0 hi=10 -> 0, 128 (5/10*255+0.5 floor = 128), 255
        assert got[(1, 0)] == 0
        assert got[(2, 0)] == 128
        assert got[(3, 0)] == 255
        # dim 1: lo=-1 hi=1 -> -1 -> 0, 1 -> 255, 0 -> 128
        assert got[(1, 1)] == 0
        assert got[(2, 1)] == 255
        assert got[(3, 1)] == 128
        st = {r.dim: (r.lo, r.hi) for r in stats.collect()}
        assert st[0] == (0.0, 10.0) and st[1] == (-1.0, 1.0)

    def test_constant_dimension_codes_zero(self, spark):
        from aicoe_osc_demo_spark.operators.similarity import scalar_quantize

        df = _emb_df(spark, [(1, [7.0]), (2, [7.0])])
        codes, _ = scalar_quantize(df, bits=8)
        assert {r.code for r in codes.collect()} == {0}

    def test_recon_error_bounded_by_half_step(self, spark):
        from aicoe_osc_demo_spark.operators.similarity import sq_reconstruction_error

        df = _emb_df(
            spark, [(i, [float(i) / 7.0, float(i * i)]) for i in range(8)]
        )
        errs = sq_reconstruction_error(df, bits=8).collect()
        for r in errs:
            # max error of an affine 255-level quantizer is half a step
            lo_hi = {0: (0.0, 1.0), 1: (0.0, 49.0)}[r.dim]
            half_step = (lo_hi[1] - lo_hi[0]) / 255 / 2
            assert r.max_abs_err <= half_step + 1e-9
            assert 0.0 <= r.mean_abs_err <= r.max_abs_err

    def test_stats_broadcast_no_wide_shuffle_on_encode(self, spark):
        from aicoe_osc_demo_spark.operators.similarity import scalar_quantize

        df = _emb_df(spark, [(i, [float(i), 1.0]) for i in range(10)])
        codes, _ = scalar_quantize(df, bits=8)
        plan = codes._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestLeakageSafeSplit:
    def test_near_dups_land_on_same_side(self, spark):
        from aicoe_osc_demo_spark.operators.dedup import leakage_safe_split

        base = "the quick brown fox jumps over the lazy dog again and again today"
        docs = spark.createDataFrame(
            [
                (1, base),
                (2, base + " extra"),  # near-dup of 1
                (3, "completely different text about spark query planning engines here"),
                (4, "yet another unrelated document discussing parquet row groups deeply"),
            ],
            "doc_id long, text string",
        )
        out = leakage_safe_split(docs, train_frac=0.5).collect()
        rows = {r.doc_id: r for r in out}
        assert len(rows) == 4
        # 1 and 2 share a cluster and therefore a side
        assert rows[1].cluster_id == rows[2].cluster_id == 1
        assert rows[1].split == rows[2].split
        # singletons keep themselves
        assert rows[3].cluster_id == 3 and rows[4].cluster_id == 4
        assert set(r.split for r in out) <= {"train", "eval"}

    def test_split_is_pure_function_of_cluster(self, spark):
        from aicoe_osc_demo_spark.operators.dedup import leakage_safe_split

        docs = spark.createDataFrame(
            [(i, f"unique document number {i} with some distinct words w{i} x{i}") for i in range(20)],
            "doc_id long, text string",
        )
        a = {r.doc_id: r.split for r in leakage_safeSplit_run(docs)}
        b = {r.doc_id: r.split for r in leakage_safeSplit_run(docs.repartition(7))}
        assert a == b


def leakage_safeSplit_run(docs):
    from aicoe_osc_demo_spark.operators.dedup import leakage_safe_split

    return leakage_safe_split(docs, train_frac=0.8).collect()


class TestVocabCoverage:
    def test_oov_rate_exact(self, spark):
        from aicoe_osc_demo_spark.operators.corpus import vocab_coverage

        docs = spark.createDataFrame(
            [
                (1, "a a b rare1"),
                (2, "a b b rare2"),
            ],
            "doc_id long, text string",
        )
        # vocab_size=2 -> vocab = {a, b} (both count 3); rare* are OOV
        out = {r.doc_id: r for r in vocab_coverage(docs, vocab_size=2).collect()}
        assert out[1].n_tokens == 4 and out[1].oov_rate == pytest.approx(0.25)
        assert out[2].n_tokens == 4 and out[2].oov_rate == pytest.approx(0.25)

    def test_tie_break_deterministic(self, spark):
        from aicoe_osc_demo_spark.operators.corpus import vocab_coverage

        # x and y tie at count 2; vocab_size=1 must pick 'x' (token asc)
        docs = spark.createDataFrame(
            [(1, "x y"), (2, "y x")], "doc_id long, text string"
        )
        out = {r.doc_id: r.oov_rate for r in vocab_coverage(docs, vocab_size=1).collect()}
        assert out[1] == pytest.approx(0.5) and out[2] == pytest.approx(0.5)

    def test_vocab_join_is_broadcast(self, spark):
        from aicoe_osc_demo_spark.cache import CacheScope
        from aicoe_osc_demo_spark.operators.corpus import vocab_coverage

        docs = spark.createDataFrame(
            [(i, f"tok{i} common") for i in range(10)], "doc_id long, text string"
        )
        # the scope keeps the plan lazy (the default path pins the result
        # and would show only an ExistingRDD scan)
        with CacheScope() as s:
            plan = (
                vocab_coverage(docs, vocab_size=3, scope=s)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        assert "BroadcastHashJoin" in plan
        # the top-V selection must be a bounded take, not a global sort
        assert "TakeOrderedAndProject" in plan


class TestZipFormNgrams:
    def test_word_ngrams_zip_form_matches_slice_form(self, spark):
        """The r6 zip-form shingle builder must be element-for-element
        identical to the original sequence/slice HOF form (which re-split
        the text per element — the O(words^2) cliff)."""
        from aicoe_osc_demo_spark.operators.dedup import (
            positional_word_ngrams,
            word_ngrams,
        )

        def slice_form(text_col, n):
            words = F.split(text_col, " ")
            return F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
                lambda i: F.array_join(F.slice(words, i, n), " "),
            )

        rows = [
            (1, "a b c d e"),
            (2, "a b"),
            (3, "a"),
            (4, ""),
            (5, "x x x x"),
            (6, "one two three four five six seven"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        for n in (1, 2, 3, 5):
            out = df.select(
                slice_form(F.col("text"), n).alias("o"),
                positional_word_ngrams(F.col("text"), n).alias("z"),
                F.array_distinct(slice_form(F.col("text"), n)).alias("od"),
                word_ngrams(F.col("text"), n).alias("zd"),
            ).collect()
            for r in out:
                assert r.o == r.z, (n, r.o, r.z)
                assert r.od == r.zd, (n, r.od, r.zd)

    def test_real_docs_parity(self, spark):
        from aicoe_osc_demo_spark.operators.dedup import word_ngrams

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

        def slice_form(text_col, n):
            words = F.split(text_col, " ")
            return F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
                    lambda i: F.array_join(F.slice(words, i, n), " "),
                )
            )

        bad = (
            docs.select(
                slice_form(F.col("text"), 3).alias("o"),
                word_ngrams(F.col("text"), 3).alias("z"),
            )
            .filter(F.col("o") != F.col("z"))
            .count()
        )
        assert bad == 0


class TestBpePairCounts:
    def test_weighted_pair_counts_exact(self, spark):
        from aicoe_osc_demo_spark.operators.corpus import bpe_pair_counts

        # "ab" occurs in 'abab' (freq 2: positions ab, ba, ab -> ab x2 per
        # word) and 'ab' (freq 1)
        docs = spark.createDataFrame(
            [(1, "abab ab"), (2, "abab cd")], "doc_id long, text string"
        )
        out = {r.pair: r.cnt for r in bpe_pair_counts(docs, top_k=10).collect()}
        # abab freq 2 -> pairs ab,ba,ab => ab:4 ba:2 ; ab freq 1 -> ab:1 ; cd freq 1 -> cd:1
        assert out == {"ab": 5, "ba": 2, "cd": 1}

    def test_single_char_words_yield_no_pairs(self, spark):
        from aicoe_osc_demo_spark.operators.corpus import bpe_pair_counts

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        assert bpe_pair_counts(docs).count() == 0

    def test_topk_is_bounded_take_not_global_sort(self, spark):
        from aicoe_osc_demo_spark.operators.corpus import bpe_pair_counts

        docs = spark.createDataFrame(
            [(1, "hello world spark engine")], "doc_id long, text string"
        )
        plan = bpe_pair_counts(docs, top_k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestCorpusReport:
    def test_report_values_exact(self, spark):
        from aicoe_osc_demo_spark.plans.quality import llm_corpus_report  # noqa: F401
        from aicoe_osc_demo_spark.plans import QUERIES

        docs = spark.createDataFrame(
            [
                (1, "the of and to in is for on a an", "web", 31),
                (2, "the of and to in is for on a an", "web", 31),  # exact dup of 1
                (3, "zz yy xx ww vv uu tt ss rr qq", "books", 29),
            ],
            "doc_id long, text string, source string, n_chars long",
        )
        import tempfile, os
        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {r.source: r for r in QUERIES["llm_corpus_report"](spark, d).collect()}
        assert out["web"].n_docs == 2 and out["web"].n_dup_docs == 1
        assert out["web"].en_share == 1.0       # all stopwords
        assert out["books"].n_docs == 3 - 2 and out["books"].n_dup_docs == 0
        assert out["books"].en_share == 0.0     # no stopwords
        assert 0.0 <= out["web"].avg_quality <= 1.0
        assert out["web"].avg_chars == 31.0
