from __future__ import annotations

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.operators.curation import (
    answer_containment_join,
    extra_answerable_join,
    find_answer_start_udf,
    negative_sample,
    valid_pair_filter,
)
from aicoe_osc_demo_spark.operators.multimodal import (
    extract_features,
    media_from_text,
    media_metadata,
)
from aicoe_osc_demo_spark.training import (
    confusion_metrics,
    cross_validate,
    prepare_pairs,
    qa_eval,
    span_overlap_f1,
    train_relevance,
)


def test_find_answer_start_semantics(spark):
    # base_kpi_inference_curator.py:129-156 golden cases, exact reference
    # semantics: dot-only escaping, EITHER-side numeric boundary, no shift
    from aicoe_osc_demo_spark.operators.curation import find_answer_start

    assert find_answer_start("cat", "the cat sat cat") == [4, 12]
    assert find_answer_start("0", "year 2016 had 0 incidents") == [14]
    assert find_answer_start("0", "2016") == []          # inside a number
    assert find_answer_start("0", "10a") == [1]          # one-sided boundary OK
    assert find_answer_start("cat", "cat at offset zero") == [0]  # unshifted
    assert find_answer_start("dog", "no match here") == []
    assert find_answer_start("1.5", "rate 1.5 not 125") == [5]  # dot escaped

    df = spark.createDataFrame(
        [("cat", "cat sat cat", [0])], ["answer", "text", "ignored"]
    ).select("answer", "text", find_answer_start_udf("answer", "text").alias("answer_start"))
    assert df.first().answer_start == [0, 8]


def test_farm_zero_shift(spark):
    from aicoe_osc_demo_spark.operators.curation import farm_zero_shift

    df = spark.createDataFrame(
        [("cat sat", [0, 4]), ("x cat", [2])], ["text", "answer_start"]
    )
    out = {r.text: r.answer_start for r in farm_zero_shift(df, "text", "answer_start").collect()}
    # kpi_inference_curator.py:355-360: space prepended, ALL offsets +1
    assert out[" cat sat"] == [1, 5]
    assert out["x cat"] == [2]  # untouched when no 0 offset


def test_valid_pair_filter(spark):
    df = spark.createDataFrame([(1, "k1", "TEXT"), (2, "k1", "TABLE"), (3, "k2", "TEXT")],
                               ["id", "kpi", "dt"])
    dim = spark.createDataFrame([("k1", ["TEXT"]), ("k2", ["TEXT", "TABLE"])],
                                ["kpi", "allowed"])
    out = {r.id for r in valid_pair_filter(df, dim, "kpi", "dt").collect()}
    assert out == {1, 3}


def test_answer_containment_and_extra_answerable(spark):
    ann = spark.createDataFrame([(1, "p1", "green energy")], ["qid", "pdf", "answer"])
    par = spark.createDataFrame(
        [(10, "p1", "we invest in green energy daily"), (11, "p1", "nothing relevant")],
        ["cid", "pdf", "text"],
    )
    out = answer_containment_join(ann, par, on=["pdf"]).collect()
    assert len(out) == 1 and out[0].cid == 10

    ann2 = spark.createDataFrame([(1, "p1", 1, "solar")], ["ann_id", "source", "page", "answer"])
    par2 = spark.createDataFrame(
        [("p1", 1, "solar on same page"), ("p1", 2, "solar on another page"), ("p1", 3, "none")],
        ["source", "page", "text"],
    )
    extra = extra_answerable_join(
        ann2.select("ann_id", "source", "page", "answer"),
        par2, doc_key="source", page_col="page",
    ).collect()
    assert len(extra) == 1 and extra[0]["text"] == "solar on another page"


def test_negative_sample_deterministic(spark):
    pos = spark.createDataFrame([("q1",), ("q2",)], ["q"])
    pool = spark.range(100).withColumnRenamed("id", "doc_id")
    s1 = sorted((r.q, r.doc_id) for r in negative_sample(pos, pool, ["q"], "doc_id", 3).collect())
    s2 = sorted(
        (r.q, r.doc_id)
        for r in negative_sample(pos, pool.repartition(9), ["q"], "doc_id", 3).collect()
    )
    assert s1 == s2
    assert len(s1) == 6
    # different groups get different negatives (hash includes the group)
    assert {d for q, d in s1 if q == "q1"} != {d for q, d in s1 if q == "q2"}


def test_negative_sample_prefilter_bounds_candidates(spark):
    # the md5-threshold prefilter keeps the pre-window candidate set at
    # O(k*oversample) per group instead of |pool|, and the pick is
    # hash-identical to the naive full ranking
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.functions.hashing import md5_hex
    from aicoe_osc_demo_spark.operators.curation import rank_prefilter_threshold

    pos = spark.createDataFrame([("q1",), ("q2",), ("q3",)], ["q"])
    pool = spark.range(5000).withColumnRenamed("id", "doc_id")
    k, oversample = 3, 16

    got = sorted(
        (r.q, r.doc_id)
        for r in negative_sample(pos, pool, ["q"], "doc_id", k, oversample=oversample).collect()
    )

    rank_key = md5_hex(F.lit("neg"), F.col("q"), F.col("doc_id"))
    cand = pos.select("q").distinct().crossJoin(pool)
    naive = (
        cand.withColumn("rn", F.row_number().over(Window.partitionBy("q").orderBy(rank_key.asc())))
        .filter(F.col("rn") <= k)
    )
    assert got == sorted((r.q, r.doc_id) for r in naive.collect())

    # pre-window row bound: expected oversample*k survivors per group; assert
    # a generous 4x margin, far below the 5000-row pool
    thr = rank_prefilter_threshold(k, 5000, oversample)
    assert thr is not None
    survivors = cand.filter(F.substring(rank_key, 1, 8) < thr).groupBy("q").count().collect()
    assert len(survivors) == 3
    assert all(r["count"] <= 4 * oversample * k for r in survivors)
    assert all(r["count"] >= k for r in survivors)


def test_negative_sample_lazy_construction_no_job(spark):
    # omitting pool_count must NOT run an eager sizing job: the threshold is
    # a runtime scalar (one-row count broadcast into the plan), and the pick
    # is identical to the eager-threshold form at any pool size
    from pyspark.sql import functions as F

    pos = spark.createDataFrame([("q1",), ("q2",)], ["q"])
    pool = spark.range(2000).withColumnRenamed("id", "doc_id")

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    lazy = negative_sample(pos, pool, ["q"], "doc_id", 3)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert before == after, "plan construction launched a Spark job"

    eager = negative_sample(pos, pool, ["q"], "doc_id", 3, pool_count=2000)
    assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, eager.collect()))

    # no-prune branch (pool smaller than oversample*k) also agrees
    tiny = spark.range(7).withColumnRenamed("id", "doc_id")
    l2 = sorted(map(tuple, negative_sample(pos, tiny, ["q"], "doc_id", 3).collect()))
    e2 = sorted(map(tuple, negative_sample(pos, tiny, ["q"], "doc_id", 3, pool_count=7).collect()))
    assert l2 == e2 and len(l2) == 6


def test_multimodal_resize_and_frames(spark):
    from aicoe_osc_demo_spark.operators.multimodal import (
        media_from_text,
        resize_media,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(0, "x" * 300), (1, "short"), (2, "y" * 1500)], ["doc_id", "text"]
    )
    media = media_from_text(docs)

    resized = resize_media(media, width=32, height=32).collect()
    assert all(r.width == 32 and r.height == 32 for r in resized)
    assert all(len(r.content) == (32 * 32) // 64 for r in resized)  # stub target size

    frames = sample_frames(media, frame_bytes=64, stride=2, max_frames=8).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    # 300 bytes → positions 0,2,4 (pos*64 < 300); 5 bytes → only pos 0;
    # 1500 bytes → capped at max_frames=8
    assert sorted(r.frame_index for r in by_id[0]) == [0, 2, 4]
    assert [r.frame_index for r in by_id[1]] == [0]
    assert len(by_id[2]) == 8
    assert all(r.n_frame_bytes <= 64 for r in frames)
    import hashlib as _h

    first = next(r for r in by_id[0] if r.frame_index == 0)
    assert first.frame_md5 == _h.md5(b"x" * 64).hexdigest()


def test_multimodal_pipeline(spark):
    docs = spark.createDataFrame([(0, "some text"), (1, "other bytes")], ["doc_id", "text"])
    media = media_from_text(docs)
    assert dict(media.dtypes)["content"] == "binary"
    meta = {r.media_id: r for r in media_metadata(media).collect()}
    assert meta[0].n_bytes == len("some text")
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[0].content_md5 == meta[0].content_md5
    assert 64 <= feats[0].width < 256 and 0.0 <= feats[0].mean_intensity <= 1.0
    # deterministic stub: same bytes → same features
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert again[0].width == feats[0].width


def test_training_pipeline_and_cv(spark):
    rows = [(i, "has spark word" if i % 2 else "plain text only", i % 2) for i in range(80)]
    df = spark.createDataFrame(rows, ["id", "text", "label"])
    pairs = prepare_pairs(
        df.withColumn("q", F.lit("mentions spark?")), "q", "text", "label"
    )
    model = train_relevance(pairs, max_iter=10)
    m = confusion_metrics(model.transform(pairs)).first()
    assert m.accuracy > 0.9  # separable toy task
    folds = cross_validate(df.withColumn("q", F.lit("q")).select(
        "id", F.concat_ws(" [SEP] ", "q", "text").alias("pair_text"),
        F.col("label").cast("double").alias("label")), "id", n_folds=2, max_iter=10)
    assert len(folds) == 2 and all(0 <= f["f1"] <= 1 for f in folds)


def test_span_overlap_f1_and_qa_eval(spark):
    assert span_overlap_f1("scope one emissions", "scope one emissions") == 1.0
    assert span_overlap_f1("scope one", "scope one emissions") > 0.5
    assert span_overlap_f1("unrelated", "scope one emissions") == 0.0
    assert span_overlap_f1("", "") == 1.0
    scored = spark.createDataFrame(
        [("a b c", "a b c"), ("a b", "a b c"), ("no_answer", "no_answer")],
        ["final_answer", "gold_answer"],
    )
    out = {r.answerable: r for r in qa_eval(scored).collect()}
    assert out[False].exact_match == 1.0
    assert 0 < out[True].mean_f1 <= 1.0


def test_phash_near_dup_pigeonhole_recall(spark):
    # Hashes within max_hamming bit-flips MUST be found through the band
    # equi-join (pigeonhole: 5 flips over 6 bands leave one band intact);
    # hashes further apart must not pair unless a band happens to collide
    # and the Hamming filter then rejects them anyway.
    from aicoe_osc_demo_spark.operators.multimodal import phash_near_dup_pairs

    base = 0x0ABCDEF0123456F
    rows = [
        (1, base),
        (2, base),                     # identical -> hamming 0
        (3, base ^ 0b10111),           # 4 bit flips -> hamming 4, must be found
        (4, base ^ ((1 << 60) - 1)),   # all 60 bits flipped -> never paired
    ]
    df = spark.createDataFrame(rows, ["media_id", "phash"])
    out = phash_near_dup_pairs(df, max_hamming=5, bands=6, band_bits=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = {(r.d1, r.d2): r.hamming for r in out.collect()}
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 4 and got[(2, 3)] == 4
    assert all(4 not in pair for pair in got)


def test_perceptual_hashes_stub_is_md5_prefix(spark):
    from aicoe_osc_demo_spark.operators.multimodal import (
        media_from_text,
        perceptual_hashes,
    )
    import hashlib

    df = spark.createDataFrame([(7, "hello world")], ["doc_id", "text"])
    row = perceptual_hashes(media_from_text(df)).collect()[0]
    assert row.phash == int(hashlib.md5(b"hello world").hexdigest()[:15], 16)
