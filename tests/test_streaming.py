from __future__ import annotations

import os

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.streaming.incremental import (
    incremental_file_pipeline,
    sessionize,
    windowed_event_counts,
)


def test_incremental_exactly_once_per_file(spark, tmp_path):
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)
    spark.range(5).write.parquet(inp + "/f1.parquet")

    seen: list[int] = []

    def batch_fn(df, epoch_id):
        seen.extend(r.id for r in df.collect())

    q = incremental_file_pipeline(spark, inp, ckpt, batch_fn, schema="id long")
    q.awaitTermination(60)
    assert sorted(seen) == [0, 1, 2, 3, 4]

    # second run with a new file: only the new file is processed
    spark.range(5, 8).write.parquet(inp + "/f2.parquet")
    q2 = incremental_file_pipeline(spark, inp, ckpt, batch_fn, schema="id long")
    q2.awaitTermination(60)
    assert sorted(seen) == [0, 1, 2, 3, 4, 5, 6, 7]


def test_streaming_dedup_across_batches(spark, tmp_path):
    # exact-dedup state survives across micro-batches and restarts: a clone
    # arriving in a later batch (or on re-run) is never re-emitted
    from aicoe_osc_demo_spark.streaming.incremental import streaming_dedup

    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(inp)
    spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], ["doc_id", "text"]
    ).write.parquet(inp + "/b1.parquet")

    emitted: list[tuple[int, str]] = []

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("recursiveFileLookup", "true")
            .parquet(inp)
        )
        q = (
            streaming_dedup(stream)
            .writeStream.foreachBatch(
                lambda df, _e: emitted.extend((r.doc_id, r.text) for r in df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run()
    assert sorted(t for _, t in emitted) == ["alpha beta", "gamma delta"]

    # batch 2: one clone of an already-seen doc + one new doc
    spark.createDataFrame(
        [(2, "alpha beta"), (3, "epsilon zeta")], ["doc_id", "text"]
    ).write.parquet(inp + "/b2.parquet")
    run()
    assert sorted(t for _, t in emitted) == ["alpha beta", "epsilon zeta", "gamma delta"]

    # batch form: same function, plain dropDuplicates
    b = spark.createDataFrame([(0, "x y"), (1, "x y")], ["doc_id", "text"])
    assert streaming_dedup(b).count() == 1


def test_windowed_event_counts_batch(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 10:05:00", "click", 1.0),
            ("2024-01-01 10:55:00", "click", 2.0),
            ("2024-01-01 11:05:00", "click", 4.0),
        ],
        ["ts", "event_type", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {str(r.window_start): (r.n_events, r.sum_value) for r in windowed_event_counts(df).collect()}
    assert out["2024-01-01 10:00:00"] == (2, 3.0)
    assert out["2024-01-01 11:00:00"] == (1, 4.0)


def test_windowed_counts_on_real_stream(spark, tmp_path):
    # the same windowed_event_counts plan running as a Structured Streaming
    # query with a watermark, fed by the file source
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(inp)
    rows = [
        ("2024-01-01 10:05:00", "click", 1.0),
        ("2024-01-01 10:45:00", "click", 2.0),
        ("2024-01-01 11:10:00", "view", 4.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.coalesce(1).write.parquet(inp + "/f1.parquet")

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("recursiveFileLookup", "true")
        .parquet(inp)
    )
    agg = windowed_event_counts(stream, "1 hour", watermark="2 hours")
    assert agg.isStreaming

    seen: list = []
    q = (
        agg.writeStream.foreachBatch(lambda bdf, _e: seen.extend(bdf.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(str(r.window_start), r.event_type): (r.n_events, r.sum_value) for r in seen}
    assert got[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 11:00:00", "view")] == (1, 4.0)


def test_annotation_source_missing_columns_raises(spark, tmp_path):
    import os as _os

    import pytest

    from aicoe_osc_demo_spark.sources.files import read_annotation_workbooks

    d = tmp_path / "ann2"
    _os.makedirs(d)
    (d / "a.csv").write_text("company,kpi_id\nAcme,1\n")
    with pytest.raises(ValueError, match="missing required columns.*source_file"):
        read_annotation_workbooks(spark, str(d), ["company", "kpi_id", "source_file"])


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),  # same session
            (1, "2024-01-01 12:00:00"),  # gap > 30 min → new session
            (2, "2024-01-01 09:00:00"),
        ],
        ["user_id", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(df, gap_minutes=30)
    per_user = (
        out.groupBy("user_id").agg(F.max("session_id").alias("n")).collect()
    )
    d = {r.user_id: r.n for r in per_user}
    assert d == {1: 2, 2: 1}


def test_streaming_quality_gate(spark, tmp_path):
    # the curation Column ops (quality score, PII redaction, repetition-ish
    # length gate) apply unchanged to a streaming DataFrame — the same
    # expressions the batch queries verify against the oracle
    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.functions.analysis import pii_redact, quality_score

    inp, ckpt = str(tmp_path / "qin"), str(tmp_path / "qck")
    os.makedirs(inp)
    good = " ".join(f"word{i} filler text of reasonable shape" for i in range(12))
    spark.createDataFrame(
        [(0, good), (1, "short"), (2, "mail me a@b.co " + good)],
        ["doc_id", "text"],
    ).write.parquet(inp + "/b1.parquet")

    out: list[tuple[int, float, str]] = []
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(inp)
    )
    gated = (
        stream.withColumn("q", quality_score(F.col("text")))
        .filter(F.col("q") >= 0.7)
        .select("doc_id", "q", pii_redact(F.col("text")))
    )
    q = (
        gated.writeStream.foreachBatch(
            lambda df, _e: out.extend((r.doc_id, r.q, r.redacted) for r in df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    ids = sorted(i for i, _, _ in out)
    assert ids == [0, 2]  # the short doc is gated out
    redacted = {i: t for i, _, t in out}
    assert "[EMAIL]" in redacted[2] and "a@b.co" not in redacted[2]


def test_streaming_near_dedup_across_runs(spark, tmp_path):
    from aicoe_osc_demo_spark.streaming.incremental import streaming_near_dedup_pipeline

    inp = tmp_path / "in"
    inp.mkdir()
    ledger = str(tmp_path / "ledger")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog near the river bank today"

    spark.createDataFrame(
        [(1, base), (2, "completely different words about spark shuffle joins here now")],
        schema,
    ).write.parquet(str(inp / "f1"))
    q = streaming_near_dedup_pipeline(spark, str(inp), ledger, out, ckpt, schema)
    q.awaitTermination(120)

    # second RUN (fresh query, same checkpoint/ledger): a near-dup of doc 1
    # and a genuinely new doc arrive
    spark.createDataFrame(
        [(3, base + " extra"), (4, "fresh unrelated content with novel tokens entirely")],
        schema,
    ).write.parquet(str(inp / "f2"))
    q2 = streaming_near_dedup_pipeline(spark, str(inp), ledger, out, ckpt, schema)
    q2.awaitTermination(120)

    accepted = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert accepted == {1, 2, 4}  # 3 rejected against the cross-run ledger
    sigs = spark.read.parquet(ledger)
    assert {r.doc_id for r in sigs.collect()} == {1, 2, 4}
    assert len(sigs.columns) == 9  # doc_id + 8 signature longs, never text


def test_streaming_scd2_intervals_across_runs(spark, tmp_path):
    # streaming SCD2: closed intervals emitted append-only; the open
    # interval survives restarts via checkpointed state; output matches the
    # batch scd2 op on the same (in-order) data
    import os

    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.streaming.stateful import user_state_intervals

    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(inp)

    def mk(rows, name):
        spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).withColumn(
            "ts", F.col("ts").cast("timestamp_ntz")
        ).coalesce(1).write.parquet(f"{inp}/{name}.parquet")

    mk(
        [
            (1, "2024-01-01 00:00:00", "a"),
            (1, "2024-01-01 01:00:00", "a"),  # no-op: must not close anything
            (1, "2024-01-01 02:00:00", "b"),
            (2, "2024-01-01 00:30:00", "x"),
        ],
        "f1",
    )

    def run(sink):
        stream = (
            spark.readStream.schema("user_id long, ts timestamp_ntz, event_type string")
            .option("recursiveFileLookup", "true")
            .parquet(inp)
        )
        q = (
            user_state_intervals(stream)
            .writeStream.foreachBatch(lambda df, _e: sink.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    out1: list = []
    run(out1)
    assert [(r.user_id, r.state, str(r.valid_from), str(r.valid_to)) for r in out1] == [
        (1, "a", "2024-01-01 00:00:00", "2024-01-01 02:00:00")
    ]

    # second delivery: user 1 b->c closes b (open since 02:00 in state),
    # user 2 x->y closes x — both require state carried across the restart
    mk(
        [(1, "2024-01-01 03:00:00", "c"), (2, "2024-01-01 01:30:00", "y")],
        "f2",
    )
    out2: list = []
    run(out2)
    got2 = sorted((r.user_id, r.state, str(r.valid_from), str(r.valid_to)) for r in out2)
    assert got2 == [
        (1, "b", "2024-01-01 02:00:00", "2024-01-01 03:00:00"),
        (2, "x", "2024-01-01 00:30:00", "2024-01-01 01:30:00"),
    ]

    # batch/streaming parity: closed intervals from the batch op over ALL
    # delivered rows equal the union of the streamed emissions
    allrows = spark.read.option("recursiveFileLookup", "true").parquet(inp)
    batch = sorted(
        (r.user_id, r.state, str(r.valid_from), str(r.valid_to))
        for r in user_state_intervals(allrows).collect()
    )
    streamed = sorted(
        (r.user_id, r.state, str(r.valid_from), str(r.valid_to)) for r in out1 + out2
    )
    assert batch == streamed


def test_streaming_scd2_equal_ts_tiebreak_matches_batch(spark, tmp_path):
    # duplicate-timestamp change streams: the streaming op applies the same
    # (ts, attr) tiebreak as the batch window order, closing zero-width
    # intervals instead of silently dropping equal-ts changes
    import os

    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.streaming.stateful import user_state_intervals

    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(inp)
    rows = [
        (1, "2024-01-01 00:00:00", "b"),  # equal-ts pair, delivered out of
        (1, "2024-01-01 00:00:00", "a"),  # attr order on purpose
        (1, "2024-01-01 01:00:00", "c"),
    ]
    spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).coalesce(1).write.parquet(f"{inp}/f1.parquet")

    out: list = []
    stream = (
        spark.readStream.schema("user_id long, ts timestamp_ntz, event_type string")
        .option("recursiveFileLookup", "true")
        .parquet(inp)
    )
    q = (
        user_state_intervals(stream)
        .writeStream.foreachBatch(lambda df, _e: out.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    allrows = spark.read.option("recursiveFileLookup", "true").parquet(inp)
    batch = sorted(
        (r.user_id, r.state, str(r.valid_from), str(r.valid_to))
        for r in user_state_intervals(allrows).collect()
    )
    streamed = sorted(
        (r.user_id, r.state, str(r.valid_from), str(r.valid_to)) for r in out
    )
    assert streamed == batch
    # the equal-ts 'a' change survives as a zero-width interval under 'b'
    assert (1, "a", "2024-01-01 00:00:00", "2024-01-01 00:00:00") in streamed


def test_streaming_quality_monitor_matches_batch(spark, tmp_path):
    # the same monitor plan on a real file stream (watermark + checkpoint)
    # must produce exactly the batch run's rows — integer micro-unit
    # quality aggregation makes the parity exact, not approximate
    from aicoe_osc_demo_spark.streaming.incremental import streaming_quality_monitor

    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(inp)
    rows = [
        ("2024-01-01 10:05:00", "web", "the quick brown fox jumps over a lazy dog and then it runs away"),
        ("2024-01-01 10:40:00", "web", "zz qq xx zz qq xx zz qq"),
        ("2024-01-01 11:10:00", "book", "it was the best of times and it was the worst of times in the city"),
    ]
    df = spark.createDataFrame(rows, ["ingest_ts", "source", "text"]).withColumn(
        "ingest_ts", F.col("ingest_ts").cast("timestamp")
    )
    df.coalesce(1).write.parquet(inp + "/f1.parquet")

    batch = {
        (str(r.window_start), r.source): (r.n_docs, r.avg_quality, r.avg_chars, r.en_share)
        for r in streaming_quality_monitor(df).collect()
    }

    stream = (
        spark.readStream.schema("ingest_ts timestamp, source string, text string")
        .option("recursiveFileLookup", "true")
        .parquet(inp)
    )
    agg = streaming_quality_monitor(stream)
    assert agg.isStreaming
    seen: list = []
    q = (
        agg.writeStream.foreachBatch(lambda bdf, _e: seen.extend(bdf.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = {
        (str(r.window_start), r.source): (r.n_docs, r.avg_quality, r.avg_chars, r.en_share)
        for r in seen
    }
    assert live == batch
    assert live[("2024-01-01 10:00:00", "web")][0] == 2
    # the stopword-free junk doc drags web's English share to 0.5
    assert live[("2024-01-01 10:00:00", "web")][3] == 0.5
    assert live[("2024-01-01 11:00:00", "book")][0] == 1


def test_stream_stream_interval_join_across_batches(spark, tmp_path):
    # the stream-stream stateful join: clicks attribute to impressions on
    # the same user within 30 min, even when the click arrives in a LATER
    # micro-batch / run than its impression (join state from checkpoint)
    from datetime import datetime

    from aicoe_osc_demo_spark.streaming.incremental import interval_join

    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    ckpt = str(tmp_path / "ck")
    os.makedirs(imp_dir)
    os.makedirs(clk_dir)

    t = lambda m: datetime(2024, 3, 1, 12, m)
    imps = [(1, t(0), "ad_a"), (2, t(5), "ad_b"), (3, t(10), "ad_c")]
    clicks_b1 = [(1, t(9)), (3, t(50))]  # u1 in-bound; u3 click 40min late -> OUT
    spark.createDataFrame(imps, ["user_id", "l_ts", "ad"]).write.parquet(
        imp_dir + "/f1.parquet"
    )
    spark.createDataFrame(clicks_b1, ["user_id", "r_ts"]).write.parquet(
        clk_dir + "/f1.parquet"
    )

    got: list[tuple] = []

    def run():
        li = (
            spark.readStream.option("recursiveFileLookup", "true")
            .schema("user_id long, l_ts timestamp, ad string")
            .parquet(imp_dir)
        )
        ri = (
            spark.readStream.option("recursiveFileLookup", "true")
            .schema("user_id long, r_ts timestamp")
            .parquet(clk_dir)
        )
        joined = interval_join(li, ri, within_minutes=30, watermark_minutes=60)
        q = (
            joined.writeStream.outputMode("append")
            .foreachBatch(
                lambda df, _eid: got.extend(
                    (r["user_id"], r["ad"]) for r in df.collect()
                )
            )
            .option("checkpointPath", ckpt)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert sorted(got) == [(1, "ad_a")]

    # a click for u2 lands in a later run: the impression is only in join
    # STATE (checkpoint), not in the new batch — it must still attribute
    spark.createDataFrame([(2, t(25))], ["user_id", "r_ts"]).write.parquet(
        clk_dir + "/f2.parquet"
    )
    run()
    assert sorted(got) == [(1, "ad_a"), (2, "ad_b")]

    # batch parity: the same operator over static frames gives the same set
    b = interval_join(
        spark.createDataFrame(imps, ["user_id", "l_ts", "ad"]),
        spark.createDataFrame(clicks_b1 + [(2, t(25))], ["user_id", "r_ts"]),
        within_minutes=30,
        watermark_minutes=60,
    )
    assert sorted((r["user_id"], r["ad"]) for r in b.collect()) == sorted(got)


def test_stream_stream_outer_join_emits_unmatched_after_watermark(spark, tmp_path):
    # leftOuter semantics under watermarks: a never-clicked impression is
    # held in state and emits with NULL right columns only once both
    # watermarks pass the last instant a match could still arrive —
    # exactly once, late but correct
    from datetime import datetime

    from aicoe_osc_demo_spark.streaming.incremental import interval_join

    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    ckpt = str(tmp_path / "ck")
    os.makedirs(imp_dir)
    os.makedirs(clk_dir)
    t = lambda h, m: datetime(2024, 3, 1, h, m)

    got: list[tuple] = []

    def run():
        li = (
            spark.readStream.option("recursiveFileLookup", "true")
            .schema("user_id long, l_ts timestamp, ad string")
            .parquet(imp_dir)
        )
        ri = (
            spark.readStream.option("recursiveFileLookup", "true")
            .schema("user_id long, r_ts timestamp")
            .parquet(clk_dir)
        )
        j = interval_join(
            li, ri, within_minutes=30, watermark_minutes=10, how="leftOuter"
        )
        q = (
            j.writeStream.outputMode("append")
            .foreachBatch(
                lambda df, _eid: got.extend(
                    (r["user_id"], r["ad"], r["r_ts"] is not None) for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, t(12, 0), "ad_a"), (2, t(12, 5), "ad_b")], ["user_id", "l_ts", "ad"]
    ).write.parquet(imp_dir + "/f1.parquet")
    spark.createDataFrame([(1, t(12, 9))], ["user_id", "r_ts"]).write.parquet(
        clk_dir + "/f1.parquet"
    )
    run()
    # only the match emits now: u2 might still convert within the bound
    assert sorted(got) == [(1, "ad_a", True)]

    # far-future events on BOTH sides push the watermarks past u2's bound
    spark.createDataFrame([(9, t(20, 0), "z")], ["user_id", "l_ts", "ad"]).write.parquet(
        imp_dir + "/f2.parquet"
    )
    spark.createDataFrame([(9, t(20, 0))], ["user_id", "r_ts"]).write.parquet(
        clk_dir + "/f2.parquet"
    )
    run()
    # u2 emits unmatched exactly once; the new pair matches normally
    assert sorted(got) == [(1, "ad_a", True), (2, "ad_b", False), (9, "z", True)]


def test_streaming_transition_counts_cross_batch_and_parity(spark, tmp_path):
    # transitions CROSS micro-batch boundaries via the per-entity carry;
    # the folded count log equals the batch transition_matrix over the
    # full history, and a late (pre-carry) event is dropped, not spliced
    import datetime as dt

    from aicoe_osc_demo_spark.operators.temporal import transition_matrix
    from aicoe_osc_demo_spark.streaming.incremental import (
        read_transition_counts,
        streaming_transition_counts,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, event_type string"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(u, mins, e):
        return (u, t0 + dt.timedelta(minutes=mins), e)

    b1 = [ev(1, 0, "a"), ev(1, 10, "b"), ev(2, 5, "a")]
    spark.createDataFrame(b1, schema).write.parquet(str(inp / "f1"))
    q = streaming_transition_counts(spark, str(inp), state, ckpt, schema)
    q.awaitTermination(120)

    # batch 2: user 1 continues (b -> c bridges the batches), user 2 gets a
    # LATE row (ts before its carry) that must be dropped, plus c -> a
    b2 = [ev(1, 20, "c"), ev(2, 1, "zz"), ev(2, 30, "c"), ev(2, 40, "a")]
    spark.createDataFrame(b2, schema).write.parquet(str(inp / "f2"))
    q2 = streaming_transition_counts(spark, str(inp), state, ckpt, schema)
    q2.awaitTermination(120)

    got = {
        (r["state"], r["next_state"]): r["n"]
        for r in read_transition_counts(spark, state).collect()
    }
    # full-history recompute WITHOUT the dropped late row
    kept = [r for r in b1 + b2 if r[2] != "zz"]
    full = spark.createDataFrame(kept, schema)
    want = {
        (r["state"], r["next_state"]): r["n"]
        for r in transition_matrix(full, "user_id", "event_type", "ts").collect()
    }
    assert got == want
    assert got[("b", "c")] == 1          # the cross-batch bridge for user 1
    assert ("a", "zz") not in got        # late row never spliced in

    # replay idempotence: foreachBatch is at-least-once — simulate the
    # crash window where the micro-batch's fold fully ran but the engine
    # died before writing the checkpoint commit marker.  On restart the
    # engine re-delivers the SAME batch with the SAME batch_id; the
    # committed carry version must short-circuit it so counts don't
    # double (pre-fix this appended the delta a second time).
    import pathlib

    def drop_last_commit():
        commits = pathlib.Path(ckpt) / "commits"
        last = sorted(p for p in commits.iterdir() if p.name.isdigit())[-1]
        last.unlink()
        crc = commits / f".{last.name}.crc"
        if crc.exists():
            crc.unlink()

    drop_last_commit()
    q3 = streaming_transition_counts(spark, str(inp), state, ckpt, schema)
    q3.awaitTermination(120)
    replayed = {
        (r["state"], r["next_state"]): r["n"]
        for r in read_transition_counts(spark, state).collect()
    }
    assert replayed == want

    # the OTHER crash window: delta landed but the carry commit did not.
    # The replay must recompute from the kept base version and overwrite
    # the same counts/batch_id=<N> directory — still no double count.
    import shutil

    from aicoe_osc_demo_spark.streaming.incremental import _committed_versions

    vs = _committed_versions(spark, f"{state}/carry_v")
    assert len(vs) >= 2  # latest + kept base
    drop_last_commit()
    shutil.rmtree(pathlib.Path(state) / "carry_v" / f"v={vs[-1]}")
    q4 = streaming_transition_counts(spark, str(inp), state, ckpt, schema)
    q4.awaitTermination(120)
    replayed = {
        (r["state"], r["next_state"]): r["n"]
        for r in read_transition_counts(spark, state).collect()
    }
    assert replayed == want

    # an interrupted carry overwrite (version dir without _SUCCESS) is
    # invisible to the committed-version listing, not silently treated
    # as a first-run bootstrap
    bogus = pathlib.Path(state) / "carry_v" / "v=99"
    bogus.mkdir(parents=True)
    (bogus / "part-corrupt.parquet").write_bytes(b"\x00not-parquet")
    assert 99 not in _committed_versions(spark, f"{state}/carry_v")


def test_streaming_lag_features_cross_batch_parity_and_replay(spark, tmp_path):
    # lags cross micro-batch boundaries via the per-entity carry: the
    # folded feature log equals the batch lag_features over the full
    # kept history (late rows dropped), seq keeps counting across
    # batches, and a replayed micro-batch cannot double-emit
    import datetime as dt
    import pathlib

    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.temporal import lag_features
    from aicoe_osc_demo_spark.streaming.incremental import (
        read_lag_features,
        streaming_lag_features,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, event_type string, value double"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(u, mins, e, v):
        return (u, t0 + dt.timedelta(minutes=mins), e, float(v))

    b1 = [ev(1, 0, "a", 1.0), ev(1, 10, "b", 4.0), ev(2, 5, "a", 2.0)]
    spark.createDataFrame(b1, schema).write.parquet(str(inp / "f1"))
    q = streaming_lag_features(spark, str(inp), state, ckpt, schema)
    q.awaitTermination(120)

    # batch 2: user 1 bridges (b -> c), user 2 gets a LATE row (dropped)
    b2 = [ev(1, 20, "c", 6.5), ev(2, 1, "zz", 9.0), ev(2, 30, "c", 5.0)]
    spark.createDataFrame(b2, schema).write.parquet(str(inp / "f2"))
    q2 = streaming_lag_features(spark, str(inp), state, ckpt, schema)
    q2.awaitTermination(120)

    def key(rows):
        return sorted(
            (r["user_id"], r["seq"], r["prev_state"], r["gap_s"], r["value_delta"])
            for r in rows
        )

    got = key(read_lag_features(spark, state).collect())
    kept = [r for r in b1 + b2 if r[2] != "zz"]
    full = spark.createDataFrame(kept, schema).withColumn(
        "s", F.col("ts").cast("timestamp").cast("long")
    )
    want = key(
        lag_features(full, "user_id", "s", "value", state_col="event_type").collect()
    )
    assert got == want
    # the cross-batch bridge: user 1's batch-2 row has prev_state 'b',
    # gap 600 s, delta 2.5, seq 3
    assert (1, 3, "b", 600, 2.5) in got

    # replay the last micro-batch (crash before checkpoint commit):
    # features/batch_id=<N> is overwritten, not appended — no double rows
    commits = pathlib.Path(ckpt) / "commits"
    last = sorted(p for p in commits.iterdir() if p.name.isdigit())[-1]
    last.unlink()
    crc = commits / f".{last.name}.crc"
    if crc.exists():
        crc.unlink()
    q3 = streaming_lag_features(spark, str(inp), state, ckpt, schema)
    q3.awaitTermination(120)
    assert key(read_lag_features(spark, state).collect()) == want


def test_streaming_attribution_cross_batch_and_parity(spark, tmp_path):
    # last-touch state survives micro-batch boundaries AND restarts; the
    # full-stream output matches the batch as-of formulation exactly
    import datetime as dt

    from aicoe_osc_demo_spark.streaming.stateful import (
        streaming_last_touch_attribution,
    )

    def ts(m):
        return dt.datetime(2024, 3, 1) + dt.timedelta(minutes=m)

    cols = "event_id long, user_id long, ts timestamp, event_type string, value double"
    b1 = [
        (1, 1, ts(0), "click", 0.0),
        (2, 1, ts(5), "purchase", 10.0),   # -> click
        (3, 2, ts(0), "view", 0.0),
        (4, 2, ts(400), "purchase", 20.0),  # 400 min > 60-min window -> none
    ]
    b2 = [
        (5, 1, ts(10), "purchase", 30.0),   # click state carried from b1
        (6, 1, ts(20), "signup", 0.0),
        (7, 1, ts(30), "purchase", 40.0),   # -> signup (newer touch wins)
        (8, 3, ts(0), "purchase", 50.0),    # user never touched -> none
    ]
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(inp)
    spark.createDataFrame(b1, cols).coalesce(1).write.parquet(inp + "/b1.parquet")

    emitted: list[tuple] = []

    def run():
        stream = (
            spark.readStream.schema(cols)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(inp)
        )
        q = (
            streaming_last_touch_attribution(stream, window_seconds=3600)
            .writeStream.foreachBatch(
                lambda df, _e: emitted.extend(
                    (r.event_id, r.channel, r.value) for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert sorted(emitted) == [(2, "click", 10.0), (4, "(none)", 20.0)]

    # restart with a second file: state (user 1's click) must be restored
    spark.createDataFrame(b2, cols).coalesce(1).write.parquet(inp + "/b2.parquet")
    run()
    assert sorted(emitted) == [
        (2, "click", 10.0),
        (4, "(none)", 20.0),
        (5, "click", 30.0),
        (7, "signup", 40.0),
        (8, "(none)", 50.0),
    ]

    # batch parity on the full event set
    batch = spark.createDataFrame(b1 + b2, cols)
    got = {
        (r.event_id, r.channel, r.value)
        for r in streaming_last_touch_attribution(
            batch, window_seconds=3600
        ).collect()
    }
    assert got == set(emitted)


def test_streaming_attribution_tie_rule_matches_batch(spark):
    # equal-timestamp touch IS visible to a same-instant conversion, and
    # among equal-ts touches the lexicographically largest channel wins —
    # in BOTH the streaming state function and the batch as-of fallback
    import datetime as dt

    from aicoe_osc_demo_spark.streaming.stateful import (
        streaming_last_touch_attribution,
    )

    t0 = dt.datetime(2024, 5, 1)
    cols = "event_id long, user_id long, ts timestamp, event_type string, value double"
    rows = [
        (1, 1, t0, "click", 0.0),
        (2, 1, t0, "view", 0.0),      # same ts: 'view' > 'click' wins
        (3, 1, t0, "purchase", 5.0),  # same-instant conversion sees it
    ]
    batch = spark.createDataFrame(rows, cols)
    got = streaming_last_touch_attribution(batch, window_seconds=60).collect()
    assert len(got) == 1 and got[0]["channel"] == "view"


def test_streaming_attribution_state_fn_tie_rule():
    # drive the state function directly with a stub GroupState: the
    # same-instant touch (kind-sorted first) is credited, and among
    # equal-ts touches the max channel wins
    import datetime as dt

    import pandas as pd

    from aicoe_osc_demo_spark.streaming.stateful import _attr_update

    class _State:
        exists = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    t0 = dt.datetime(2024, 5, 1)
    pdf = pd.DataFrame(
        {
            "event_id": [3, 1, 2],
            "user_id": [1, 1, 1],
            "ts": [t0, t0, t0],
            "event_type": ["purchase", "click", "view"],
            "value": [5.0, 0.0, 0.0],
            "_window_ns": [60 * 10**9] * 3,
        }
    )
    out = list(_attr_update((1,), iter([pdf]), _State()))
    assert len(out) == 1 and out[0]["channel"].iloc[0] == "view"


def test_streaming_linear_attribution_cross_batch_restart_and_parity(spark, tmp_path):
    # linear credit state (ALL in-window touches, duplicates kept) survives
    # micro-batch boundaries and restarts; full-stream rollup matches the
    # batch join formulation exactly and conserves the conversion count
    import datetime as dt

    from aicoe_osc_demo_spark.streaming.stateful import (
        streaming_linear_attribution,
    )

    def ts(m):
        return dt.datetime(2024, 3, 1) + dt.timedelta(minutes=m)

    cols = "event_id long, user_id long, ts timestamp, event_type string, value double"
    b1 = [
        (1, 1, ts(0), "click", 0.0),
        (2, 1, ts(2), "view", 0.0),
        (3, 1, ts(5), "purchase", 10.0),    # click+view -> 0.5 each
        (4, 2, ts(0), "view", 0.0),
        (5, 2, ts(400), "purchase", 20.0),  # outside 60-min window -> none
    ]
    b2 = [
        (6, 1, ts(10), "purchase", 30.0),   # click+view carried from b1
        (7, 1, ts(20), "signup", 0.0),
        (8, 1, ts(30), "purchase", 40.0),   # click+view+signup -> 1/3 each
        (9, 3, ts(0), "purchase", 50.0),    # never touched -> none
        (10, 2, ts(405), "click", 0.0),
        (11, 2, ts(410), "purchase", None),  # NULL value -> NULL rev, both paths
    ]
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(inp)
    spark.createDataFrame(b1, cols).coalesce(1).write.parquet(inp + "/b1.parquet")

    emitted: list[tuple] = []

    def run():
        stream = (
            spark.readStream.schema(cols)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(inp)
        )
        q = (
            streaming_linear_attribution(stream, window_seconds=3600)
            .writeStream.foreachBatch(
                lambda df, _e: emitted.extend(
                    (r.event_id, r.channel, round(r.credit, 6),
                     None if r.rev is None else round(r.rev, 2))
                    for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert sorted(emitted) == [
        (3, "click", 0.5, 5.0),
        (3, "view", 0.5, 5.0),
        (5, "(none)", 1.0, 20.0),
    ]

    spark.createDataFrame(b2, cols).coalesce(1).write.parquet(inp + "/b2.parquet")
    run()
    want = [
        (3, "click", 0.5, 5.0),
        (3, "view", 0.5, 5.0),
        (5, "(none)", 1.0, 20.0),
        (6, "click", 0.5, 15.0),
        (6, "view", 0.5, 15.0),
        (8, "click", 0.333333, 13.33),
        (8, "signup", 0.333333, 13.33),
        (8, "view", 0.333333, 13.33),
        (9, "(none)", 1.0, 50.0),
        (11, "click", 1.0, None),
    ]
    assert sorted(emitted, key=str) == sorted(want, key=str)

    # exact credit conservation: credits sum to the conversion count (6)
    assert abs(sum(c for _, _, c, _ in emitted) - 6.0) < 1e-4

    # batch parity on the full event set (per-credit rollup)
    batch = spark.createDataFrame(b1 + b2, cols)
    got = sorted(
        (
            (r.event_id, r.channel, round(r.credit, 6),
             None if r.rev is None else round(r.rev, 2))
            for r in streaming_linear_attribution(batch, window_seconds=3600).collect()
        ),
        key=str,
    )
    assert got == sorted(emitted, key=str)


def test_streaming_linear_attribution_counts_duplicate_touches(spark):
    # the batch join matches touch ROWS: two same-channel touches both
    # count toward k (credit 1/3 each + the other channel), in both the
    # batch fallback and the state function
    import datetime as dt

    import pandas as pd

    from aicoe_osc_demo_spark.streaming.stateful import (
        _linear_attr_update,
        streaming_linear_attribution,
    )

    t0 = dt.datetime(2024, 5, 1)
    cols = "event_id long, user_id long, ts timestamp, event_type string, value double"
    rows = [
        (1, 1, t0, "click", 0.0),
        (2, 1, t0, "click", 0.0),
        (3, 1, t0, "view", 0.0),
        (4, 1, t0, "purchase", 9.0),
    ]
    got = sorted(
        (r.channel, round(r.credit, 6), round(r.rev, 2))
        for r in streaming_linear_attribution(
            spark.createDataFrame(rows, cols), window_seconds=60
        ).collect()
    )
    assert got == [
        ("click", 0.333333, 3.0),
        ("click", 0.333333, 3.0),
        ("view", 0.333333, 3.0),
    ]

    class _State:
        exists = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    pdf = pd.DataFrame(
        {
            "event_id": [4, 1, 2, 3],
            "user_id": [1, 1, 1, 1],
            "ts": [t0] * 4,
            "event_type": ["purchase", "click", "click", "view"],
            "value": [9.0, 0.0, 0.0, 0.0],
            "_window_ns": [60 * 10**9] * 4,
        }
    )
    st = _State()
    out = pd.concat(list(_linear_attr_update((1,), iter([pdf]), st)))
    assert sorted(
        (r.channel, round(r.credit, 6)) for r in out.itertuples()
    ) == [("click", 0.333333), ("click", 0.333333), ("view", 0.333333)]
    # state pruned to the in-window touches, duplicates retained
    assert len(st.get[0]) == 3


def test_streaming_heavy_hitters_cross_batch_restart_and_replay_parity(spark, tmp_path):
    # sharded Misra-Gries state survives micro-batch boundaries and
    # restarts; the final sketch equals a Python MG replay folded in the
    # same per-batch sorted order, and the MG guarantee holds (every item
    # with true count > n_shard/capacity is present with a lower-bound
    # count <= true count)
    from aicoe_osc_demo_spark.streaming.stateful import (
        _mg_fold,
        streaming_heavy_hitters,
    )

    cols = "event_id long, item string"
    b1 = [(i, "hot") for i in range(30)] + [(100 + i, f"rare{i}") for i in range(10)]
    b2 = [(200 + i, "hot") for i in range(20)] + [(300 + i, "warm") for i in range(15)]
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(inp)
    spark.createDataFrame(b1, cols).coalesce(1).write.parquet(inp + "/b1.parquet")

    snapshots: dict[int, dict] = {}

    def run():
        stream = (
            spark.readStream.schema(cols)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(inp)
        )

        def sink(df, _e):
            rows = df.collect()
            # update-mode snapshot: rebuild each emitted shard's dict
            for shard in {r.shard for r in rows}:
                snapshots[shard] = {
                    r.item: r.mg_count for r in rows if r.shard == shard
                }

        q = (
            streaming_heavy_hitters(stream, capacity=4, shards=2)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(b2, cols).coalesce(1).write.parquet(inp + "/b2.parquet")
    run()  # restart: shard states must be restored from the checkpoint

    # Python replay: same sharding (xxhash64) and same per-batch sort
    from pyspark.sql import functions as F

    def shard_of(vals):
        rows = (
            spark.createDataFrame([(v,) for v in vals], "item string")
            .select("item", F.pmod(F.xxhash64(F.col("item")), F.lit(2)).cast("int").alias("s"))
            .collect()
        )
        return {r.item: r.s for r in rows}

    all_items = [r[1] for r in b1 + b2]
    smap = shard_of(list(set(all_items)))
    expect: dict[int, dict] = {0: {}, 1: {}}
    for batch in (b1, b2):
        per_shard = {0: [], 1: []}
        for _eid, it in batch:
            per_shard[smap[it]].append(it)
        for s, vals in per_shard.items():
            _mg_fold(expect[s], sorted(vals), 4)
    expect = {s: d for s, d in expect.items() if d}
    got = {s: d for s, d in snapshots.items() if d}
    assert got == expect

    # guarantee: 'hot' (true 50) and 'warm' (true 15) must be present with
    # lower-bound counts <= their true counts
    merged = {}
    for d in got.values():
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert "hot" in merged and merged["hot"] <= 50
    assert "warm" in merged and merged["warm"] <= 15

    # batch (non-streaming) form: same fold on a single batch
    batch_out = streaming_heavy_hitters(
        spark.createDataFrame(b1 + b2, cols), capacity=4, shards=2
    ).collect()
    bm = {}
    for r in batch_out:
        bm[r.item] = bm.get(r.item, 0) + r.mg_count
    assert "hot" in bm and bm["hot"] <= 50
