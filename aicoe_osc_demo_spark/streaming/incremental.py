"""Incremental processing (§2.10) — the reference has no streaming runtime;
its incremental semantics are per-file skip-processed checks
(ref: /root/reference/src/components/preprocessing/pdf_text_extractor.py:129-139,
src/models/relevance_infer.py:79-92).  Structured Streaming's file source +
checkpoint gives the same exactly-once-per-file guarantee without hand-rolled
existence checks; ``foreachBatch`` reuses the batch operators unchanged.

Also provides the event-time windowed aggregations and sessionization a
stream table needs (watermarked for state cleanup at scale).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def incremental_file_pipeline(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    fmt: str = "parquet",
    schema=None,
) -> StreamingQuery:
    """Exactly-once-per-file incremental pipeline: the checkpoint is the
    processed-file ledger (replaces P10's existence probes)."""
    reader = spark.readStream.format(fmt).option("recursiveFileLookup", "true")
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.load(input_dir)
    return (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts/sums per event_type.  Works on both
    batch and streaming DataFrames; the watermark bounds state on streams."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    # value is cent-exact money: per-row integer-cent quantize + exact
    # BIGINT sum is lossless and accumulation-order-proof (r11 flake
    # audit — a raw SUM(double) can flip a 6-dp round between engines)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(cents) / 100.0, 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Streaming member of the dedup family: exact content dedup across
    micro-batches via ``dropDuplicates`` on the md5 fingerprint — Structured
    Streaming keeps the seen-fingerprint set in checkpointed state, so a
    document arriving twice (any batch, any order) is emitted once.  This is
    the continuous form of ``operators/dedup.py:incremental_dedup``: the
    state store IS the ledger, no hand-rolled anti-join.

    At scale, pass ``watermark=(event_time_col, delay)`` so the state
    evicts fingerprints older than the late-data horizon (unbounded state
    is the classic streaming-dedup failure mode).  Works on batch frames
    too (plain dropDuplicates), so the same code runs in backfill.
    """
    from ..functions.analysis import doc_fingerprint

    src = docs.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
    if src.isStreaming and watermark is not None:
        col, delay = watermark
        src = src.withWatermark(col, delay)
        return src.dropDuplicatesWithinWatermark(["fingerprint"])
    return src.dropDuplicates(["fingerprint"])


def streaming_near_dedup_pipeline(
    spark: SparkSession,
    input_dir: str,
    ledger_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> StreamingQuery:
    """Continuous NEAR-dedup: the streaming form of
    ``operators/dedup.py:incremental_near_dedup``.  Each micro-batch is
    screened against the persistent MinHash signature ledger (8 longs per
    accepted doc, parquet at ``ledger_dir``); accepted documents append to
    ``output_dir`` and their signatures append to the ledger, so
    near-duplicates of anything accepted earlier — previous batch or
    previous run — are dropped.

    Exactly-once: the file-source checkpoint is the processed-file ledger,
    and the signature ledger only grows from accepted batches.  State is
    the ledger parquet, not executor memory — restart-safe and shared by
    the batch backfill path (same operator, same table).
    """
    from ..operators.dedup import incremental_near_dedup

    sig_schema = "doc_id long, " + ", ".join(f"mh{i} long" for i in range(8))

    def screen(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        try:
            ledger = s.read.parquet(ledger_dir)
        except Exception:
            ledger = s.createDataFrame([], sig_schema)
        accepted_sigs = incremental_near_dedup(
            batch, ledger, text_col=text_col, id_col=id_col, threshold=threshold
        )
        accepted = batch.join(
            accepted_sigs.select(F.col("doc_id").alias(id_col)), on=id_col, how="left_semi"
        )
        accepted.write.mode("append").parquet(output_dir)
        accepted_sigs.write.mode("append").parquet(ledger_dir)

    return incremental_file_pipeline(
        spark, input_dir, checkpoint_dir, screen, fmt="parquet", schema=schema
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user (batch form): a new session starts
    when the gap to the previous event exceeds the threshold.  Streaming form
    would use ``session_window``/``applyInPandasWithState``; batch form is a
    lag + running-sum window — one shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # ts may be TIMESTAMP or TIMESTAMP_NTZ; route through timestamp so the
    # epoch-seconds cast works for both (session TZ is pinned UTC upstream)
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (
        events.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w))
        .drop("new_session")
    )


def streaming_quality_monitor(
    docs: DataFrame,
    time_col: str = "ingest_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed corpus-quality telemetry per source — the live monitor a
    continuous ingestion pipeline exports to its curation dashboard:
    document volume, mean quality score, mean length, and English share
    per (ingest window, source).

    Same batch/stream duality as ``windowed_event_counts``: the plan runs
    unchanged in backfill (batch) and live (watermarked streaming agg, so
    per-window state evicts once the late-data horizon passes).  Quality
    scores aggregate as integer micro-units, so the means are
    summation-order-free and batch/stream/backfill runs agree exactly.

    Scale: one watermarked groupBy — state is (windows x sources) rows,
    independent of document volume; document text never enters state.
    """
    from ..functions.analysis import lang_id, quality_score

    src = docs
    if docs.isStreaming:
        src = docs.withWatermark(time_col, watermark)
    rows = src.select(
        F.window(F.col(time_col), window).alias("w"),
        F.col("source"),
        F.length("text").alias("n_chars"),
        F.floor(quality_score(F.col("text")) * 1e6 + F.lit(0.5)).cast("long").alias("qi"),
        # the canonical language gate, so the dashboard's en_share can
        # never diverge from the batch language-share reports
        (lang_id(F.col("text")) == "en").alias("en"),
    )
    n = F.count(F.lit(1))
    return rows.groupBy("w", "source").agg(
        n.cast("long").alias("n_docs"),
        F.round(F.sum("qi").cast("double") / n / F.lit(1e6), 6).alias("avg_quality"),
        F.round(F.sum("n_chars").cast("double") / n, 6).alias("avg_chars"),
        F.round(F.avg(F.when(F.col("en"), 1.0).otherwise(0.0)), 6).alias("en_share"),
    ).select(
        F.col("w.start").alias("window_start"),
        "source",
        "n_docs",
        "avg_quality",
        "avg_chars",
        "en_share",
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within_minutes: int = 30,
    watermark_minutes: int = 60,
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join (the ad-attribution shape: right events
    attach to the most recent window of left events on the same key):
    ``l.key = r.key AND r.ts ∈ [l.ts, l.ts + within_minutes]``.

    ``how='leftOuter'`` adds the non-converting left rows: on streams an
    unmatched left event is held in state and emitted with NULL right
    columns only once BOTH watermarks have passed the point where a
    match could still arrive — so "impression with no click" appears
    exactly once, late but correct (pinned by
    ``test_stream_stream_outer_join_emits_unmatched_after_watermark``).

    The SAME code path serves batch AND streams: on streaming inputs the
    watermarks plus the two-sided time bound are exactly what Structured
    Streaming requires to know when buffered rows can never match again —
    each side's join state expires ``watermark + within`` behind its
    event-time frontier, so state is bounded by delay, not by stream
    length.  On batch inputs the watermark is a no-op and the plan is a
    plain range-condition equi-join (same family as
    ``operators/temporal.py``'s binned range join, which is the shape to
    use when a BATCH interval join is too big for the time-bound buffer).

    Matches arriving in DIFFERENT micro-batches (a click trailing its
    impression by minutes) join from state — pinned by
    ``test_stream_stream_interval_join_across_batches``.
    """
    l_wm = (
        left.withWatermark(left_ts, f"{watermark_minutes} minutes")
        if left.isStreaming
        else left
    )
    r_wm = (
        right.withWatermark(right_ts, f"{watermark_minutes} minutes")
        if right.isStreaming
        else right
    )
    cond = (
        (l_wm[key] == r_wm[key])
        & (r_wm[right_ts] >= l_wm[left_ts])
        & (r_wm[right_ts] <= l_wm[left_ts] + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return l_wm.join(r_wm, cond, how).drop(r_wm[key])


def _committed_versions(spark: SparkSession, root_dir: str) -> list[int]:
    """Sorted batch-ids of committed ``v=<N>`` version directories under
    ``root_dir`` — committed means the ``_SUCCESS`` marker exists, so a
    write interrupted mid-overwrite is invisible rather than corrupt."""
    from ..operators.layout import _hadoop_fs

    fs, root, jvm = _hadoop_fs(spark, root_dir)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("v=") and fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        ):
            out.append(int(name[2:]))
    return sorted(out)


def streaming_transition_counts(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema,
    entity_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
) -> StreamingQuery:
    """Continuous first-order transition counts: the streaming form of
    ``operators/temporal.py:transition_matrix``, maintained incrementally
    because transitions CROSS micro-batch boundaries — the last event of
    each entity must pair with its first event in a later batch, which a
    stateless per-batch aggregate misses.

    State is two parquet tables under ``state_dir`` (restart-safe,
    shared with batch readers):
    - ``carry_v/v=<batch_id>/`` — one row per entity: the latest
      (ts, state) seen, the bridge for the next cross-batch transition.
      Versioned per batch; a version counts as committed only when its
      ``_SUCCESS`` marker exists, and it is the LAST write of the fold,
      so its presence proves the whole batch (delta included) landed.
    - ``counts/batch_id=<N>/`` — per-batch (state, next_state, n)
      deltas; readers fold them with ``merge_agg_state`` semantics
      (sum per pair), so writes stay tiny and contention-free.

    Exactly-once despite at-least-once ``foreachBatch``: a replayed
    micro-batch either (a) finds its committed carry version and skips
    entirely, or (b) recomputes from the SAME base carry it used before
    the crash and mode('overwrite')s the same ``counts/batch_id=<N>``
    directory — the delta can never be applied twice.  An interrupted
    carry write leaves a version without ``_SUCCESS``, which the replay
    ignores and overwrites — corruption cannot silently reset state to
    first-run bootstrap (bootstrap happens only when NO committed
    version exists).

    Ordering contract (same as the streaming SCD2 ledger): per-entity
    event time must be monotone ACROSS batches — a batch row at or
    before the entity's carried timestamp is dropped as late rather than
    spliced into history.  In-batch disorder is fine (the window sorts).

    Each micro-batch touches batch-sized and entity-sized data only; the
    count log grows by at most the state-vocabulary square per batch.
    """
    from ..operators.temporal import transition_matrix

    carry_root = f"{state_dir}/carry_v"
    counts_dir = f"{state_dir}/counts"

    def fold(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        versions = _committed_versions(s, carry_root)
        if batch_id in versions:
            # replayed batch already fully applied (the carry version is
            # the fold's final write) — idempotent no-op
            return
        base = [v for v in versions if v < batch_id]
        if base:
            carry = s.read.parquet(f"{carry_root}/v={base[-1]}")
        else:
            # first run: an empty carry with types derived from the batch
            carry = batch.select(
                entity_col,
                F.col(ts_col).cast("timestamp").alias("_carry_ts"),
                F.col(state_col).alias("_carry_state"),
            ).limit(0)
        fresh = batch.join(carry, on=entity_col, how="left").filter(
            F.col("_carry_ts").isNull() | (F.col(ts_col) > F.col("_carry_ts"))
        )
        bridge = carry.join(
            fresh.select(entity_col).distinct(), on=entity_col, how="left_semi"
        ).select(
            entity_col,
            F.col("_carry_ts").alias(ts_col),
            F.col("_carry_state").alias(state_col),
        )
        seq = fresh.select(entity_col, ts_col, state_col).unionByName(bridge)
        delta = transition_matrix(seq, entity_col, state_col, ts_col).select(
            "state", "next_state", "n"
        )
        delta.write.mode("overwrite").parquet(f"{counts_dir}/batch_id={batch_id}")
        w = Window.partitionBy(entity_col).orderBy(F.desc(ts_col))
        new_tail = (
            fresh.select(entity_col, ts_col, state_col)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                entity_col,
                F.col(ts_col).cast("timestamp").alias("_carry_ts"),
                F.col(state_col).alias("_carry_state"),
            )
        )
        merged = (
            carry.unionByName(new_tail)
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(entity_col).orderBy(F.desc("_carry_ts"))
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # commit: the carry version's _SUCCESS is the batch's commit marker
        merged.write.mode("overwrite").parquet(f"{carry_root}/v={batch_id}")
        # GC superseded versions, keeping the immediate base: a replay of
        # THIS batch short-circuits on the committed v=batch_id, and the
        # kept base covers the crash window where the delta landed but
        # this commit did not (the replay recomputes from the same base)
        from ..operators.layout import _hadoop_fs

        fs, _, jvm = _hadoop_fs(s, carry_root)
        for v in base[:-1]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{carry_root}/v={v}"), True)

    return incremental_file_pipeline(
        spark, input_dir, checkpoint_dir, fold, fmt="parquet", schema=schema
    )


def read_transition_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the append-only count log into current (state, next_state, n)
    totals — merge_agg_state semantics over the streaming delta log."""
    from ..operators.relational import merge_agg_state

    log = spark.read.parquet(f"{state_dir}/counts").select(
        "state", "next_state", "n"
    )
    empty = spark.createDataFrame([], "state string, next_state string, n long")
    return merge_agg_state(empty, log, ["state", "next_state"], ["n"])


def streaming_lag_features(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    state_col: str = "event_type",
) -> StreamingQuery:
    """Continuous lag/delta feature building: the streaming form of
    ``operators/temporal.py:lag_features``, maintained incrementally
    because lags CROSS micro-batch boundaries — the first event of an
    entity in a batch must take its prev_state / gap / delta from the
    entity's LAST event in an earlier batch, and the sequence index must
    keep counting where the previous batch stopped.

    State layout (the exactly-once contract of
    ``streaming_transition_counts``):
    - ``carry_v/v=<batch_id>/`` — per entity: latest (ts, state, value)
      plus the cumulative sequence count; committed via ``_SUCCESS``,
      written LAST so its presence proves the whole batch landed;
    - ``features/batch_id=<N>/`` — the batch's feature rows, written
      with mode('overwrite') so a replayed batch can never double-emit.

    Ordering contract: per-entity event time must be monotone ACROSS
    batches (late rows — at or before the carried timestamp — are
    dropped); in-batch disorder is fine, the window sorts.

    Each micro-batch touches batch-sized plus entity-sized data only.
    Read results with ``read_lag_features``.
    """
    from pyspark.sql import Window as W

    carry_root = f"{state_dir}/carry_v"
    feat_dir = f"{state_dir}/features"

    def fold(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        versions = _committed_versions(s, carry_root)
        if batch_id in versions:
            return  # replay of a fully-applied batch — idempotent no-op
        base = [v for v in versions if v < batch_id]
        if base:
            carry = s.read.parquet(f"{carry_root}/v={base[-1]}")
        else:
            carry = batch.select(
                entity_col,
                F.col(ts_col).cast("timestamp").alias("_c_ts"),
                F.col(state_col).alias("_c_state"),
                F.col(value_col).cast("double").alias("_c_value"),
                F.lit(0).cast("long").alias("_c_seq"),
            ).limit(0)
        fresh = batch.join(carry, on=entity_col, how="left").filter(
            F.col("_c_ts").isNull() | (F.col(ts_col) > F.col("_c_ts"))
        )
        w = W.partitionBy(entity_col).orderBy(F.col(ts_col))
        out = (
            fresh.withColumn("_rn", F.row_number().over(w))
            .withColumn(
                "prev_state",
                F.coalesce(F.lag(state_col).over(w), F.col("_c_state")),
            )
            .withColumn(
                "_prev_ts",
                F.coalesce(F.lag(ts_col).over(w), F.col("_c_ts")),
            )
            .withColumn(
                "_prev_value",
                F.coalesce(
                    F.lag(F.col(value_col).cast("double")).over(w),
                    F.col("_c_value"),
                ),
            )
            .withColumn(
                "gap_s",
                (
                    F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                    - F.unix_timestamp(F.col("_prev_ts").cast("timestamp"))
                ).cast("long"),
            )
            .withColumn(
                "value_delta",
                F.round(F.col(value_col).cast("double") - F.col("_prev_value"), 6),
            )
            .withColumn(
                "seq", (F.coalesce(F.col("_c_seq"), F.lit(0)) + F.col("_rn")).cast("long")
            )
        )
        feats = out.select(
            entity_col, ts_col, state_col, value_col,
            "prev_state", "gap_s", "value_delta", "seq",
        )
        feats.write.mode("overwrite").parquet(f"{feat_dir}/batch_id={batch_id}")
        new_tail = (
            out.withColumn(
                "_rn_last",
                F.row_number().over(W.partitionBy(entity_col).orderBy(F.desc(ts_col))),
            )
            .filter(F.col("_rn_last") == 1)
            .select(
                entity_col,
                F.col(ts_col).cast("timestamp").alias("_c_ts"),
                F.col(state_col).alias("_c_state"),
                F.col(value_col).cast("double").alias("_c_value"),
                F.col("seq").alias("_c_seq"),
            )
        )
        merged = (
            carry.unionByName(new_tail)
            .withColumn(
                "_rn",
                F.row_number().over(
                    W.partitionBy(entity_col).orderBy(F.desc("_c_ts"))
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        merged.write.mode("overwrite").parquet(f"{carry_root}/v={batch_id}")
        from ..operators.layout import _hadoop_fs

        fs, _, jvm = _hadoop_fs(s, carry_root)
        for v in base[:-1]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{carry_root}/v={v}"), True)

    return incremental_file_pipeline(
        spark, input_dir, checkpoint_dir, fold, fmt="parquet", schema=schema
    )


def read_lag_features(spark: SparkSession, state_dir: str) -> DataFrame:
    """All feature rows emitted so far (batch_id partition column
    included for lineage)."""
    return spark.read.parquet(f"{state_dir}/features")


def windowed_ohlc_bars(
    events: DataFrame,
    window: str = "1 hour",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    id_col: str | None = "event_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """OHLC bars as a batch/streaming-dual aggregate: the same
    min_by/max_by tumbling-window rollup as ``operators.temporal.
    ohlc_bars`` expressed over ``F.window`` so it runs unchanged on a
    Structured Streaming source (min_by/max_by partials merge like
    MIN/MAX, so the streaming state per (window, keys) is one bar --
    bounded, watermark-evictable).  Ties at the same timestamp break by
    ``id_col`` exactly as in the batch operator, so foldded micro-batches
    replay to the identical bars a batch run produces (test-pinned).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    keys = key_cols or []
    order = (
        F.struct(F.col("ts"), F.col(id_col)) if id_col else F.struct(F.col("ts"))
    )
    v = F.col(value_col).cast("double")
    return (
        src.groupBy(F.window("ts", window).alias("w"), *keys)
        .agg(
            F.round(F.min_by(v, order), 6).alias("open"),
            F.round(F.max(v), 6).alias("high"),
            F.round(F.min(v), 6).alias("low"),
            F.round(F.max_by(v, order), 6).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(F.col("w.start").alias("bucket"), *keys, "open", "high", "low", "close", "n")
    )
