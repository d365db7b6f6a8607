"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 — the Spark-native home for per-key incremental state the
reference faked with skip-processed file checks).

``running_user_counts`` keeps a per-user (count, sum) accumulator across
micro-batches; state survives restarts through the checkpoint.  This is the
pattern a 100 TB streaming ingest uses for per-entity rollups without
reprocessing history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, total_events long, total_value double"
STATE_SCHEMA = "count long, value_sum double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        count, value_sum = state.get
    else:
        count, value_sum = 0, 0.0
    for pdf in pdfs:
        count += len(pdf)
        value_sum += float(pdf["value"].sum())
    state.update((count, value_sum))
    yield pd.DataFrame(
        {"user_id": [user_id], "total_events": [count], "total_value": [round(value_sum, 6)]}
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) over a stream of events.  On a batch
    DataFrame this degrades to a plain groupBy aggregate with identical
    output — same semantics, no state needed."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("total_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- Streaming SCD2 maintenance ---------------------------------------------

SCD2_OUTPUT_SCHEMA = (
    "user_id long, state string, valid_from timestamp, valid_to timestamp"
)
SCD2_STATE_SCHEMA = "last_state string, last_from_ns long"


def _scd2_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_state, last_from_ns = state.get
    else:
        last_state, last_from_ns = None, None
    closed: list[tuple] = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    # deterministic replay order matches the batch op's (ts, attr) tiebreak
    batch = batch.sort_values(["ts", "event_type"], ignore_index=True)
    for ts, attr in zip(batch["ts"], batch["event_type"]):
        ts_ns = pd.Timestamp(ts).value
        if last_from_ns is not None and (
            ts_ns < last_from_ns
            or (ts_ns == last_from_ns and attr <= last_state)
        ):
            # late delivery, or an equal-ts row that would sort AT or
            # BEFORE the accepted change under the batch (ts, attr)
            # order: dropped, the interval ledger stays append-only
            continue
        if last_state is None:
            last_state, last_from_ns = attr, ts_ns
        elif attr != last_state:
            # equal-ts accepted changes (attr > last_state) close a
            # zero-width interval — exactly what the batch
            # scd2_from_changelog's lead(ts) produces for (ts, attr) ties
            closed.append((user_id, last_state, last_from_ns, ts_ns))
            last_state, last_from_ns = attr, ts_ns
    state.update((last_state, last_from_ns))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in closed],
                "state": [r[1] for r in closed],
                "valid_from": [pd.Timestamp(r[2]) for r in closed],
                "valid_to": [pd.Timestamp(r[3]) for r in closed],
            }
        )


def user_state_intervals(events: DataFrame) -> DataFrame:
    """Streaming SCD2 maintenance: per-user (ts, event_type) change streams
    become an APPEND-ONLY ledger of CLOSED validity intervals; the open
    interval lives in the operator state (and in the checkpoint, so
    restarts resume mid-dimension).  The batch form degrades to
    ``scd2_from_changelog``'s non-current rows — identical output for
    in-order data, INCLUDING duplicate-timestamp change streams: equal-ts
    rows apply under the same (ts, attr) tiebreak as the batch window
    order, closing zero-width intervals exactly as lead(ts) does.

    Contract: per key, rows strictly before the last accepted change (or
    sorting at-or-before it under (ts, attr)) are dropped — the ledger is
    append-only; feed event-time-ordered streams or pre-dedupe with a
    watermark upstream.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        from ..operators.relational import scd2_from_changelog

        return (
            scd2_from_changelog(
                events.select("user_id", "ts", "event_type"),
                ["user_id"],
                "ts",
                ["event_type"],
            )
            .filter(~F.col("is_current"))
            .select(
                "user_id",
                F.col("event_type").alias("state"),
                "valid_from",
                "valid_to",
            )
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _scd2_update,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Streaming last-touch attribution ----------------------------------------

ATTR_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, channel string"
)
ATTR_STATE_SCHEMA = "last_touch_ns long, last_channel string"

_ATTR_TOUCH_TYPES = ("click", "view", "signup")
_ATTR_CONV_TYPE = "purchase"


def _attr_update(key, pdfs, state):
    """Per-user state = (latest touch ts, its channel).  Rows are replayed
    in (ts, event_id) order inside the batch; a conversion is credited to
    the most recent touch at-or-before it within the window, '(none)'
    otherwise.  Window length rides in on the `_window_ns` column (same
    value every row) so the state function stays schema-driven."""
    (user_id,) = key
    if state.exists:
        last_ns, last_channel = state.get
    else:
        last_ns, last_channel = None, None
    out: list[tuple] = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    # tie order matches the batch as-of semantics: at an equal timestamp
    # a TOUCH is visible to a conversion (asof t.ts >= q.ts includes
    # equality), so touches sort before conversions; among equal-ts
    # touches the MAX channel wins (the batch form pre-dedupes to
    # MAX(channel) per (user, ts))
    batch = batch.assign(
        _kind=(batch["event_type"] == _ATTR_CONV_TYPE).astype(int)
    ).sort_values(["ts", "_kind", "event_id"], kind="mergesort")
    window_ns = int(batch["_window_ns"].iloc[0]) if len(batch) else 0
    for row in batch.itertuples(index=False):
        ts_ns = int(pd.Timestamp(row.ts).value)
        if row.event_type in _ATTR_TOUCH_TYPES:
            if (
                last_ns is None
                or ts_ns > last_ns
                or (ts_ns == last_ns and row.event_type > (last_channel or ""))
            ):
                last_ns, last_channel = ts_ns, row.event_type
        elif row.event_type == _ATTR_CONV_TYPE:
            if (
                last_ns is not None
                and ts_ns - last_ns <= window_ns
                and ts_ns >= last_ns
            ):
                ch = last_channel
            else:
                ch = "(none)"
            out.append((user_id, row.event_id, row.ts, row.value, ch))
    if last_ns is not None:
        state.update((last_ns, last_channel))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts", "value", "channel"]
        )


def streaming_last_touch_attribution(
    events: DataFrame, window_seconds: float = 7 * 86400
) -> DataFrame:
    """Streaming last-touch conversion attribution: per-user state carries
    the latest touch (click/view/signup) across micro-batches; each
    purchase is credited to it when within the attribution window, else
    to the explicit '(none)' bucket.  Emits one attributed row per
    conversion (append mode) — roll up downstream for the channel report.

    Batch parity: on a non-streaming frame this degrades to the
    :func:`~aicoe_osc_demo_spark.operators.temporal.last_touch_attribution`
    as-of formulation re-keyed per conversion, bit-identical when events
    arrive in event-time order per user (the same caveat as streaming
    SCD2: state is append-only; out-of-order touches across batches are
    ignored rather than retroactively applied).  Ties replay the batch
    rule exactly: an equal-timestamp touch IS visible to the conversion
    (touches sort first within an instant), and among equal-timestamp
    touches the lexicographically largest channel wins.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        from ..operators.temporal import asof_join_tolerance

        conv = events.filter(F.col("event_type") == _ATTR_CONV_TYPE)
        touches = (
            events.filter(F.col("event_type").isin(*_ATTR_TOUCH_TYPES))
            .groupBy("user_id", F.col("ts").alias("touch_ts"))
            .agg(F.max("event_type").alias("_channel"))
        )
        out = asof_join_tolerance(
            conv,
            touches,
            on=["user_id"],
            left_ts="ts",
            right_ts="touch_ts",
            value_cols=["_channel"],
            tolerance_seconds=window_seconds,
        )
        return out.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.coalesce(F.col("_channel_asof"), F.lit("(none)")).alias("channel"),
        )
    from pyspark.sql import functions as F

    tagged = events.withColumn(
        "_window_ns", F.lit(int(round(window_seconds * 1e9)))
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _attr_update,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Streaming LINEAR multi-touch attribution ---------------------------------

LINEAR_ATTR_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double,"
    " channel string, credit double, rev double"
)
LINEAR_ATTR_STATE_SCHEMA = "touch_ns array<long>, channels array<string>"


def _linear_attr_update(key, pdfs, state):
    """Per-user state = EVERY touch row (ts, channel) still inside the
    trailing attribution window — linear credit counts duplicate and
    equal-timestamp touches individually (the batch join matches touch
    ROWS, not distinct channels), so nothing is deduped.  Each conversion
    emits one row per in-window touch with credit 1/k (rev value/k), or a
    single full-credit '(none)' row when k = 0; credits therefore sum
    EXACTLY to the conversion count across channels."""
    (user_id,) = key
    if state.exists:
        ns_list, ch_list = list(state.get[0]), list(state.get[1])
    else:
        ns_list, ch_list = [], []
    out: list[tuple] = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    # same tie order as last-touch: an equal-timestamp touch IS visible to
    # a same-instant conversion (batch rule tts <= ts), so touches sort
    # first within an instant
    batch = batch.assign(
        _kind=(batch["event_type"] == _ATTR_CONV_TYPE).astype(int)
    ).sort_values(["ts", "_kind", "event_id"], kind="mergesort")
    window_ns = int(batch["_window_ns"].iloc[0]) if len(batch) else 0
    max_ns = max(ns_list) if ns_list else None
    for row in batch.itertuples(index=False):
        ts_ns = int(pd.Timestamp(row.ts).value)
        max_ns = ts_ns if max_ns is None else max(max_ns, ts_ns)
        if row.event_type in _ATTR_TOUCH_TYPES:
            ns_list.append(ts_ns)
            ch_list.append(row.event_type)
        elif row.event_type == _ATTR_CONV_TYPE:
            hits = [
                ch
                for ns, ch in zip(ns_list, ch_list)
                if ns <= ts_ns and ts_ns - ns <= window_ns
            ]
            # the batch join emits NULL rev (value/_k) for a NULL conversion
            # value — normalize pandas NaN to None here so both paths agree
            # (``NaN or 0.0`` is NaN, not 0.0, for a pandas null)
            val = None if pd.isna(row.value) else float(row.value)
            if hits:
                k = len(hits)
                out.extend(
                    (user_id, row.event_id, row.ts, val, ch, 1.0 / k,
                     None if val is None else val / k)
                    for ch in hits
                )
            else:
                out.append(
                    (user_id, row.event_id, row.ts, val, "(none)", 1.0, val)
                )
    # prune touches that can never credit a future in-order conversion
    if max_ns is not None:
        kept = [(ns, ch) for ns, ch in zip(ns_list, ch_list)
                if max_ns - ns <= window_ns]
        ns_list = [ns for ns, _ in kept]
        ch_list = [ch for _, ch in kept]
    state.update((ns_list, ch_list))
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "ts", "value", "channel",
                     "credit", "rev"],
        )


def streaming_linear_attribution(
    events: DataFrame, window_seconds: float = 7 * 86400
) -> DataFrame:
    """Streaming linear multi-touch attribution — the streaming twin of the
    batch ``events_attribution_linear`` credit rule: every touch in the
    7-day window before a conversion shares the credit equally, and
    unattributed conversions keep full weight in '(none)', so per-channel
    credits conserve the conversion count exactly.

    Emits one credited row PER (conversion, touch) in append mode; roll up
    ``SUM(credit) / SUM(rev)`` by channel downstream.  Same in-order
    caveat as :func:`streaming_last_touch_attribution`: state is
    append-only across micro-batches; late cross-batch touches are not
    retroactively applied.

    Batch parity: on a non-streaming frame this runs the batch join
    formulation at per-credit granularity (bit-identical rollups when
    events arrive in event-time order per user).
    """
    from pyspark.sql import functions as F

    if not events.isStreaming:
        window_us = int(round(window_seconds * 1e6))
        conv = events.filter(F.col("event_type") == _ATTR_CONV_TYPE).select(
            "user_id", "event_id", "ts", "value"
        )
        touch = events.filter(F.col("event_type").isin(*_ATTR_TOUCH_TYPES)).select(
            "user_id", F.col("ts").alias("tts"), F.col("event_type").alias("channel")
        )
        age_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
            F.col("tts").cast("timestamp")
        )
        matched = (
            conv.join(touch, "user_id")
            .filter((F.col("tts") <= F.col("ts")) & (age_us <= window_us))
            .select("user_id", "event_id", "ts", "value", "channel")
        )
        k = matched.groupBy("event_id").agg(
            F.count(F.lit(1)).cast("long").alias("_k")
        )
        credited = matched.join(k, "event_id").select(
            "user_id",
            "event_id",
            "ts",
            "value",
            "channel",
            (F.lit(1.0) / F.col("_k")).alias("credit"),
            (F.col("value") / F.col("_k")).alias("rev"),
        )
        none_rows = conv.join(
            matched.select("event_id").distinct(), "event_id", "left_anti"
        ).select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.lit("(none)").alias("channel"),
            F.lit(1.0).alias("credit"),
            F.col("value").alias("rev"),
        )
        return credited.unionByName(none_rows)

    tagged = events.withColumn(
        "_window_ns", F.lit(int(round(window_seconds * 1e9)))
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _linear_attr_update,
        outputStructType=LINEAR_ATTR_OUTPUT_SCHEMA,
        stateStructType=LINEAR_ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Streaming heavy hitters (sharded Misra-Gries) ----------------------------

MG_OUTPUT_SCHEMA = "shard int, item string, mg_count long, n_seen long"
MG_STATE_SCHEMA = "items array<string>, counts array<long>, n_seen long"


def _mg_fold(counters: dict, items, capacity: int) -> None:
    """The Misra-Gries fold: increment known items, admit while below
    capacity, otherwise decrement-all (deleting zeros).  Mutates
    ``counters`` in place; deterministic given item order."""
    for item in items:
        if item in counters:
            counters[item] += 1
        elif len(counters) < capacity:
            counters[item] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]


def _mg_update(key, pdfs, state):
    """Per-shard Misra-Gries state across micro-batches.  Each batch is
    sorted (item order is part of MG's determinism contract — a replay
    folds identically), folded into the carried counters, and the CURRENT
    sketch snapshot is emitted (update-style: latest snapshot per shard
    wins downstream).  Capacity rides in on the `_capacity` column."""
    (shard,) = key
    if state.exists:
        items, counts, n_seen = state.get
        counters = dict(zip(list(items), [int(c) for c in counts]))
        n_seen = int(n_seen)
    else:
        counters, n_seen = {}, 0
    capacity = 64
    for pdf in pdfs:
        if len(pdf):
            capacity = int(pdf["_capacity"].iloc[0])
        vals = sorted(pdf["item"].astype(str))
        _mg_fold(counters, vals, capacity)
        n_seen += len(vals)
    state.update((list(counters.keys()), [int(v) for v in counters.values()], n_seen))
    yield pd.DataFrame(
        {
            "shard": [int(shard)] * len(counters),
            "item": list(counters.keys()),
            "mg_count": [int(v) for v in counters.values()],
            "n_seen": [n_seen] * len(counters),
        }
    )


def streaming_heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    capacity: int = 64,
    shards: int = 8,
) -> DataFrame:
    """Streaming frequent-items sketch: items hash-shard across ``shards``
    Misra-Gries states (each item lives in exactly ONE shard, so per-item
    error is bounded by that shard's stream length / capacity — the MG
    guarantee survives sharding), maintained across micro-batches with
    applyInPandasWithState.  Each trigger emits the current per-shard
    sketch snapshot; the global top-k is a tiny batch rollup over the
    latest snapshot (shards x capacity rows).

    State is BOUNDED by construction (shards x capacity counters) — the
    streaming-safe contrast to exact streaming counts, whose state grows
    with the item vocabulary.  The batch form of the same sketch is
    :func:`~aicoe_osc_demo_spark.operators.sketch.heavy_hitters` (which
    adds the exact re-count pass a bounded stream can't do).

    Non-streaming frames run the identical sharded fold via
    ``applyInPandas`` — the one-batch degradation of the same state
    function (MG output depends on fold order; both paths sort per batch,
    so a single-batch stream and the batch form fold identically).
    """
    from pyspark.sql import functions as F

    tagged = items.select(
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("_shard"),
        F.col(item_col).cast("string").alias("item"),
        F.lit(capacity).alias("_capacity"),
    )
    if not items.isStreaming:

        def one_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            class _Once:
                exists = False

                def update(self, v):
                    self._v = v

                @property
                def get(self):
                    return self._v

            shard = int(pdf["_shard"].iloc[0]) if len(pdf) else 0
            return pd.concat(list(_mg_update((shard,), iter([pdf]), _Once())))

        return tagged.groupBy("_shard").applyInPandas(one_batch, schema=MG_OUTPUT_SCHEMA)
    return tagged.groupBy("_shard").applyInPandasWithState(
        _mg_update,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
