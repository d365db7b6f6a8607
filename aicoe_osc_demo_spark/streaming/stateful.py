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
