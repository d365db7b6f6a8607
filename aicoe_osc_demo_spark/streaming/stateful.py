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
