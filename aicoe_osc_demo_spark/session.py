"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-reproducibility and for scale:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the static
  shuffle-partition guess is always wrong; AQE re-plans from runtime stats.
- ``spark.sql.shuffle.partitions`` sized from cores locally; on a real
  cluster AQE coalesces down from a high initial number.
- Arrow execution for every pandas UDF / mapInPandas stage (vectorized
  transfer instead of pickled rows).
- Session timezone pinned to UTC so timestamp semantics match the parquet
  test data and the DuckDB oracle bit-for-bit.
- Broadcast threshold left at default (10 MB) — dimension tables (nation,
  region, kpi-mapping-sized) broadcast automatically; code additionally uses
  explicit ``F.broadcast`` where the dimension side is known small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "aicoe-osc-demo-spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # NOTE: the local test parquet files are single-row-group, so scans
        # cannot parallelize below one task regardless of
        # spark.sql.files.maxPartitionBytes (measured: lowering it only adds
        # empty tasks).  On a real cluster the default 128 MB split applies
        # across many files/row-groups.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    return builder.getOrCreate()
