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


def session_confs(
    cpus: str | None = None,
    gpus_per_task: float | None = None,
    gpus_per_executor: int | None = None,
) -> dict[str, str]:
    """The full config map ``get_spark`` applies — exposed as a pure
    function so tests can assert the exact confs (``getOrCreate`` against a
    live session silently drops non-SQL confs, making post-hoc assertion
    unreliable)."""
    cpus = cpus or DEFAULT_CPUS
    confs = {
        "spark.sql.shuffle.partitions": str(max(int(cpus), 8)),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # NOTE: the local test parquet files are single-row-group, so scans
        # cannot parallelize below one task regardless of
        # spark.sql.files.maxPartitionBytes (measured: lowering it only adds
        # empty tasks).  On a real cluster the default 128 MB split applies
        # across many files/row-groups.
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "spark.ui.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    }
    if gpus_per_task is not None:
        confs["spark.task.resource.gpu.amount"] = str(gpus_per_task)
    if gpus_per_executor is not None:
        confs["spark.executor.resource.gpu.amount"] = str(gpus_per_executor)
    return confs


def get_spark(
    app_name: str = "aicoe-osc-demo-spark",
    cpus: str | None = None,
    gpus_per_task: float | None = None,
    gpus_per_executor: int | None = None,
) -> SparkSession:
    """Build the engine's SparkSession.

    ``gpus_per_task`` / ``gpus_per_executor`` wire Spark's standard GPU
    resource scheduling (``spark.task.resource.gpu.amount`` /
    ``spark.executor.resource.gpu.amount``) for the ML inference stages:
    with ``gpus_per_task=1`` Spark schedules one mapInPandas task per GPU
    and the executor-singleton model loader (operators/inference.py) picks
    up the assigned device via ``TaskContext.get().resources()["gpu"]``.
    On local mode the configs are accepted but only enforced when a
    resource-discovery script is configured, matching stock Spark behavior.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for key, value in session_confs(cpus, gpus_per_task, gpus_per_executor).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
