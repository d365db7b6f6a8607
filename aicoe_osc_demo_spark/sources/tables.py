"""Test-table loading for the driver's synthetic star schema (TESTDATA.md)."""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst prunes columns / pushes filters into it.

    The ``events`` table is written with TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; read it as long nanos and truncate to
    microseconds (exactly what DuckDB/Arrow do when downcasting ns → µs).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros produces a session-TZ timestamp; pin UTC and cast
        # to NTZ so the wall-clock value equals the stored (naive) value on
        # any driver session — the other tables are already timestamp_ntz.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count from the parquet FOOTER (a metadata read, not a Spark
    job).  Plan builders that size a parameter from the corpus cardinality
    (LSH plane count, k-means k) use this so constructing the plan stays
    lazy — no eager full-table count() scan per entry, and explain/audit
    paths never launch a job.  Keyed on the max over the CONTAINED parquet
    files' mtimes (plus the path's own mtime, which catches part-file
    deletion): overwriting a part file in place keeps the directory mtime
    unchanged, so a directory-mtime key could serve a stale count for a
    regenerated same-layout dataset (r12 advice)."""
    p = table_path(sf_dir, name)
    return _footer_rows(p, max(tables_mtime(sf_dir, (name,)), os.path.getmtime(p)))


@lru_cache(maxsize=256)
def _footer_rows(path: str, _mtime: float) -> int:
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def tables_mtime(sf_dir: str, names: tuple[str, ...]) -> float:
    """Latest parquet mtime across ``names`` — cache-key component for
    process-scoped derived artifacts (bucketed tables, persisted indexes) so
    a regenerated dataset under the same sf_dir invalidates instead of
    silently serving stale data."""
    latest = -1.0
    for name in names:
        p = table_path(sf_dir, name)
        try:
            if os.path.isdir(p):
                # default guards the empty-directory case (the r12 advice:
                # a bare max() over an empty listing raises ValueError,
                # which the OSError handler below would not catch)
                latest = max(
                    latest,
                    max(
                        (os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)),
                        default=-1.0,
                    ),
                )
            else:
                latest = max(latest, os.path.getmtime(p))
        except OSError:
            pass
    return latest


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for the SQL surface."""
    for name in TPCH_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
