"""KPI-dictionary source (SURVEY.md §1.1 "KPI dictionary").

The reference loads ``kpi_mapping.csv`` into three python dicts + an
add-year list (ref: /root/reference/src/components/utils/kpi_mapping.py:4-31,
data/kpi_mapping/kpi_mapping.csv).  In Spark the dictionary IS a broadcast
dimension DataFrame — every lookup (J2), category check (P9), sector
intersection (U3), and year rewrite (F17) joins against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KPI_MAPPING_SCHEMA = (
    "kpi_id double, question string, sectors string, add_year boolean, kpi_category string"
)


def load_kpi_mapping(spark: SparkSession, path: str) -> DataFrame:
    """Read the KPI-mapping workbook into the broadcast dimension:
    (kpi_id, question, sectors array, add_year, kpi_category array).

    The comma-separated multi-value cells become real arrays (the reference
    split+stripped them into dict values)."""
    raw = spark.read.option("header", "true").schema(KPI_MAPPING_SCHEMA).csv(path)
    split_trim = lambda c: F.transform(F.split(F.col(c), ","), lambda x: F.trim(x))  # noqa: E731
    return raw.select(
        "kpi_id",
        "question",
        split_trim("sectors").alias("sectors"),
        F.coalesce(F.col("add_year"), F.lit(False)).alias("add_year"),
        split_trim("kpi_category").alias("kpi_category"),
    )


def questions_for_sector(kpi: DataFrame, sectors: list[str], data_type: str) -> DataFrame:
    """The relevance-inference question list: KPIs whose sector list
    intersects the configured sectors and whose category allows the data
    type (ref: relevance_infer.py:36-46)."""
    wanted = F.array(*[F.lit(s) for s in sectors])
    return kpi.filter(
        (F.size(F.array_intersect(F.col("sectors"), wanted)) > 0)
        & F.array_contains(F.col("kpi_category"), data_type)
    ).select("kpi_id", "question", "add_year")
