"""aicoe_osc_demo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of os-climate/aicoe-osc-demo.

The reference (read-only at /root/reference) is a pandas + Trino ESG/NLP
pipeline; this package re-expresses its entire operator surface (SURVEY.md §2)
as idiomatic Spark DataFrame / SQL plans so that Catalyst + Tungsten pick the
physical strategy, plus the LLM-scale data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) a 100 TB training-data
pipeline needs.

Layout:
  session    — tuned SparkSession factory (AQE, arrow, shuffle partitions)
  sources    — readers/writers for the supported formats (S1-S12)
  functions  — scalar Column-expression library (F1-F20) + text analysis
  operators  — composite operators: dedup, similarity, fuzzy join, reshape,
               sampling, inference stages (P/J/A/W/O/U/M families)
  plans      — the registered query catalog driving __spark_entry__.py
  streaming  — incremental / Structured Streaming surface (§2.10)
"""

__version__ = "0.2.0"
