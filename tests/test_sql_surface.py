"""The reference delegates its SQL to Trino (demo1-create-tables/join-tables
notebooks + Superset).  This engine serves the same surface from Spark SQL:
temp views over the tables, CTAS, and the dashboard aggregate shapes — all
through ``spark.sql`` strings, not the DataFrame API.
"""

from __future__ import annotations

from aicoe_osc_demo_spark.sources.tables import register_views

SF_DIR = "/root/testdata/sf0.001"


def test_sql_equals_dataframe_plan(spark):
    register_views(spark, SF_DIR)
    sql_rows = spark.sql(
        """
        SELECT n.n_name, ROUND(SUM(o.o_totalprice), 2) AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name
        """
    ).collect()
    from pyspark.sql import functions as F

    df_rows = (
        spark.table("orders")
        .join(spark.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(spark.table("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("n_name")
        .collect()
    )
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in df_rows]


def test_ctas_join_like_demo1(spark, tmp_path):
    # demo1-join-tables.ipynb cells 7-9: CREATE TABLE AS SELECT ... LEFT JOIN
    register_views(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS joined_ctas")
    spark.sql(
        f"""
        CREATE TABLE joined_ctas USING PARQUET LOCATION '{tmp_path}/joined' AS
        SELECT o.o_orderkey, o.o_totalprice, c.c_name
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        """
    )
    n = spark.sql("SELECT COUNT(*) AS n FROM joined_ctas").first().n
    assert n == spark.table("orders").count()
    # idempotent-DDL surface the reference relies on
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS joined_ctas USING PARQUET LOCATION '{tmp_path}/joined' AS
        SELECT 1 AS x
        """
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM joined_ctas").first().n == n
    spark.sql("DROP TABLE joined_ctas")


def test_superset_slice_shapes(spark):
    # data/superset/demo1.json slices: COUNT by dim (5,6), SUM by dim (7,8),
    # AVG by dim (9), row_limit (O1)
    register_views(spark, SF_DIR)
    out = spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS total,
               ROUND(AVG(c_acctbal), 2) AS avg_bal
        FROM customer GROUP BY c_mktsegment ORDER BY n DESC LIMIT 100
        """
    ).collect()
    assert len(out) == 5 and all(r.n > 0 for r in out)


def test_superset_demo2_slices(spark):
    # data/superset/demo2.json ("OS Climate NLP demo" over table infer_kpi,
    # datasource 49): slice 71 is the raw (pdf_name, kpi, answer) table with
    # row_limit 10000; slice 72 groups COUNT(answer) by answer, order_desc;
    # slices 69/70 are the kpi / pdf_name filter boxes (DISTINCT pulls).
    # The engine's QA pipeline output IS the infer_kpi surface: register it
    # and replay the dashboard SQL verbatim through spark.sql.
    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.inference import qa_pipeline
    from aicoe_osc_demo_spark.sources.tables import load_table

    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "text", F.concat(F.col("doc_id").cast("string"), F.lit(".pdf")).alias("pdf_name"))
    )
    qs = spark.createDataFrame(
        [("cash flow", "what is the cash flow"), ("revenue", "what is the revenue")],
        ["kpi", "question"],
    )
    pairs = docs.crossJoin(F.broadcast(qs))
    infer_kpi = qa_pipeline(
        pairs, group_cols=["kpi"], top_k=4, tiebreak=["doc_id"]
    ).select("pdf_name", "kpi", F.col("final_answer").alias("answer"))
    infer_kpi.createOrReplaceTempView("infer_kpi")

    # slice 71 "Kpi Answers" (all_columns + row_limit)
    rows = spark.sql(
        "SELECT pdf_name, kpi, answer FROM infer_kpi LIMIT 10000"
    ).collect()
    assert 0 < len(rows) <= 10000 and set(rows[0].asDict()) == {"pdf_name", "kpi", "answer"}

    # slices 69/70 filter boxes
    kpis = {r.kpi for r in spark.sql("SELECT kpi FROM infer_kpi GROUP BY kpi").collect()}
    assert kpis == {"cash flow", "revenue"}
    pdfs = spark.sql("SELECT pdf_name FROM infer_kpi GROUP BY pdf_name").count()
    assert 0 < pdfs <= 30

    # slice 72 "KPI Answers Distribution Across Companies":
    # SIMPLE metric COUNT(answer) grouped by answer, order_desc — the SQL
    # Superset generates, matched against the DataFrame aggregate
    sql_out = [
        tuple(r)
        for r in spark.sql(
            'SELECT answer AS answer, COUNT(answer) AS `COUNT(answer)` '
            "FROM infer_kpi GROUP BY answer "
            'ORDER BY `COUNT(answer)` DESC, answer'
        ).collect()
    ]
    df_out = [
        tuple(r)
        for r in infer_kpi.groupBy("answer")
        .agg(F.count("answer").alias("COUNT(answer)"))
        .orderBy(F.desc("COUNT(answer)"), "answer")
        .collect()
    ]
    assert sql_out == df_out and len(sql_out) >= 1
    assert sum(n for _, n in sql_out) == infer_kpi.count()
