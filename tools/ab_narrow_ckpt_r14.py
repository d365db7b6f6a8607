"""Same-session interleaved A/B (r14 scan-audit batch 2): four entries
re-expand a narrow reduced table per reference —

- events_stickiness_dau_mau: the deduped (user, day) table feeds days /
  fan / dau (3 events scans);
- events_pareto_deciles: the per-user count table feeds cuts / binned /
  totals (3 events scans);
- events_survival_km: the per-user (t_view, t_last) table feeds the
  conversion join and the observation join (3 events scans);
- privacy_t_closeness: cv feeds class_val / glob / n_total — glob and
  n_total are derivable from class_val by two-level aggregation
  (3 customer scans -> 1).

NEW forms lazily checkpoint the narrow reduced table (and for
t-closeness roll the global tables off class_val).

Usage: python tools/ab_narrow_ckpt_r14.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _stickiness(spark, sf_dir, ckpt):
    from aicoe_osc_demo_spark.plans import load

    e = load(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))), F.lit("1990-01-01").cast("date")
        ).alias("dn"),
    ).distinct()
    if ckpt:
        ud = ud.localCheckpoint(eager=False)
    days = ud.select("dn").distinct()
    fan = ud.select(
        "user_id", F.explode(F.sequence(F.col("dn"), F.col("dn") + 29)).alias("target")
    )
    mau = (
        fan.join(days.select(F.col("dn").alias("target")), "target", "left_semi")
        .groupBy("target")
        .agg(F.countDistinct("user_id").cast("long").alias("mau"))
        .withColumnRenamed("target", "dn")
    )
    dau = ud.groupBy("dn").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    return dau.join(mau, "dn").select(
        F.to_timestamp(
            F.date_add(F.lit("1990-01-01").cast("date"), F.col("dn"))
        ).alias("day"),
        "dau",
        "mau",
        F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias("stickiness"),
    )


def _pareto(spark, sf_dir, ckpt):
    from aicoe_osc_demo_spark.plans import load

    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    if ckpt:
        u = u.localCheckpoint(eager=False)
    ps = ", ".join(f"{i / 10!r}D" for i in range(1, 10))
    cuts = u.agg(F.expr(f"percentile(n_events, array({ps}))").alias("_qs"))
    binned = u.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "n_events",
        F.aggregate(
            "_qs",
            F.lit(0),
            lambda acc, q: acc + F.when(F.col("n_events") >= q, 1).otherwise(0),
        ).cast("int").alias("decile"),
    )
    tot = u.agg(
        F.sum("n_events").cast("long").alias("_t"),
        F.count(F.lit(1)).cast("long").alias("_nu"),
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            "n_events",
            F.round(F.col("n_events").cast("double") / F.col("_t"), 6).alias("volume_share"),
            F.round(F.col("n_users").cast("double") / F.col("_nu"), 6).alias("user_share"),
        )
    )


def _survival(spark, sf_dir, ckpt):
    from aicoe_osc_demo_spark.plans import load

    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.max("ts").alias("t_last"),
    )
    if ckpt:
        u = u.localCheckpoint(eager=False)
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(u.select("user_id", "t_view"), on="user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_conv"))
    )
    obs = (
        u.filter(F.col("t_view").isNotNull())
        .join(conv, on="user_id", how="left")
        .select(
            F.when(
                F.col("t_conv").isNotNull(),
                F.datediff(F.col("t_conv").cast("date"), F.col("t_view").cast("date")),
            )
            .otherwise(
                F.datediff(F.col("t_last").cast("date"), F.col("t_view").cast("date"))
            )
            .alias("dur"),
            F.when(F.col("t_conv").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    g = obs.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("long").alias("censored"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    w_desc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.select("dur", "d", "censored", F.sum("m").over(w_desc).alias("n_risk"))
    w_asc = Window.orderBy(F.col("dur").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ln_term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.floor(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")) * 1e9
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    zero_flag = F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    k = r.select(
        "dur",
        "d",
        "censored",
        "n_risk",
        F.sum(zero_flag).over(w_asc).alias("hit_zero"),
        F.sum(ln_term).over(w_asc).alias("ln_nano"),
    )
    return k.select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("d").alias("n_events"),
        "censored",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.when(F.col("hit_zero") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("ln_nano").cast("double") / 1e9), 6))
        .alias("survival"),
    )


def _tclose(spark, sf_dir, ckpt):
    from aicoe_osc_demo_spark.plans import load

    df = load(spark, sf_dir, "customer")
    qi_cols = ["c_mktsegment", "c_nationkey"]
    sensitive = F.floor(F.col("c_acctbal") / F.lit(1000.0))
    t_threshold = 0.35
    cv = df.select(*qi_cols, sensitive.alias("_v")).where(sensitive.isNotNull())
    class_val = cv.groupBy(*qi_cols, "_v").agg(
        F.count(F.lit(1)).cast("long").alias("_ncv")
    )
    if ckpt:
        class_val = class_val.localCheckpoint(eager=False)
        glob = class_val.groupBy("_v").agg(F.sum("_ncv").cast("long").alias("_ngv"))
        n_total = class_val.agg(F.sum("_ncv").cast("long").alias("_n"))
    else:
        glob = cv.groupBy("_v").agg(F.count(F.lit(1)).cast("long").alias("_ngv"))
        n_total = cv.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    w_class = Window.partitionBy(*qi_cols)
    joined = (
        class_val.join(F.broadcast(glob), "_v")
        .crossJoin(F.broadcast(n_total))
        .select(
            *qi_cols,
            F.sum("_ncv").over(w_class).alias("_nclass"),
            F.col("_ncv"),
            (F.col("_ngv").cast("double") / F.col("_n")).alias("_pg"),
        )
    )
    terms = joined.select(
        *qi_cols,
        "_nclass",
        (
            F.abs(F.col("_ncv").cast("double") / F.col("_nclass") - F.col("_pg"))
            - F.col("_pg")
        ).alias("_term"),
    )
    return terms.groupBy(*qi_cols).agg(
        F.max("_nclass").cast("long").alias("n"),
        F.round(
            F.lit(0.5)
            * (
                F.sum(
                    F.floor(F.col("_term") * 1e12 + F.lit(0.5)).cast("long")
                ).cast("double")
                / 1e12
                + F.lit(1.0)
            ),
            6,
        ).alias("t"),
    ).withColumn("at_risk", F.col("t") > F.lit(t_threshold))


BUILDERS = {
    "events_stickiness_dau_mau": _stickiness,
    "events_pareto_deciles": _pareto,
    "events_survival_km": _survival,
    "privacy_t_closeness": _tclose,
}


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import checksum_materialize
    from aicoe_osc_demo_spark.plans import QUERIES
    from aicoe_osc_demo_spark.session import get_spark

    spark = get_spark("ab-narrow-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["proj_select_columns"](spark, sf_dir).count()

    for name, builder in BUILDERS.items():
        entry_rows = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        old_rows = sorted(map(tuple, builder(spark, sf_dir, False).collect()))
        new_rows = sorted(map(tuple, builder(spark, sf_dir, True).collect()))
        assert old_rows == entry_rows, f"{name}: inline OLD != registry entry"
        assert old_rows == new_rows, f"{name}: VALUE MISMATCH"
        print(f"# {name} value-identity OK: {len(old_rows)} rows", flush=True)
        spark.catalog.clearCache()
        olds, news = [], []
        for i in range(n_pairs):
            for flag, acc in ((False, olds), (True, news)):
                t0 = time.time()
                checksum_materialize(builder(spark, sf_dir, flag))
                acc.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        print(f"{name} old: best {min(olds):.3f} all {olds}")
        print(f"{name} new: best {min(news):.3f} all {news}")


if __name__ == "__main__":
    main()
