"""Round-8 batch B: interval coverage, last-touch attribution, Wilson CI,
PSI drift, t-closeness, and the TPC-H Q4/Q11/Q21 join shapes."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


class TestIntervalCoverage:
    def test_union_length_hand_case(self, spark):
        from aicoe_osc_demo_spark.operators.temporal import interval_coverage

        # key a: [0,10], [5,12] overlap -> 12; [20,25] island -> +5 = 17
        # key a: [6,8] fully swallowed -> +0
        # key b: touching [0,5], [5,9] -> one merged run of 9 (touching
        #   intervals merge: start == prior end is NOT a new island)
        rows = [
            ("a", _ts(0), _ts(10)),
            ("a", _ts(5), _ts(12)),
            ("a", _ts(6), _ts(8)),
            ("a", _ts(20), _ts(25)),
            ("b", _ts(0), _ts(5)),
            ("b", _ts(5), _ts(9)),
        ]
        df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
        out = {
            r["k"]: r
            for r in interval_coverage(df, ["k"], "s", "e").collect()
        }
        assert out["a"]["covered_s"] == pytest.approx(17.0)
        assert out["a"]["n_islands"] == 2
        assert out["a"]["n_intervals"] == 4
        assert out["b"]["covered_s"] == pytest.approx(9.0)
        assert out["b"]["n_islands"] == 1

    def test_disjoint_sums_exactly(self, spark):
        from aicoe_osc_demo_spark.operators.temporal import interval_coverage

        rows = [("k", _ts(i * 100), _ts(i * 100 + 3)) for i in range(50)]
        df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
        r = interval_coverage(df, ["k"], "s", "e").collect()[0]
        assert r["covered_s"] == pytest.approx(150.0)
        assert r["n_islands"] == 50


class TestLastTouchAttribution:
    def test_window_cutoff_and_none_bucket(self, spark):
        from aicoe_osc_demo_spark.operators.temporal import (
            last_touch_attribution,
        )

        conv = spark.createDataFrame(
            [
                (1, _ts(100.0), 10.0),  # touch at 90 (ads) within window
                (1, _ts(500.0), 20.0),  # latest touch at 480 (email)
                (2, _ts(100.0), 30.0),  # only touch is 95s stale > 50s window
                (3, _ts(100.0), 40.0),  # no touch at all
            ],
            "user_id long, ts timestamp, value double",
        )
        touch = spark.createDataFrame(
            [
                (1, _ts(90.0), "ads"),
                (1, _ts(480.0), "email"),
                (1, _ts(470.0), "ads"),  # older than email -> not credited
                (2, _ts(5.0), "ads"),
            ],
            "user_id long, tts timestamp, channel string",
        )
        out = {
            r["channel"]: r
            for r in last_touch_attribution(
                conv,
                touch,
                on=["user_id"],
                conv_ts="ts",
                touch_ts="tts",
                channel_col="channel",
                value_col="value",
                window_seconds=50.0,
            ).collect()
        }
        assert out["ads"]["n_conversions"] == 1
        assert out["ads"]["revenue"] == pytest.approx(10.0)
        assert out["email"]["n_conversions"] == 1
        assert out["email"]["revenue"] == pytest.approx(20.0)
        assert out["(none)"]["n_conversions"] == 2
        assert out["(none)"]["revenue"] == pytest.approx(70.0)


class TestWilsonCI:
    def test_matches_closed_form(self, spark):
        from aicoe_osc_demo_spark.operators.quality import proportion_wilson_ci

        df = spark.createDataFrame(
            [("g", i < 30) for i in range(100)], "g string, ok boolean"
        )
        r = proportion_wilson_ci(df, ["g"], F.col("ok"), z=1.96).collect()[0]
        n, k, z = 100, 30, 1.96
        p = k / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        assert r["p"] == pytest.approx(0.3)
        assert r["ci_lo"] == pytest.approx(round(center - half, 6), abs=1e-9)
        assert r["ci_hi"] == pytest.approx(round(center + half, 6), abs=1e-9)
        # Wilson interval always contains p and stays inside [0, 1]
        assert 0 <= r["ci_lo"] < p < r["ci_hi"] <= 1

    def test_extreme_p_nonzero_width(self, spark):
        from aicoe_osc_demo_spark.operators.quality import proportion_wilson_ci

        df = spark.createDataFrame(
            [("g", True) for _ in range(20)], "g string, ok boolean"
        )
        r = proportion_wilson_ci(df, ["g"], F.col("ok")).collect()[0]
        # Wald would give a zero-width interval at p=1; Wilson must not.
        assert r["ci_lo"] < 1.0 and r["ci_hi"] == pytest.approx(1.0)


class TestPSIDrift:
    def test_identical_slices_zero(self, spark):
        from aicoe_osc_demo_spark.operators.quality import psi_drift

        # identical value multisets in baseline and current -> counts
        # equal in every bin -> psi exactly 0
        rows = [("g", float(v), b) for v in range(50) for b in (True, False)]
        df = spark.createDataFrame(rows, "g string, v double, isb boolean")
        r = psi_drift(df, ["g"], F.col("v"), F.col("isb"), n_bins=10).collect()[0]
        assert r["psi"] == pytest.approx(0.0)
        assert r["n_baseline"] == r["n_current"] == 50
        assert r["n_bins_used"] == 10

    def test_shifted_distribution_flags(self, spark):
        from aicoe_osc_demo_spark.operators.quality import psi_drift

        rows = [("g", float(v % 20), True) for v in range(200)] + [
            ("g", 80.0 + float(v % 20), False) for v in range(200)
        ]
        df = spark.createDataFrame(rows, "g string, v double, isb boolean")
        r = psi_drift(df, ["g"], F.col("v"), F.col("isb"), n_bins=10).collect()[0]
        assert r["psi"] > 0.25  # fully disjoint supports -> drifted


class TestTCloseness:
    def test_hand_distribution(self, spark):
        from aicoe_osc_demo_spark.operators.quality import t_closeness_report

        # global: v=0 x6, v=1 x2, v=2 x2  (p = .6/.2/.2)
        # class A: 0,0,0,1,2 (p=.6/.2/.2) -> t = 0
        # class B: 0,0,0,1,2 same -> 0; class C: 1,1,1,1,1 -> t = TVD
        rows = (
            [("A", 0)] * 3 + [("A", 1), ("A", 2)]
            + [("B", 0)] * 3 + [("B", 1), ("B", 2)]
        )
        df = spark.createDataFrame(rows, "qi string, v int")
        out = {
            r["qi"]: r
            for r in t_closeness_report(
                df, ["qi"], F.col("v"), t_threshold=0.2
            ).collect()
        }
        assert out["A"]["t"] == pytest.approx(0.0)
        assert not out["A"]["at_risk"]

    def test_single_value_class(self, spark):
        from aicoe_osc_demo_spark.operators.quality import t_closeness_report

        # class B holds only v=9, which is 5/15 of the corpus:
        # TVD = 0.5*(|1 - 1/3| + 2/3) = 2/3
        rows = [("A", v) for v in (0, 1, 2, 3, 4) * 2] + [("B", 9)] * 5
        df = spark.createDataFrame(rows, "qi string, v int")
        out = {
            r["qi"]: r
            for r in t_closeness_report(
                df, ["qi"], F.col("v"), t_threshold=0.5
            ).collect()
        }
        assert out["B"]["t"] == pytest.approx(2 / 3, abs=1e-6)
        assert out["B"]["at_risk"]
        assert out["B"]["n"] == 5


class TestTPCHShapes:
    def test_exists_semi_no_duplicate_inflation(self, spark, tmp_path):
        # an order with MANY slow lines counts once
        o = spark.createDataFrame(
            [(1, "1-URGENT", _ts(0.0)), (2, "1-URGENT", _ts(0.0))],
            "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
        )
        li = spark.createDataFrame(
            [(1, _ts(86400.0 * 90)), (1, _ts(86400.0 * 91)), (2, _ts(0.0))],
            "l_orderkey long, l_shipdate timestamp",
        )
        slow = o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (
                li["l_shipdate"]
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ),
            "left_semi",
        )
        out = slow.groupBy("o_orderpriority").count().collect()
        assert out[0]["count"] == 1

    def test_single_late_supplier_logic(self, spark):
        # order 1: suppliers 10 (late), 11 (on time) -> supplier 10 waits
        # order 2: suppliers 10, 11 both late -> nobody counted
        # order 3: single-supplier order, late -> excluded (n_supp < 2)
        import __spark_entry__  # noqa: F401  (registry import side effects)

        lo = spark.createDataFrame(
            [
                (1, 10, 1),
                (1, 11, 0),
                (2, 10, 1),
                (2, 11, 1),
                (3, 10, 1),
            ],
            "l_orderkey long, l_suppkey long, late int",
        )
        byorder = lo.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
        )
        out = (
            lo.join(byorder, "l_orderkey")
            .filter(
                (F.col("n_supp") >= 2)
                & (F.col("n_late") == 1)
                & (F.col("late") == 1)
            )
            .groupBy("l_suppkey")
            .count()
            .collect()
        )
        assert len(out) == 1
        assert out[0]["l_suppkey"] == 10 and out[0]["count"] == 1


class TestKCore:
    def test_clique_plus_tail(self, spark):
        from aicoe_osc_demo_spark.operators.graph import k_core

        # 4-clique (3-core) with a path tail 4-5-6 hanging off node 4
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
            "src long, dst long",
        )
        out = {r["node"]: r["deg"] for r in k_core(edges, 3).collect()}
        assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_peel_cascade(self, spark):
        from aicoe_osc_demo_spark.operators.graph import k_core

        # a path graph: every node degree <= 2; 2-core requires a cycle
        # and peeling must CASCADE from the endpoints inward to empty
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "src long, dst long"
        )
        assert k_core(edges, 2).count() == 0

    def test_cycle_survives_two_core(self, spark):
        from aicoe_osc_demo_spark.operators.graph import k_core

        # a 5-cycle with a pendant: the cycle is the exact 2-core
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (3, 99)],
            "src long, dst long",
        )
        out = {r["node"]: r["deg"] for r in k_core(edges, 2).collect()}
        assert out == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}

    def test_self_loops_ignored(self, spark):
        from aicoe_osc_demo_spark.operators.graph import k_core

        # node 6 has only a self-loop plus one edge to the 5-cycle: the
        # loop must NOT count toward degree, so 6 peels out of the 2-core
        # (a self-loop used to survive as one undirected row = degree 1)
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (6, 6), (6, 1)],
            "src long, dst long",
        )
        out = {r["node"]: r["deg"] for r in k_core(edges, 2).collect()}
        assert out == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}


class TestWeightedLogodds:
    def test_overrepresented_token_signs(self, spark):
        from aicoe_osc_demo_spark.operators.corpus import weighted_logodds

        docs = [
            (True, "alpha alpha alpha beta common common"),
            (True, "alpha alpha common common common"),
            (False, "beta beta beta common common"),
            (False, "beta beta common common common"),
        ]
        df = spark.createDataFrame(docs, "f boolean, text string")
        out = {
            r["token"]: r
            for r in weighted_logodds(
                df, F.col("text"), F.col("f"), alpha0=10.0, min_count=1
            ).collect()
        }
        # focal-heavy token scores positive, rest-heavy negative, the
        # evenly-split token sits near zero and between them
        assert out["alpha"]["z"] > 0 > out["beta"]["z"]
        assert abs(out["common"]["z"]) < min(
            out["alpha"]["z"], -out["beta"]["z"]
        )
        assert out["alpha"]["y_focal"] == 5 and out["alpha"]["y_rest"] == 0

    def test_matches_closed_form(self, spark):
        import math

        from aicoe_osc_demo_spark.operators.corpus import weighted_logodds

        df = spark.createDataFrame(
            [(True, "x x y"), (False, "x y y y")], "f boolean, text string"
        )
        r = {
            row["token"]: row
            for row in weighted_logodds(
                df, F.col("text"), F.col("f"), alpha0=4.0, min_count=1
            ).collect()
        }
        yf, yr, nf, nr, a0 = 2.0, 1.0, 3.0, 4.0, 4.0
        aw = a0 * (yf + yr) / (nf + nr)
        d = math.log((yf + aw) / (nf + a0 - yf - aw)) - math.log(
            (yr + aw) / (nr + a0 - yr - aw)
        )
        z = d / math.sqrt(1 / (yf + aw) + 1 / (yr + aw))
        assert r["x"]["delta"] == pytest.approx(round(d, 6), abs=1e-9)
        assert r["x"]["z"] == pytest.approx(round(z, 6), abs=1e-9)


class TestEntryExitMatrix:
    def test_hand_sessions(self, spark):
        from aicoe_osc_demo_spark.plans.events import sessionize

        # user 1: two sessions (gap > 30 min): [view, click], [purchase]
        rows = [
            (1, 1, _ts(0.0), "view"),
            (2, 1, _ts(60.0), "click"),
            (3, 1, _ts(60.0 + 3600 * 2), "purchase"),
        ]
        e = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        s = sessionize(e, gap_minutes=30)
        key = F.struct(F.col("ts").cast("timestamp"), F.col("event_id"))
        per = s.groupBy("user_id", "session_id").agg(
            F.min_by("event_type", key).alias("entry"),
            F.max_by("event_type", key).alias("exit"),
        )
        out = {(r["entry"], r["exit"]) for r in per.collect()}
        assert out == {("view", "click"), ("purchase", "purchase")}


class TestStickinessAndSTL:
    def test_dau_mau_bounds(self, spark):
        # stickiness is DAU/MAU with MAU >= DAU always; single-day data
        # means MAU == DAU == stickiness 1.0
        import __spark_entry__ as em

        df = em.queries()["events_stickiness_dau_mau"](
            spark, "/root/testdata/sf0.001"
        )
        rows = df.collect()
        assert rows
        for r in rows:
            assert r["mau"] >= r["dau"] > 0
            assert 0 < r["stickiness"] <= 1.0

    def test_stl_identity(self, spark):
        # decomposition must satisfy n = trend + seasonal + resid
        import __spark_entry__ as em

        df = em.queries()["events_stl_decompose"](spark, "/root/testdata/sf0.001")
        for r in df.collect():
            assert r["n"] == pytest.approx(
                r["trend"] + r["seasonal"] + r["resid"], abs=2e-6
            )

    def test_calibration_ece_weighted_gap(self, spark):
        import __spark_entry__ as em

        rows = em.queries()["ml_calibration_bins"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        n_tot = sum(r["n"] for r in rows)
        ece = sum(r["n"] * abs(r["acc"] - r["conf"]) for r in rows) / n_tot
        assert rows[0]["ece"] == pytest.approx(ece, abs=2e-6)
        assert all(r["ece"] == rows[0]["ece"] for r in rows)


class TestRake:
    def test_hand_scores(self, spark):
        from aicoe_osc_demo_spark.operators.corpus import rake_phrases

        df = spark.createDataFrame(
            [(1, "The quick brown fox and the lazy dog!")],
            "doc_id long, text string",
        )
        out = {
            r["phrase"]: r
            for r in rake_phrases(df, "doc_id", F.col("text")).collect()
        }
        # each word appears once, degree = its phrase length, so
        # wscore = len and phrase score = len^2
        assert out["quick brown fox"]["score"] == pytest.approx(9.0)
        assert out["lazy dog"]["score"] == pytest.approx(4.0)
        assert out["quick brown fox"]["n_occurrences"] == 1

    def test_cooccurrence_pull(self, spark):
        from aicoe_osc_demo_spark.operators.corpus import rake_phrases

        # "carbon" appears in a 3-word phrase and a 2-word phrase:
        # freq=2, deg=5, wscore=2.5; "tax": freq=1 deg=2 wscore=2;
        # "carbon tax" scores 4.5 — higher than an isolated pair of
        # once-seen words (4.0), because carbon travels in longer company
        df = spark.createDataFrame(
            [
                (1, "carbon capture systems of carbon tax"),
                (2, "lazy dog"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["phrase"]: r["score"]
            for r in rake_phrases(df, "doc_id", F.col("text")).collect()
        }
        assert out["carbon tax"] == pytest.approx(4.5)
        assert out["lazy dog"] == pytest.approx(4.0)
        assert out["carbon capture systems"] == pytest.approx(2.5 + 3 + 3)


class TestNewOperatorProperties:
    def test_interval_coverage_matches_bruteforce(self, spark):
        # deterministic pseudo-random intervals; brute-force union via a
        # second-granularity set is the reference
        import hashlib

        from aicoe_osc_demo_spark.operators.temporal import interval_coverage

        rows = []
        ref: dict[str, set] = {}
        for i in range(120):
            h = int(hashlib.md5(f"iv{i}".encode()).hexdigest(), 16)
            k = f"k{h % 4}"
            s = h // 7 % 500
            ln = 1 + (h // 11 % 40)
            rows.append((k, _ts(float(s)), _ts(float(s + ln))))
            ref.setdefault(k, set()).update(range(s, s + ln))
        df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
        out = {
            r["k"]: r["covered_s"]
            for r in interval_coverage(df, ["k"], "s", "e").collect()
        }
        for k, secs in ref.items():
            assert out[k] == pytest.approx(float(len(secs))), k

    def test_k_core_matches_python_peel(self, spark):
        import hashlib

        from aicoe_osc_demo_spark.operators.graph import k_core

        edges = set()
        for i in range(150):
            h = int(hashlib.md5(f"e{i}".encode()).hexdigest(), 16)
            a, b = h % 30, (h // 31) % 30
            if a != b:
                edges.add((min(a, b), max(a, b)))
        # python reference peel
        adj: dict[int, set] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        k = 4
        changed = True
        while changed:
            changed = False
            for n in [n for n, ns in adj.items() if len(ns) < k]:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
        df = spark.createDataFrame(
            [(a, b) for a, b in sorted(edges)], "src long, dst long"
        )
        got = {r["node"]: r["deg"] for r in k_core(df, k).collect()}
        assert got == {n: len(ns) for n, ns in adj.items()}


class TestBM25Index:
    def test_index_serving_matches_inmemory(self, spark, tmp_path):
        from aicoe_osc_demo_spark.operators.corpus import (
            bm25_topk,
            bm25_topk_from_index,
            write_bm25_index,
        )
        from aicoe_osc_demo_spark.sources.tables import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        queries = d.filter(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("q_id"),
            F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ").alias(
                "q_text"
            ),
        )
        mem = {
            (r.q_id, r.doc_id): (r.score, r.rank)
            for r in bm25_topk(d, queries, k=10, k1=1.5, b=0.75).collect()
        }
        path = str(tmp_path / "bm25")
        write_bm25_index(d, path)
        served = {
            (r.q_id, r.doc_id): (r.score, r.rank)
            for r in bm25_topk_from_index(
                spark, path, queries, k=10, k1=1.5, b=0.75
            ).collect()
        }
        assert served == mem and len(mem) > 10

    def test_partition_pruning_reaches_scan(self, spark, tmp_path):
        from aicoe_osc_demo_spark.operators.corpus import (
            bm25_topk_from_index,
            write_bm25_index,
        )

        d = spark.createDataFrame(
            [(i, f"alpha{i % 3} beta{i % 5} gamma") for i in range(50)],
            "doc_id long, text string",
        )
        path = str(tmp_path / "ix")
        write_bm25_index(d, path)
        q = spark.createDataFrame([(1, "gamma")], "q_id long, q_text string")
        plan = bm25_topk_from_index(spark, path, q)._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # the pruning disjunction pins pfx to the query terms' first chars
        assert "pfx" in plan


class TestGrowthAccounting:
    def test_lifecycle_states(self, spark):
        import __spark_entry__ as em
        import datetime as dt

        # hand-built weekly activity: user 1 weeks 0,1,3 (new, retained,
        # resurrected); user 2 week 0 only (new, then churned in week 1)
        def d(week):
            return dt.datetime(1990, 1, 1) + dt.timedelta(days=7 * week)

        rows = [
            (1, 1, d(0)), (2, 1, d(1)), (3, 1, d(3)), (4, 2, d(0)),
        ]
        e = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
        # replicate the plan body on an in-memory frame
        um = e.select(
            "user_id",
            F.floor(
                F.datediff(
                    F.to_date(F.date_trunc("day", F.col("ts"))),
                    F.lit("1990-01-01").cast("date"),
                ) / 7
            ).cast("long").alias("m"),
        ).distinct()
        from pyspark.sql import Window as W

        lagged = um.select(
            "m",
            F.lag("m").over(W.partitionBy("user_id").orderBy("m")).alias("prev_m"),
            F.min("m").over(W.partitionBy("user_id")).alias("first_m"),
        )
        cls = lagged.select(
            "m",
            F.when(F.col("m") == F.col("first_m"), "new")
            .when(F.col("prev_m") == F.col("m") - 1, "retained")
            .otherwise("resurrected").alias("state"),
        )
        got = {(r["m"], r["state"]) for r in cls.collect()}
        assert got == {(0, "new"), (1, "retained"), (3, "resurrected"), (0, "new")} | {(0, "new")}
        # churn: week 1 has 1 retained of week 0's 2 actives -> 1 churned


class TestParetoDeciles:
    def test_shares_sum_to_one(self, spark):
        import __spark_entry__ as em

        rows = em.queries()["events_pareto_deciles"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert sum(r["volume_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
        assert sum(r["user_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
        # top decile's per-user volume must be >= bottom decile's
        by = {r["decile"]: r for r in rows}
        lo, hi = min(by), max(by)
        assert (
            by[hi]["n_events"] / by[hi]["n_users"]
            >= by[lo]["n_events"] / by[lo]["n_users"]
        )


class TestConcurrencySweep:
    def test_hand_intervals(self, spark):
        # three overlapping + one disjoint: peak 3
        import __spark_entry__  # noqa: F401

        from pyspark.sql import Window as W

        iv = spark.createDataFrame(
            [
                (1, "d", 0, 10),
                (2, "d", 5, 15),
                (3, "d", 9, 12),
                (4, "d", 20, 25),
                (5, "d", 25, 30),  # back-to-back with 4: end before start
            ],
            "event_id long, day string, s long, e long",
        )
        pts = iv.select(
            "day", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
        ).unionByName(
            iv.select("day", F.col("e").alias("t"), F.lit(-1).alias("delta"), "event_id")
        )
        w = (
            W.partitionBy("day")
            .orderBy("t", "delta", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        run = pts.select("day", F.sum("delta").over(w).alias("conc"))
        peak = run.groupBy("day").agg(F.max("conc").alias("p")).collect()[0]["p"]
        assert peak == 3  # NOT 4: intervals 4/5 touch but don't overlap


class TestPartitionInvariance:
    def test_results_independent_of_shuffle_partitions(self, spark):
        # the determinism claim the oracle gate rests on: identical rows
        # at any parallelism.  Exercised on the partition-sensitive
        # shapes of this round (percentile cuts, global windows, sweep
        # lines, token stats).
        import __spark_entry__ as em

        names = [
            "events_rfm_scores",
            "llm_source_logodds",
            "events_concurrency_peak",
            "llm_pmi_collocations",
            "events_pareto_deciles",
        ]
        qs = em.queries()
        before = spark.conf.get("spark.sql.shuffle.partitions")
        results = {}
        try:
            for nparts in ("3", "17"):
                spark.conf.set("spark.sql.shuffle.partitions", nparts)
                for n in names:
                    df = qs[n](spark, "/root/testdata/sf0.001")
                    rows = sorted(
                        tuple(r) for r in df.collect()
                    )
                    results.setdefault(n, []).append(rows)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", before)
        for n, (a, b) in results.items():
            assert a == b, f"{n} differs across shuffle partition counts"
            assert a, f"{n} returned no rows at sf0.001"


class TestLinearAttribution:
    def test_credits_sum_to_conversions(self, spark):
        import __spark_entry__ as em

        rows = em.queries()["events_attribution_linear"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        total_credit = sum(r["credited_conversions"] for r in rows)
        n_purchases = (
            em.queries()["events_attribution_last_touch"](
                spark, "/root/testdata/sf0.001"
            )
            .agg(F.sum("n_conversions"))
            .collect()[0][0]
        )
        assert total_credit == pytest.approx(float(n_purchases), abs=1e-3)


class TestReviewFixes:
    def test_t_closeness_null_sensitive_excluded(self, spark):
        from aicoe_osc_demo_spark.operators.quality import t_closeness_report

        rows = [("A", 0)] * 3 + [("A", None)] * 4 + [("B", 0)] * 3
        df = spark.createDataFrame(rows, "qi string, v int")
        out = {
            r["qi"]: r
            for r in t_closeness_report(df, ["qi"], F.col("v")).collect()
        }
        # nulls excluded: both classes hold only v=0 = the whole observed
        # distribution -> t = 0, and n counts non-null rows only
        assert out["A"]["n"] == 3 and out["B"]["n"] == 3
        assert out["A"]["t"] == pytest.approx(0.0)

    def test_k_core_raises_when_round_budget_exceeded(self, spark):
        from aicoe_osc_demo_spark.operators.graph import k_core

        # 12-node path: sheds 2 endpoints per round, needs ~5 rounds
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "src long, dst long"
        )
        with pytest.raises(RuntimeError, match="fixpoint"):
            k_core(edges, 2, max_iters=2)
        # with budget it converges to the (empty) 2-core
        assert k_core(edges, 2, max_iters=50).count() == 0

    def test_pack_utilization_spill_bins_counted(self, spark):
        # shard with 300+300 tokens: stream spans 2 bins (600 > 512),
        # pad must be 1024-600, never negative
        import __spark_entry__  # noqa: F401
        from aicoe_osc_demo_spark.operators.corpus import pack_offset_bins

        d = spark.createDataFrame(
            [(1, "s", 300), (2, "s", 300)], "doc_id long, source string, n_tokens long"
        )
        p = pack_offset_bins(d, token_col="n_tokens", budget=512, shard_col="source")
        shard = p.groupBy("shard").agg(
            F.sum("n_tokens").alias("t"),
            F.ceil(F.sum("n_tokens") / F.lit(512.0)).cast("long").alias("n_bins"),
        ).collect()[0]
        assert shard["n_bins"] == 2
        assert shard["n_bins"] * 512 - shard["t"] == 424
