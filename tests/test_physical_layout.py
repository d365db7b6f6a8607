"""Physical-layout tests: bucketed co-located joins and partition pruning —
the storage-side levers that decide shuffle volume at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.sources.files import write_bucketed_table, write_parquet


def _explain(df, mode="simple"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    facts = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    dims = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v2"))
    write_bucketed_table(facts, "b_facts", "k", 8, sort_col="k", path=str(tmp_path / "f"))
    write_bucketed_table(dims, "b_dims", "k", 8, sort_col="k", path=str(tmp_path / "d"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
        plan = _explain(joined)
        # same bucketing on both sides → no shuffle exchange for the join
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE b_facts")
        spark.sql("DROP TABLE b_dims")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "click" if i % 2 else "view", float(i)) for i in range(100)],
        ["id", "event_type", "value"],
    )
    path = str(tmp_path / "events_parted")
    write_parquet(df, path, partition_by=["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _explain(back, "formatted")
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_type" in pf[0]  # pruned at the scan, not post-filter
    assert back.count() == 50


def test_bm25_postings_bucketed_reuse(spark, tmp_path):
    # the BM25 scale path: persist the (term, doc_id, dl, tf) postings
    # bucketed by term once, then later query batches aggregate per term
    # with NO exchange on the postings side
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i % 7 + 3))) for i in range(200)],
        "doc_id long, text string",
    )
    words = F.split(F.col("text"), " ")
    toks = docs.select("doc_id", F.size(words).alias("dl"), F.explode(words).alias("term"))
    postings = toks.groupBy("term", "doc_id", "dl").agg(F.count(F.lit(1)).alias("tf"))
    write_bucketed_table(
        postings, "b_postings", "term", 8, sort_col="term", path=str(tmp_path / "p")
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        dfreq = spark.table("b_postings").groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        plan = _explain(dfreq)
        # per-term aggregation rides the bucketing — no shuffle
        assert "Exchange hashpartitioning" not in plan
        assert dfreq.count() == 9  # w0..w8 (max 7+3-1 = 9 distinct words... w0-w8)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE b_postings")


def test_minhash_ledger_bucketed_reuse(spark, tmp_path):
    # the incremental near-dedup scale path: persist the accepted corpus's
    # banded signature ledger bucketed by bkey ONCE; every future batch's
    # candidate join then reads the ledger co-located — no Exchange on the
    # ledger (big) side, only the new batch shuffles
    from aicoe_osc_demo_spark.operators.dedup import (
        banded_signature_ledger,
        incremental_near_dedup,
        minhash_signatures_wide,
    )

    corpus = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over the lazy dog " * 3)
         for i in range(40)],
        "doc_id long, text string",
    )
    wide = minhash_signatures_wide(corpus, "text", "doc_id", 8)
    banded = banded_signature_ledger(wide, 8, 4)
    write_bucketed_table(
        banded, "b_sig_ledger", "bkey", 8, sort_col="bkey", path=str(tmp_path / "l")
    )
    batch = spark.createDataFrame(
        [(100, "the quick brown fox 3 jumps over the lazy dog " * 3),  # near-dup of 3
         (101, "an entirely different new document about spark bucketing")],
        "doc_id long, text string",
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out_bucketed = incremental_near_dedup(batch, spark.table("b_sig_ledger"))
        out_wide = incremental_near_dedup(batch, wide)
        # identical acceptance decisions regardless of ledger layout
        assert {r.doc_id for r in out_bucketed.collect()} == {
            r.doc_id for r in out_wide.collect()
        } == {101}
        # the ledger scan rides its buckets (not "disabled by query
        # planner", which is what a (band, bkey) join would produce)...
        plan_b = _explain(out_bucketed, "formatted")
        assert "Bucketed: true" in plan_b
        assert "disabled by query planner" not in plan_b
        # ...and the ledger-side shuffle (plus the repartitions that rode
        # on it) is gone
        n_b = _explain(out_bucketed).count("Exchange hashpartitioning")
        n_w = _explain(out_wide).count("Exchange hashpartitioning")
        assert n_b < n_w
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE b_sig_ledger")


def test_band_key_encodes_band_index(spark):
    # The bucketed-ledger candidate join keys on bkey ALONE (adding band
    # would defeat bucket co-location), so bkey must distinguish equal
    # signature slices that sit in DIFFERENT bands: a signature whose four
    # band slices are identical must still produce four distinct bkeys.
    # Without the band index in the hash, a band-0 slice colliding with a
    # ledger doc's band-2 slice feeds a spurious candidate into the
    # thresholded-estimator rejection, and acceptance decisions then
    # depend on which ledger layout the caller persisted.
    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.dedup import _band_stack_expr

    wide = spark.createDataFrame(
        [(1, 5, 7, 5, 7, 5, 7, 5, 7)],
        "doc_id long, mh0 long, mh1 long, mh2 long, mh3 long, "
        "mh4 long, mh5 long, mh6 long, mh7 long",
    )
    banded = wide.select("doc_id", F.expr(_band_stack_expr(8, 4)))
    rows = banded.collect()
    assert len(rows) == 4
    assert len({r.bkey for r in rows}) == 4, "equal slices in different bands must not share a bkey"


def test_ivf_index_partition_pruned_serving(spark, tmp_path):
    # The billion-vector serving shape: train the coarse quantizer once,
    # persist vectors PARTITIONED BY ivf_list, then serve top-k reading
    # only the probed partitions — the scan must show a static
    # PartitionFilters isin on ivf_list, and results must equal the
    # non-persisted ivf_topk on the same assignment.
    import random

    from pyspark.sql import functions as F

    from aicoe_osc_demo_spark.operators.similarity import (
        ivf_index_topk,
        ivf_topk,
        train_ivf_quantizer,
        write_ivf_index,
    )

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = train_ivf_quantizer(corpus, n_lists=6, max_iter=5)
    path = str(tmp_path / "ivf")
    write_ivf_index(assigned, path)

    queries = corpus.filter(F.col("vec_id") < 2)
    served = ivf_index_topk(spark, path, queries, k=3, nprobe=2)
    direct = ivf_topk(assigned, queries, k=3, nprobe=2, label_col="ivf_list")
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, direct.collect()))

    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [ivf_list IN" in plan or (
        "PartitionFilters" in plan and "ivf_list" in plan.split("PartitionFilters")[1][:200]
    ), plan[:2000]


def test_zorder_key_matches_python_morton(spark):
    from aicoe_osc_demo_spark.operators.layout import zorder_key

    def morton(x, y, bits=8):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    pts = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(200)]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")
        ).collect()
    }
    assert got == {i: morton(x, y) for i, x, y in pts}


def test_zorder_layout_skips_files_linear_layout_cannot(spark, tmp_path):
    # THE data-skipping claim, measured: same data, same file count, same
    # box predicate — the x-sorted layout must scan (nearly) every file
    # for a y-only predicate, the z-ordered layout a small fraction.
    import random

    from aicoe_osc_demo_spark.operators.layout import (
        collect_file_stats,
        pruned_read,
        zorder_write,
    )

    random.seed(41)
    rows = [
        (i, random.randrange(256), random.randrange(256)) for i in range(20000)
    ]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    lin, zo = str(tmp_path / "linear"), str(tmp_path / "zorder")
    # linear layout: clustered on x only (the single-column sort a naive
    # pipeline would choose)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lin)
    zorder_write(df, zo, "x", "y", bits=8, n_files=16)

    stats_lin = collect_file_stats(spark, lin, ["x", "y"]).persist()
    stats_zo = collect_file_stats(spark, zo, ["x", "y"]).persist()
    assert stats_lin.count() == 16 and stats_zo.count() == 16

    def overlapping(stats, box):
        cond = None
        for c, (lo, hi) in box.items():
            k = (F.col(f"max_{c}") >= lo) & (F.col(f"min_{c}") <= hi)
            cond = k if cond is None else cond & k
        return stats.filter(cond).count()

    box_y = {"y": (0, 15)}
    # y-only predicate: x-clustering gives no y locality -> every file
    # overlaps; z-ordering bounds y per file -> at most half survive
    # (bits=8, 16 files ~ 4 z-prefix bits -> 64-wide y stripes)
    assert overlapping(stats_lin, box_y) == 16
    assert overlapping(stats_zo, box_y) <= 8

    # and the pruned read returns EXACTLY the full-scan answer
    box = {"x": (32, 95), "y": (0, 15)}
    expect = sorted(
        r["id"]
        for r in df.filter(
            (F.col("x") >= 32) & (F.col("x") <= 95) & (F.col("y") >= 0) & (F.col("y") <= 15)
        ).collect()
    )
    got = sorted(r["id"] for r in pruned_read(spark, zo, box, stats=stats_zo).collect())
    assert got == expect
    # empty box prunes everything and still returns a well-formed frame
    empty = pruned_read(spark, zo, {"x": (300, 400)}, stats=stats_zo)
    assert empty.count() == 0 and set(empty.columns) == {"id", "x", "y"}
    stats_lin.unpersist()
    stats_zo.unpersist()


def test_compact_small_files_incremental_and_lossless(spark, tmp_path):
    import os

    from aicoe_osc_demo_spark.operators.layout import (
        compact_small_files,
        list_data_files,
    )

    path = str(tmp_path / "ingest")
    # simulate streaming ingest: 12 tiny files...
    df = spark.range(1200).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    df.repartition(12).write.parquet(path)
    # ...plus 2 "already compacted" big files (bigger than small_bytes)
    big = spark.range(1200, 60000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    big.repartition(2).write.mode("append").parquet(path)

    before = dict(list_data_files(spark, path))
    sizes = sorted(before.values())
    small_thr = (sizes[-3] + sizes[-2]) // 2  # between tiny and big sizes
    big_files = {f for f, s in before.items() if s >= small_thr}
    assert len(big_files) == 2 and len(before) == 14
    big_mtimes = {f: os.path.getmtime(f.replace("file:", "")) for f in big_files}

    expect = sorted(r["id"] for r in spark.read.parquet(path).collect())
    stats = compact_small_files(
        spark, path, target_bytes=1 << 30, small_bytes=small_thr
    )
    assert stats == {
        "files_before": 14,
        "files_after": 3,
        "rewritten": 12,
        "bins": 1,
    }
    after = dict(list_data_files(spark, path))
    assert len(after) == 3
    # the big files are byte-for-byte untouched (same path, same mtime)
    for f in big_files:
        assert f in after and before[f] == after[f]
        assert os.path.getmtime(f.replace("file:", "")) == big_mtimes[f]
    # no data lost or duplicated
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == expect
    # idempotent: a second run with nothing small enough is a no-op
    again = compact_small_files(spark, path, target_bytes=1 << 30, small_bytes=100)
    assert again["rewritten"] == 0 and len(dict(list_data_files(spark, path))) == 3


def test_schema_evolution_merge_and_column_defaults(spark, tmp_path):
    # additive schema evolution on an append-only table: old files lack
    # the new column; mergeSchema reconciles and old rows read as NULL,
    # so ingest never rewrites history to add a field
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v1"]).write.parquet(path)
    spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], ["id", "v1", "v2"]
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v1", "v2"}
    rows = {r["id"]: (r["v1"], r["v2"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30.0), 4: ("d", 40.0)}
    # the evolved column still supports pushdown-friendly predicates and
    # null-bucketing of the historical rows
    n_old = merged.filter(F.col("v2").isNull()).count()
    assert n_old == 2
    # WITHOUT mergeSchema Spark picks one footer's schema — the read
    # still works but may drop the new column; the option is the contract
    plain = spark.read.parquet(path)
    assert set(plain.columns) <= {"id", "v1", "v2"}


def test_compact_partitioned_preserves_partition_values(spark, tmp_path):
    from aicoe_osc_demo_spark.operators.layout import (
        compact_partitioned,
        list_data_files,
    )

    root = str(tmp_path / "parted")
    df = spark.createDataFrame(
        [(i, "p%d" % (i % 3), float(i)) for i in range(600)], ["id", "pt", "v"]
    )
    # 8 small files inside each of 3 partitions
    df.repartition(8).write.partitionBy("pt").parquet(root)
    expect = sorted((r["id"], r["pt"]) for r in spark.read.parquet(root).collect())

    stats = compact_partitioned(spark, root, target_bytes=1 << 30, small_bytes=1 << 20)
    assert stats["partitions"] == 3 and stats["partitions_compacted"] == 3
    assert stats["files_after"] == 3  # one bin per partition
    for p in ("p0", "p1", "p2"):
        assert len(list_data_files(spark, root + f"/pt={p}")) == 1
    got = sorted((r["id"], r["pt"]) for r in spark.read.parquet(root).collect())
    assert got == expect  # data AND partition values intact


def test_delete_where_rewrites_only_overlapping_files(spark, tmp_path):
    import os
    import random

    from aicoe_osc_demo_spark.operators.layout import (
        collect_file_stats,
        delete_where,
        list_data_files,
        zorder_write,
    )

    random.seed(47)
    rows = [(i, random.randrange(256), random.randrange(256)) for i in range(20000)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    path = str(tmp_path / "table")
    zorder_write(df, path, "x", "y", bits=8, n_files=16)

    before = {f: os.path.getmtime(f.replace("file:", "")) for f, _ in list_data_files(spark, path)}
    box = {"x": (0, 31), "y": (0, 31)}  # one z-quadrant corner
    stats = collect_file_stats(spark, path, ["x", "y"])
    res = delete_where(spark, path, box, stats=stats)
    # targeted: only the files covering the corner rectangle got rewritten
    assert 0 < res["files_rewritten"] <= 4
    expected_deleted = sum(1 for _, x, y in rows if x <= 31 and y <= 31)
    assert res["rows_deleted"] == expected_deleted
    # untouched files keep their exact mtimes
    after = dict(list_data_files(spark, path))
    untouched = [f for f in before if f in after]
    assert len(untouched) == 16 - res["files_rewritten"]
    for f in untouched:
        assert os.path.getmtime(f.replace("file:", "")) == before[f]
    # the table now equals a plain filtered copy of the original
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    expect = sorted(i for i, x, y in rows if not (x <= 31 and y <= 31))
    assert got == expect
    # disjoint box: pure no-op
    res2 = delete_where(spark, path, {"x": (300, 400)})
    assert res2["files_rewritten"] == 0 and res2["rows_deleted"] == 0


def test_layout_bucketed_join_entry_elides_join_exchange(spark):
    # The catalog entry must actually get the co-located join: with
    # broadcast disabled, the only hashpartitioning Exchange in the plan
    # is the groupBy's — the join itself adds none (both sides arrive
    # pre-bucketed on the customer key).
    from aicoe_osc_demo_spark.plans import QUERIES

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = QUERIES["layout_bucketed_join"](spark, "/root/testdata/sf0.001")
        plan = _explain(df)
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "SortMergeJoin" in plan
        assert df.count() == 5  # one row per market segment
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_bucketed_fact_join_entries_elide_fact_exchanges(spark):
    # The Q4/Q10 bucketed-served variants must join the two FACT tables
    # with zero Exchange before the join — the remedy SCALE.md cites for
    # the two honest orderkey fact-shuffles.
    from aicoe_osc_demo_spark.plans import QUERIES

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        q4 = QUERIES["join_exists_order_priority_bkt"](spark, "/root/testdata/sf0.001")
        plan4 = _explain(q4)
        # only the tiny priority-rollup exchange remains
        assert plan4.count("Exchange hashpartitioning") == 1
        assert "SortMergeJoin" in plan4 and "LeftSemi" in plan4
        assert q4.count() == 5

        q10 = QUERIES["join_returned_revenue_topk_bkt"](spark, "/root/testdata/sf0.001")
        plan10 = _explain(q10)
        # custkey rollup is the only fact-sized exchange (inherent — the
        # key changes); the orderkey join itself adds none
        assert plan10.count("Exchange hashpartitioning") <= 2
        assert "SortMergeJoin" in plan10
        assert q10.count() == 20
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
