"""Physical-layout operators: multi-dimensional clustering (Z-order) and
stats-manifest data skipping.

This is the lakehouse file-pruning architecture (Delta/Iceberg
``OPTIMIZE ZORDER BY`` + per-file column stats) re-expressed Spark-first:

- :func:`zorder_key` interleaves the bits of two bounded integer keys
  into one Morton code, so sorting by ONE column co-locates rows that
  are close in BOTH dimensions;
- :func:`zorder_write` lands a table range-partitioned and sorted by
  that code — every output file covers a compact rectangle of the
  (x, y) space instead of a stripe;
- :func:`collect_file_stats` builds the per-file min/max manifest (the
  Delta ``add``-action stats payload);
- :func:`pruned_read` answers a box predicate by consulting the
  manifest first and scanning ONLY overlapping files.

Why it matters at 100 TB: a single-column sort prunes one predicate
dimension and nothing else — a selective filter on the second dimension
still scans every file.  Z-ordering bounds BOTH min/max ranges per file,
so the manifest eliminates most files for any axis-aligned predicate;
the scan cost becomes proportional to the selected rectangle, not the
table.  (Single-node reference has no analogue; this is the scale-out
storage story for the relational surface, same family as
``write_ivf_index``'s partition-pruned ANN serving.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 12) -> Column:
    """Morton (Z-order) code of two non-negative ints in ``[0, 2**bits)``:
    bit b of ``x`` lands at position 2b, bit b of ``y`` at 2b+1.  Pure
    integer Column arithmetic — whole-stage codegen, exact in any engine
    (the oracle replays the identical shift/mask/add chain).
    """
    z: Column | None = None
    for b in range(bits):
        tx = F.shiftright(x.cast("long"), b).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * b)
        ).cast("long")
        ty = F.shiftright(y.cast("long"), b).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * b + 1)
        ).cast("long")
        z = tx + ty if z is None else z + tx + ty
    assert z is not None
    return z


def hilbert_key(
    df: DataFrame, x: Column, y: Column, out: str = "hkey", bits: int = 12
) -> DataFrame:
    """Append column ``out``: the Hilbert-curve index of two non-negative
    ints in ``[0, 2**bits)`` (the `xy2d` walk: descend ``bits`` quadrant
    levels, accumulating the quadrant rank and rotating/reflecting the
    frame — Hamilton, "Compact Hilbert Indices", and the classic
    public-domain xy2d form).

    Same contract as :func:`zorder_key` but with strictly better
    locality: consecutive Hilbert codes are ALWAYS adjacent cells (the
    Morton walk teleports across the square every power-of-two
    boundary), so range-partitioning by this code gives each file a
    tighter (x, y) bounding box and the stats manifest prunes more
    files for the same predicate — Delta/Iceberg expose exactly this
    switch (``OPTIMIZE ... HILBERT``) for wide tables.

    DataFrame-level (not a bare Column) because each level rewrites
    (x, y) in terms of the previous level's — as one Column the CASE
    trees would inline 3x per level (3^bits nodes); as a chain of named
    projections each level stays one alias and the whole walk is a flat
    O(bits) whole-stage-codegen'd expression chain, bit-identical in
    any engine (the oracle replays the same chain; see
    :func:`hilbert_sql`).
    """
    n = 1 << bits
    passthrough = df.columns
    cur = df.select(
        "*",
        x.cast("long").alias("_hx"),
        y.cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        xc, yc, dc = F.col("_hx"), F.col("_hy"), F.col("_hd")
        rx = F.shiftright(xc, level).bitwiseAND(F.lit(1))
        ry = F.shiftright(yc, level).bitwiseAND(F.lit(1))
        cur = cur.select(
            *passthrough,
            F.when(ry == 1, xc)
            .when(rx == 1, F.lit(n - 1).cast("long") - yc)
            .otherwise(yc)
            .alias("_hx"),
            F.when(ry == 1, yc)
            .when(rx == 1, F.lit(n - 1).cast("long") - xc)
            .otherwise(xc)
            .alias("_hy"),
            (dc + F.lit(s * s).cast("long") * (rx * F.lit(3)).bitwiseXOR(ry)).alias(
                "_hd"
            ),
        )
    return cur.select(*passthrough, F.col("_hd").alias(out))


def hilbert_sql(x_expr: str, y_expr: str, bits: int = 12) -> str:
    """DuckDB-replayable SQL computing the identical Hilbert chain as
    :func:`hilbert_key` — chained subqueries, one per level, each
    rewriting (x, y, d) with the same integer CASE arithmetic.  Shared
    generator so the Spark plan and the oracle can never drift."""
    n = 1 << bits
    inner = f"SELECT *, CAST({x_expr} AS BIGINT) AS x, CAST({y_expr} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM __HILBERT_BASE__"
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = f"((x >> {level}) & 1)"
        ry = f"((y >> {level}) & 1)"
        inner = f"""
        SELECT * REPLACE (
          CASE WHEN {ry} = 1 THEN x
               WHEN {rx} = 1 THEN {n - 1} - y ELSE y END AS x,
          CASE WHEN {ry} = 1 THEN y
               WHEN {rx} = 1 THEN {n - 1} - x ELSE x END AS y,
          d + {s * s} * xor(3 * {rx}, {ry}) AS d
        ) FROM ({inner})
        """
    return inner


def hilbert_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 12,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Hilbert index of (x_col, y_col) —
    same range-partition-and-sort layout as :func:`zorder_write` with
    the tighter-locality curve (each file's (x, y) box is a connected
    curve segment, never the two disjoint stripes Morton files get at
    power-of-two seams)."""
    keyed = hilbert_key(df, F.col(x_col), F.col(y_col), out="_hkey", bits=bits)
    (
        keyed.repartitionByRange(n_files, "_hkey")
        .sortWithinPartitions("_hkey")
        .drop("_hkey")
        .write.mode(mode)
        .parquet(path)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 12,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Z-order of (x_col, y_col): range-
    partition into ``n_files`` consecutive code ranges and sort within
    each, so every file's (x, y) min/max box is a compact rectangle.

    ``repartitionByRange`` samples the code distribution, so file
    boundaries adapt to skew (a hot rectangle splits across files instead
    of one file ballooning).  The code column itself is dropped — the
    manifest stats are collected on the NATURAL columns, which is what
    predicates arrive on.
    """
    keyed = df.withColumn("_zkey", zorder_key(F.col(x_col), F.col(y_col), bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def collect_file_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max manifest over ``cols`` plus row counts — one
    map-side-combined scan grouped by ``input_file_name()``.  In a
    production writer these stats are emitted AT write time (Delta's
    add-file stats); rebuilding them costs one pass and is embarrassingly
    parallel.  The manifest has one row per FILE — metadata-scale,
    ~millions of rows at 100 TB, itself a queryable DataFrame.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file directly under ``path`` — one
    filesystem listing, metadata-scale.  Flat (unpartitioned) layouts
    only; partitioned tables compact per partition directory."""
    fs, hpath, _ = _hadoop_fs(spark, path)
    # same visibility rule as Spark's reader: dot/underscore-prefixed
    # entries are hidden (metadata, staging, _SUCCESS)
    return [
        (str(st.getPath()), st.getLen())
        for st in fs.listStatus(hpath)
        if st.isFile()
        and not st.getPath().getName().startswith((".", "_"))
        and st.getPath().getName().endswith(".parquet")
    ]


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_bytes: int | None = None,
) -> dict:
    """Incremental small-file compaction (the Delta ``OPTIMIZE`` bin-pack,
    minus the transaction log): rewrite ONLY the files smaller than
    ``small_bytes`` (default ``target_bytes // 2``) into
    ``ceil(total_small / target_bytes)`` larger files; files already at
    target size are left byte-for-byte untouched.

    Why it matters at 100 TB: streaming/incremental ingest lands
    thousands of KB-sized files per partition; every downstream scan then
    pays one task + one open per file, and the driver pays the listing.
    Compaction is the maintenance op that keeps scan parallelism
    proportional to DATA, not to ingest cadence — and it must be
    incremental (touch small files only) or it costs a full table rewrite
    each run.

    Mechanics: the surviving small files are read in one job and
    coalesced (no shuffle) into the staging dir ``.compact_staging``
    (dot-prefixed, invisible to readers), then swapped in with
    metadata-only renames before the originals are deleted.  The
    rename-then-delete window can double-serve rows to a concurrent
    reader — a real lakehouse closes it with a manifest commit (the
    ``collect_file_stats`` manifest is the natural anchor); single-writer
    pipelines run compaction between batches, as tested.

    Returns {files_before, files_after, rewritten, bins}.
    """
    import math

    if small_bytes is None:
        small_bytes = target_bytes // 2
    files = list_data_files(spark, path)
    small = [(f, s) for f, s in files if s < small_bytes]
    if len(small) <= 1:
        n = len(files)
        return {"files_before": n, "files_after": n, "rewritten": 0, "bins": 0}
    total = sum(s for _, s in small)
    bins = max(1, math.ceil(total / target_bytes))
    staging = path.rstrip("/") + "/.compact_staging"
    spark.read.parquet(*[f for f, _ in small]).coalesce(bins).write.mode(
        "overwrite"
    ).parquet(staging)
    fs, hpath, jvm = _hadoop_fs(spark, path)
    staged = [
        st.getPath()
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(staging))
        if st.isFile() and st.getPath().getName().startswith("part-")
    ]
    for sp in staged:
        fs.rename(sp, jvm.org.apache.hadoop.fs.Path(path, "compacted-" + sp.getName()))
    for f, _ in small:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    after = len(files) - len(small) + len(staged)
    return {
        "files_before": len(files),
        "files_after": after,
        "rewritten": len(small),
        "bins": len(staged),
    }


def pruned_read(
    spark: SparkSession,
    path: str,
    box: dict[str, tuple],
    stats: DataFrame | None = None,
) -> DataFrame:
    """Read only the files whose stats-box overlaps the inclusive
    ``{col: (lo, hi)}`` predicate box, then apply the residual filter.

    The overlap test runs on the manifest (file-count-sized); the list of
    surviving file names is collected to the driver to form the read —
    metadata-scale by construction (one string per file), the same
    documented exception as ``ivf_index_topk``'s probe router.  The big
    table is only ever touched for the surviving files.
    """
    if stats is None:
        stats = collect_file_stats(spark, path, list(box))
    cond: Column | None = None
    for c, (lo, hi) in box.items():
        k = (F.col(f"max_{c}") >= F.lit(lo)) & (F.col(f"min_{c}") <= F.lit(hi))
        cond = k if cond is None else cond & k
    files = [r["file"] for r in stats.filter(cond).select("file").collect()]
    residual: Column | None = None
    for c, (lo, hi) in box.items():
        k = (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
        residual = k if residual is None else residual & k
    if not files:
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*files).filter(residual)


def analyze_column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE TABLE-style per-column statistics — row count, null count,
    exact NDV — the inputs a cost-based optimizer's join reordering and
    the stats manifest's pruning decisions feed on.

    All columns are profiled in ONE aggregate: Spark expands the N
    DISTINCT aggregates into one Expand-based shuffle (rows × N), which
    is the exact-NDV cost.  At 100 TB swap the exact NDV for the
    mergeable HLL sketch (``operators/sketch.py:hll_estimate``) and the
    pass becomes a plain map-side-combined aggregate; exact NDV here
    keeps the statistic oracle-checkable.

    Output: (column, n_rows, n_nulls, n_distinct) — one row per column.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn{i}"),
            F.countDistinct(F.col(c)).alias(f"_nd{i}"),
        ]
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn{i}").alias("n_nulls"),
                F.col(f"_nd{i}").alias("n_distinct"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(pairs).alias("e")).select(
        "e.column", "e.n_rows", "e.n_nulls", "e.n_distinct"
    )


def skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Join/aggregation-key skew diagnosis — the report that decides
    whether a key needs salting (``operators/skew.py``) or AQE skew-join
    handling before a 100 TB run: per-key row counts reduced to
    distribution statistics plus the skew ratio (max key vs median key).

    A skew_ratio near 1 means hash partitioning balances; a ratio of 10^3
    means one reducer gets a thousand medians' worth of rows and the
    stage runs at the speed of that one task.  Rule of thumb: salt with
    ``ceil(max_count / p99)`` shards (reported as suggested_salt).

    Two map-side-combined aggregates (rows → per-key counts → one stats
    row); nothing wide shuffles except the per-key count itself.
    Output: one row (n_keys, max_count, p50, p99, skew_ratio,
    suggested_salt).
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
    p50 = F.expr("percentile(_n, 0.50)")
    p99 = F.expr("percentile(_n, 0.99)")
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_n").alias("max_count"),
        F.round(p50, 6).alias("p50"),
        F.round(p99, 6).alias("p99"),
        F.round(F.max("_n").cast("double") / p50, 6).alias("skew_ratio"),
        F.ceil(F.max("_n").cast("double") / p99).cast("long").alias("suggested_salt"),
    )


def compact_partitioned(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_bytes: int | None = None,
) -> dict:
    """Partition-wise small-file compaction: apply
    :func:`compact_small_files` inside every ``col=value`` partition
    directory of a SINGLE-LEVEL Hive-layout table (multi-level
    ``partitionBy(a, b)`` layouts need the leaf directories — recurse the
    listing before calling the per-directory op).  Files only ever move
    WITHIN their partition directory, so partition values (carried by the
    directory name) are untouched and readers of the table root see
    identical data.

    The partition listing is one metadata call; at 100 TB the per-
    partition rewrites are independent — run them from a driver loop (as
    here), or fan out one job over many partitions when partition count,
    not partition size, dominates.  Returns aggregate counts plus the
    number of partitions touched.
    """
    fs, hpath, _ = _hadoop_fs(spark, root)
    parts = [
        str(st.getPath())
        for st in fs.listStatus(hpath)
        if st.isDirectory() and "=" in st.getPath().getName()
    ]
    total = {"files_before": 0, "files_after": 0, "rewritten": 0, "bins": 0}
    touched = 0
    for p in parts:
        r = compact_small_files(spark, p, target_bytes, small_bytes)
        for k in total:
            total[k] += r[k]
        touched += 1 if r["rewritten"] else 0
    total["partitions"] = len(parts)
    total["partitions_compacted"] = touched
    return total


def delete_where(
    spark: SparkSession,
    path: str,
    box: dict[str, tuple],
    stats: DataFrame | None = None,
) -> dict:
    """Targeted row deletion (the GDPR / right-to-be-forgotten shape):
    remove every row inside the inclusive ``{col: (lo, hi)}`` box by
    rewriting ONLY the files whose stats-manifest min/max box overlaps
    the predicate — the same pruning :func:`pruned_read` uses, applied to
    a write.  On a :func:`zorder_write` layout a selective delete touches
    the few files covering the target rectangle; every other file stays
    byte-for-byte untouched.

    Mechanics mirror :func:`compact_small_files`: survivors of the
    overlapping files land in a hidden staging dir, swap in via metadata
    renames, then the originals are deleted (same single-writer window,
    same manifest-commit upgrade path).  Files whose rewrite would be
    empty (every row matched) are simply removed.

    Returns {files_total, files_rewritten, rows_deleted}.
    """
    if stats is None:
        stats = collect_file_stats(spark, path, list(box))
    cond: Column | None = None
    match: Column | None = None
    for c, (lo, hi) in box.items():
        k = (F.col(f"max_{c}") >= F.lit(lo)) & (F.col(f"min_{c}") <= F.lit(hi))
        cond = k if cond is None else cond & k
        m = (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
        match = m if match is None else match & m
    # NULL predicate columns are NOT provably in the box — keep those rows
    # (a bare ~match would silently delete them)
    keep = ~F.coalesce(match, F.lit(False))
    all_files = [f for f, _ in list_data_files(spark, path)]
    touched = [r["file"] for r in stats.filter(cond).select("file").collect()]
    if not touched:
        return {"files_total": len(all_files), "files_rewritten": 0, "rows_deleted": 0}
    src = spark.read.parquet(*touched)
    n_before = src.count()
    survivors = src.filter(keep)
    staging = path.rstrip("/") + "/.delete_staging"
    survivors.coalesce(max(1, len(touched))).write.mode("overwrite").parquet(staging)
    n_after = spark.read.parquet(staging).count()
    fs, _, jvm = _hadoop_fs(spark, path)
    staged = [
        st.getPath()
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(staging))
        if st.isFile() and st.getPath().getName().startswith("part-")
    ]
    for sp in staged:
        fs.rename(sp, jvm.org.apache.hadoop.fs.Path(path, "deleted-" + sp.getName()))
    for f in touched:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    return {
        "files_total": len(all_files),
        "files_rewritten": len(touched),
        "rows_deleted": n_before - n_after,
    }


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    top: int = 10,
) -> DataFrame:
    """Pre-flight equi-join output-size estimate: per-key row counts on
    each side, exact output cardinality sum(c_left * c_right), and the
    ``top`` keys contributing most output — the companion diagnostic to
    :func:`skew_report` for the OTHER way a big join goes wrong.  Skew is
    one reducer drowning; explosion is the join itself emitting orders of
    magnitude more rows than either input (hub keys on both sides).

    Running this first costs two map-side-combined counts plus a join on
    the (tiny) per-key count tables — at 100 TB that is minutes against
    the hours (or the executor-OOM) of discovering the explosion by
    running the real join.  The total and per-key products are exact, so
    the report doubles as the decision input for pre-aggregating one side
    or switching to a semi-join.

    Output: ``top`` rows (key..., left_rows, right_rows, out_rows,
    out_share_pct, total_out_rows), largest contributors first.
    """
    lc = left.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("left_rows"))
    rc = right.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("right_rows"))
    per = lc.join(rc, key_cols).withColumn(
        "out_rows", F.col("left_rows") * F.col("right_rows")
    )
    total = per.agg(F.sum("out_rows").cast("long").alias("total_out_rows"))
    ranked = per.crossJoin(F.broadcast(total)).select(
        *key_cols,
        "left_rows",
        "right_rows",
        "out_rows",
        F.round(
            F.col("out_rows").cast("double") / F.col("total_out_rows") * 100, 6
        ).alias("out_share_pct"),
        "total_out_rows",
    )
    return ranked.orderBy(F.desc("out_rows"), *key_cols).limit(top)


def column_histograms(
    df: DataFrame, cols: list[str], bins: int = 10
) -> DataFrame:
    """Equi-width histogram profile for N numeric columns in TWO passes
    (one tiny min/max aggregate broadcast back, one Expand-based count) —
    the distribution companion of :func:`analyze_column_stats`, and the
    CBO/skew-triage input a row/null/NDV profile can't give: where the
    mass sits, whether a column is uniform or one-spike, which predicate
    ranges are selective.

    Bin rule: ``least(floor((x - min) * bins / (max - min)), bins - 1)``
    — a fixed double chain, identical in any engine; NULLs are excluded
    (profiled separately by analyze_column_stats); a constant column
    collapses to bin 0.  Output: (column, bin, lo, hi, n) with the bin's
    [lo, hi) bounds.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    )
    wide = df.crossJoin(F.broadcast(stats))
    entries = []
    for c in cols:
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        x = F.col(c).cast("double")
        bin_ = F.when(mx == mn, F.lit(0)).otherwise(
            F.least(
                F.floor((x - mn) * bins / (mx - mn)).cast("int"), F.lit(bins - 1)
            )
        )
        entries.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit(c).alias("column"),
                    bin_.alias("bin"),
                    mn.alias("_mn"),
                    mx.alias("_mx"),
                ),
            )
        )
    exploded = wide.select(F.explode(F.array(*entries)).alias("e")).filter(
        F.col("e").isNotNull()
    )
    width = (F.col("_mx") - F.col("_mn")) / bins
    return (
        exploded.groupBy("e.column", "e.bin", "e._mn", "e._mx")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "column",
            F.col("bin").cast("int").alias("bin"),
            F.round(F.col("_mn") + F.col("bin") * width, 6).alias("lo"),
            F.round(F.col("_mn") + (F.col("bin") + 1) * width, 6).alias("hi"),
            "n",
        )
    )


def correlation_matrix(
    df: DataFrame, cols: list[str], quantize_scale: int | None = None
) -> DataFrame:
    """Pearson correlation for every column pair in ONE scan -- the
    profiling companion of ``analyze_column_stats``.  ``corr`` is a
    combinable moment aggregate (n, sum x, sum y, sum xy, sum x^2,
    sum y^2 per pair), so all C(k,2) pairs reduce map-side in a single
    pass; only k(k-1)/2 moment tuples cross the shuffle regardless of
    row count.  Output is long-form (col_a, col_b, corr) so downstream
    joins/filters don't need to know k.

    ``quantize_scale``: when the columns are fixed-point measures (cents,
    integral quantities), pass the scale (e.g. 100) and each value
    quantizes per-row to ``floor(v*scale + 0.5)`` BIGINT; the five
    moments per pair become EXACT integer sums (DECIMAL(38,0) so
    100 TB-scale row counts don't overflow) and the Pearson r comes from
    one final fixed-order double expression — accumulation-order-proof,
    unlike the builtin ``corr``'s running-mean co-moment updates, whose
    low bits depend on partition order and can flip a 6-dp round (the
    llm_heaps_law r10 flake class).  Pearson r is scale-invariant, so
    quantization only perturbs r by the rounding of v*scale itself.
    """
    from .relational import ensure_parallelism

    # C(k,2)*6 moment aggregates per row are a compute-heavy narrow stage
    # (decimal128 sums on the exact path): spread single-row-group inputs
    # so the map-side partials use every core (no-op at scale; the exact
    # integer sums are order-independent, so the result is bit-equal)
    df = ensure_parallelism(df.select(*cols))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    if quantize_scale is None:
        wide = df.agg(
            *[
                F.round(F.corr(F.col(a), F.col(b)), 6).alias(f"{a} {b}")
                for a, b in pairs
            ]
        )
        structs = F.array(
            *[
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col(f"`{a} {b}`").alias("corr"),
                )
                for a, b in pairs
            ]
        )
        return wide.select(F.explode(structs).alias("p")).select("p.*")

    dec = "decimal(38,0)"
    qcol = {
        c: F.floor(F.col(c) * quantize_scale + F.lit(0.5)).cast("long") for c in cols
    }
    aggs = []
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        x = F.when(both, qcol[a])
        y = F.when(both, qcol[b])
        tag = f"{a} {b}"
        aggs += [
            F.count(x).cast("long").alias(f"n|{tag}"),
            F.coalesce(F.sum(x.cast(dec)), F.lit(0).cast(dec)).alias(f"sx|{tag}"),
            F.coalesce(F.sum(y.cast(dec)), F.lit(0).cast(dec)).alias(f"sy|{tag}"),
            F.coalesce(F.sum((x * x).cast(dec)), F.lit(0).cast(dec)).alias(f"sxx|{tag}"),
            F.coalesce(F.sum((y * y).cast(dec)), F.lit(0).cast(dec)).alias(f"syy|{tag}"),
            F.coalesce(F.sum((x * y).cast(dec)), F.lit(0).cast(dec)).alias(f"sxy|{tag}"),
        ]
    wide = df.agg(*aggs)

    def _corr(tag: str):
        n = F.col(f"`n|{tag}`").cast(dec)
        num = n * F.col(f"`sxy|{tag}`") - F.col(f"`sx|{tag}`") * F.col(f"`sy|{tag}`")
        dx = n * F.col(f"`sxx|{tag}`") - F.col(f"`sx|{tag}`") * F.col(f"`sx|{tag}`")
        dy = n * F.col(f"`syy|{tag}`") - F.col(f"`sy|{tag}`") * F.col(f"`sy|{tag}`")
        return F.when(
            (dx > 0) & (dy > 0),
            F.round(
                num.cast("double")
                / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
                6,
            ),
        )

    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                _corr(f"{a} {b}").alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select("p.*")
