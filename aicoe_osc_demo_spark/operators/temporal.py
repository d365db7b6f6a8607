"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference has neither (SURVEY §2.3 note), but they are core operators
for event-stream feature engineering, so the engine provides them
Spark-first:

- ``asof_join`` — for each left row, the latest right row at-or-before its
  timestamp per key.  Implemented with the union + keyed-window
  last(ignorenulls) pattern: ONE shuffle on (key), no range explosion, no
  per-row lookups.  This is the standard scalable Spark formulation — a
  windowed scan over the merged stream — and matches DuckDB's native
  ``ASOF JOIN`` semantics exactly.
- ``range_join_broadcast`` — interval-containment join against a SMALL
  interval dimension (broadcast); Spark plans it as a
  BroadcastNestedLoopJoin which is the right physical choice when one side
  fits in memory.  For large×large range joins, bucket both sides by
  interval-aligned time buckets first (the bucketing reduces it to an
  equi-join + residual predicate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: attach to each left row the ``value_cols`` of the
    most recent right row with right_ts <= left_ts, per ``on`` key.

    Ties (equal timestamps) prefer the right row, matching ASOF JOIN's
    at-or-before contract.
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    # ALL value cols ride in ONE struct: the fill must pick the latest
    # right ROW and take its values as-is — per-column ignorenulls fills
    # would skip a matched row whose value is NULL (conflating "no row"
    # with "row with NULL value") and could stitch different columns from
    # different rows.  The struct itself is never NULL for a right row, so
    # last(_v, ignorenulls) is a row-level pick.  (Found by the r13 null-
    # view differential fuzzer: ASOF LEFT JOIN on a nullable value column.)
    rt = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_v"),
    ).withColumn("_side", F.lit(0))
    lt = lt.withColumn("_v", F.lit(None).cast(dict(rt.dtypes)["_v"]))
    left_only_cols = [c for c in lt.columns if c not in rt.columns]
    for c in left_only_cols:
        rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    merged = lt.select(*lt.columns).unionByName(rt.select(*lt.columns))

    # right rows (side 0) sort before left rows at the same _ts → a left row
    # at time t sees a right row at exactly t (at-or-before)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn("_f", F.last(F.col("_v"), ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1)
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_f.{c}"))
    return out.drop("_side", "_ts", "_v", "_f")


def range_join_broadcast(
    fact: DataFrame,
    intervals: DataFrame,
    point: Column,
    start: Column,
    end: Column,
) -> DataFrame:
    """Interval-containment join: fact rows matched to broadcast intervals
    with start <= point < end."""
    return fact.join(F.broadcast(intervals), (point >= start) & (point < end))


def binned_range_join(
    fact: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Interval-containment join for LARGE interval tables — the scale path
    next to ``range_join_broadcast``, which requires the interval side to
    fit in a broadcast.  Both sides map onto fixed-width bins of the
    numeric axis (each point to one bin, each interval to every bin it
    overlaps via one explode), candidates come from a plain equi-join on
    the bin id, and the exact ``start <= point < end`` predicate filters
    them.  One shuffle on the bin key, no nested loop, no cartesian; bins
    also spread a hot interval over multiple tasks.

    Columns must be numeric (e.g. epoch seconds or day numbers) — callers
    convert timestamps explicitly, which keeps the operator free of
    session-timezone semantics.  Pick ``bin_width`` near the median
    interval length: wider bins cut interval replication, narrower bins
    cut false candidates.
    """
    f = fact.withColumn("_bin", F.floor(F.col(point_col) / bin_width))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width),
                F.floor((F.col(end_col) - 1) / bin_width),
            )
        ),
    )
    return (
        f.join(iv, on="_bin")
        .filter(
            (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bin")
    )


def gapfill_locf(
    buckets: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_cols: list[str],
    step_seconds: int,
) -> DataFrame:
    """Time-bucket gap filling with last-observation-carried-forward — the
    hypertable ``time_bucket_gapfill(...) + locf(...)`` shape: every key
    gets a dense bucket grid from its first to its last observed bucket;
    missing buckets carry the previous bucket's values forward (NULL before
    the first observation never occurs because the grid starts there).

    Input must already be bucketed (one row per (key, bucket)).  The grid
    is built per key with sequence+explode — no driver-side range, no
    cross join with a calendar table; the fill is one last(ignorenulls)
    window per key.  Scale: grid size is (span/step) rows per key,
    generated executor-side; the only shuffle is the key window, and a
    year of hourly buckets is 8.8k rows per key — trivially windowable.
    """
    span = buckets.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    step = F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
    grid = span.select(
        *key_cols,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(bucket_col),
    )
    # explicit presence marker: an observed (key, bucket) row whose FIRST
    # value column is legitimately NULL must not be classified as a gap
    # (and get all its columns LOCF-overwritten) — gap detection must not
    # depend on any value column
    filled = grid.join(
        buckets.withColumn("_obs", F.lit(True)),
        on=[*key_cols, bucket_col],
        how="left",
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = filled.withColumn("is_gap", F.col("_obs").isNull()).drop("_obs")
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out.select(*key_cols, bucket_col, *value_cols, "is_gap")


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Time-weighted average per group under LOCF interpolation (the
    hypertable ``time_weight`` aggregate): each observation holds its
    value until the next one, so its weight is the seconds until that
    next observation — the correct mean for irregularly-sampled series,
    where the arithmetic mean over-counts bursts of rapid readings.
    The trailing observation has no successor and carries no weight;
    groups with zero covered time (single or same-instant readings) are
    excluded rather than divided by zero.

    ``ts_col`` must be NUMERIC epoch units (seconds/micros — derive once
    with the engine's portable field arithmetic, as
    ``events_trailing_hour_avg`` does); the same numeric-columns contract
    as ``binned_range_join``.

    Engine parity: each value·duration product is one IEEE-754 multiply
    quantized to integer nanos; the per-group numerator is an EXACT long
    sum (order-free), and the final estimate divides once.  Unlike the
    other nano-unit chains (bounded quantities), value·dt grows with
    both magnitude and gap length, so a contribution whose nanos would
    exceed the long range (|value·dt| > ~9.2e9 value·seconds) raises
    loudly instead of letting the non-ANSI double→long cast clamp to a
    silently wrong average.

    Shape: ONE shuffle on the group key (the LEAD window), then a
    map-side-combined aggregate — state per group is O(1).
    Output: group_cols + (total_s, twa).
    """
    tiebreak_cols = tiebreak_cols or []
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    dt = (F.lead(ts_col).over(w) - F.col(ts_col)).cast("long")
    vd = F.col(value_col).cast("double") * dt.cast("double")
    contrib_ni = F.when(
        F.abs(vd) > 9.2e9,  # ×1e9 would exceed the exact long range
        F.raise_error(
            F.concat(
                F.lit(
                    "time_weighted_avg: |value*dt| overflows the nano-long "
                    "accumulator (value="
                ),
                F.col(value_col).cast("string"),
                F.lit(", dt_s="),
                dt.cast("string"),
                F.lit("); rescale the value column or pre-split long gaps"),
            )
        ).cast("long"),
    ).otherwise(F.floor(vd * 1e9 + F.lit(0.5)).cast("long"))
    agg = (
        df.select(*group_cols, dt.alias("_dt"), contrib_ni.alias("_ni"))
        .filter(F.col("_dt").isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.sum("_dt").cast("long").alias("total_s"),
            F.sum("_ni").cast("long").alias("_num_ni"),
        )
    )
    return agg.filter(F.col("total_s") > 0).select(
        *group_cols,
        "total_s",
        F.round(F.col("_num_ni").cast("double") / 1e9 / F.col("total_s"), 6).alias(
            "twa"
        ),
    )


def lag_features(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    state_col: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-entity lag/delta feature builder — the sequence-model feature
    staple (churn models, session features, time-series windows): for
    each row, the previous event's state, the gap to it, the value
    delta, and the 1-based sequence index within the entity.

    ``ts_col`` must be NUMERIC epoch units (the ``time_weighted_avg``
    contract), so the gap is an exact integer difference.  First events
    carry NULL lags — the honest encoding (imputation is a modeling
    choice, not an engine one).

    Shape: ONE shuffle on the entity key feeds every output column (all
    four windows share the same partition/order spec, so Catalyst plans
    a single Sort + Window); per-group state is O(1).  Adds
    ``prev_state`` (when ``state_col`` given), ``gap_s``,
    ``value_delta`` (rounded 6), ``seq``.
    """
    tiebreak_cols = tiebreak_cols or []
    w = Window.partitionBy(entity_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    out = df
    if state_col is not None:
        out = out.withColumn("prev_state", F.lag(state_col).over(w))
    return (
        out.withColumn(
            "gap_s", (F.col(ts_col) - F.lag(ts_col).over(w)).cast("long")
        )
        .withColumn(
            "value_delta",
            F.round(F.col(value_col) - F.lag(value_col).over(w), 6),
        )
        .withColumn("seq", F.row_number().over(w))
    )


def transition_matrix(
    df: DataFrame,
    entity_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition estimates over per-entity event
    sequences: for every observed (state, next_state) pair, the count and
    the row-normalized probability P(next | current) — the funnel /
    navigation / session-flow model behind "where do users go after X?".

    One LEAD window on the entity key (the sessionize shuffle), then a
    map-side-combined count; the probability is one division from integer
    numerators.  State-vocabulary-sized output regardless of event count.

    Output: (state, next_state, n, n_from, p) rows.
    """
    tiebreak_cols = tiebreak_cols or []
    w = Window.partitionBy(entity_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    pairs = (
        df.select(
            F.col(state_col).alias("state"),
            F.lead(state_col).over(w).alias("next_state"),
        )
        .filter(F.col("next_state").isNotNull())
        .groupBy("state", "next_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from_tot = pairs.groupBy("state").agg(F.sum("n").cast("long").alias("n_from"))
    return pairs.join(F.broadcast(from_tot), "state").select(
        "state",
        "next_state",
        "n",
        "n_from",
        F.round(F.col("n").cast("double") / F.col("n_from"), 6).alias("p"),
    )


def decayed_counts(
    df: DataFrame,
    age_col: str,
    group_cols: list[str],
    half_life: float,
) -> DataFrame:
    """Exponentially time-decayed frequency per group: each row counts
    ``0.5^(age/half_life)`` — the recency-weighted popularity metric
    behind trending-item and decayed-heavy-hitter views, where yesterday
    counts half of today (at half_life=1) and history fades smoothly
    instead of falling off a window cliff.

    ``age_col`` is numeric age in the same units as ``half_life`` (derive
    age = max(ts) - ts once; the max is a broadcast scalar).  Per-row
    weights are a fixed pow() chain quantized to integer nanos, so the
    per-group sum is exact and order-free.  One map-side-combined
    aggregate — the decayed view costs the same as COUNT(*).

    Decayed counts are also mergeable ACROSS snapshot ages: a state
    taken at T decays to a state at T' by one multiply, which is why
    streaming systems keep this aggregate incrementally.
    """
    w_ni = F.floor(
        F.pow(F.lit(0.5), F.col(age_col).cast("double") / F.lit(half_life)) * 1e9
        + F.lit(0.5)
    ).cast("long")
    return (
        df.select(*group_cols, w_ni.alias("_w_ni"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.round(F.sum("_w_ni").cast("double") / 1e9, 6).alias("decayed_count"),
        )
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: float,
    suffix: str = "_asof",
) -> DataFrame:
    """:func:`asof_join` with a max-staleness bound (kdb/QuestDB
    ``ASOF ... TOLERANCE``, pandas ``merge_asof(tolerance=...)``): a match
    older than ``tolerance_seconds`` is treated as no match — the joined
    values come back NULL and ``staleness_s`` reports the age of the match
    that WAS taken (NULL when none qualified).

    Why it matters: an as-of feature join against a sensor/price stream
    silently serves arbitrarily stale values across gaps; the tolerance
    bound is what makes the feature NULL (imputable) instead of wrong.

    Same single-shuffle union+window plan as :func:`asof_join` — the bound
    is a post-fill map-side filter, not a second join.  Staleness is
    computed on integer epoch-microseconds so the cutoff is exact and
    engine-portable (no float truncation at sub-second resolution).
    """
    r2 = right.withColumn("_matched_ts", F.col(right_ts))
    out = asof_join(
        left, r2, on, left_ts, right_ts, value_cols + ["_matched_ts"], suffix=suffix
    )
    mts = F.col(f"_matched_ts{suffix}")
    age_us = F.unix_micros(F.col(left_ts).cast("timestamp")) - F.unix_micros(
        mts.cast("timestamp")
    )
    stale = mts.isNull() | (age_us > F.lit(int(round(tolerance_seconds * 1e6))))
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
        )
    out = out.withColumn(
        "staleness_s",
        F.when(stale, F.lit(None).cast("double")).otherwise(
            F.round(age_us.cast("double") / 1e6, 6)
        ),
    )
    return out.drop(f"_matched_ts{suffix}")


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str],
    bucket: str = "day",
    id_col: str | None = None,
) -> DataFrame:
    """Downsample a point series to OHLC bars (the hypertable/financial
    ``time_bucket`` first/last/min/max rollup): per (bucket, keys) emit
    open (value at earliest timestamp), high, low, close (value at latest
    timestamp), plus row count.

    ``open``/``close`` use ``min_by``/``max_by`` over a (ts, id) struct so
    ties at the same timestamp break deterministically under any
    partitioning.  One map-side-combinable aggregate — min_by/max_by
    partials merge like MIN/MAX, so 100 TB of ticks reduce per-partition
    before the single keyed shuffle (contrast the window-ranking
    formulation, which shuffles every row to sort whole groups).
    """
    order = (
        F.struct(F.col(ts_col), F.col(id_col))
        if id_col
        else F.struct(F.col(ts_col))
    )
    v = F.col(value_col).cast("double")
    return (
        df.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
            *key_cols,
        )
        .agg(
            F.round(F.min_by(v, order), 6).alias("open"),
            F.round(F.max(v), 6).alias("high"),
            F.round(F.min(v), 6).alias("low"),
            F.round(F.max_by(v, order), 6).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    group_cols: list[str],
    bucket_col: Column,
    metric: Column,
) -> DataFrame:
    """CUSUM change-point detection per group (Page 1954, the classic
    level-shift detector): bucket the series (e.g. daily counts), form the
    running sum of deviations from the group mean, and report the bucket
    where |CUSUM| peaks — the most likely shift point — plus its magnitude.

    Scale shape: the raw stream reduces to (group, bucket) rows in ONE
    map-side-combined aggregate; every window/argmax after that runs on
    the bucket-sized table (groups x buckets, thousands of rows per 100 TB
    of input).  The running sum is ordered by bucket, so float summation
    order is deterministic and the result replays bit-identically in any
    engine.
    """
    per_bucket = df.groupBy(
        *group_cols, bucket_col.alias("bucket")
    ).agg(F.sum(metric).cast("double").alias("x"))
    wg = Window.partitionBy(*group_cols)
    wrun = wg.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        per_bucket.withColumn("_mean", F.avg("x").over(wg))
        .withColumn("cusum", F.sum(F.col("x") - F.col("_mean")).over(wrun))
        .withColumn("_n_days", F.count(F.lit(1)).over(wg))
    )
    best = Window.partitionBy(*group_cols).orderBy(
        F.abs(F.col("cusum")).desc(), F.col("bucket").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select(
            *group_cols,
            F.col("bucket").alias("change_bucket"),
            F.round(F.col("cusum"), 6).alias("peak_cusum"),
            F.col("_n_days").alias("n_buckets"),
        )
    )


def path_ngrams(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    n: int = 3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Frequent n-step paths over per-entity event sequences (the
    MATCH_RECOGNIZE / funnel-discovery staple): order each entity's events
    by time, slide an n-gram window over the state sequence, and count
    every observed path corpus-wide.

    One shuffle on the entity key produces every n-gram via chained LEADs
    (no self-joins — the k-step path join formulation shuffles the fact
    table k times); the count aggregate is map-side combinable on the
    tiny path vocabulary.  Tie timestamps are broken by ``tiebreak_col``
    so the sequence — and therefore every n-gram — is deterministic under
    any partitioning.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(entity_col).orderBy(*order)
    keep = [entity_col, ts_col, state_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    steps = df.select(*keep)
    names = []
    for i in range(n):
        name = f"step{i + 1}"
        names.append(name)
        steps = steps.withColumn(
            name, F.lead(F.col(state_col), i).over(w) if i else F.col(state_col)
        )
    return (
        steps.dropna(subset=names)
        .groupBy(*names)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int,
) -> DataFrame:
    """Interval x interval overlap join for LARGE-both-sides inputs — the
    primitive behind incident attribution ("which sessions overlapped
    which outage windows").  A direct theta-join on the overlap predicate
    is a cartesian product; this is the standard binned reduction:

    1. explode each interval to the time bins it covers (``sequence`` of
       epoch-second bins, bin width = ``bin_seconds``);
    2. equi-join on the bin — shuffle cost is rows x bins-per-interval,
       never |L| x |R|;
    3. keep a pair only in the bin containing ``greatest(l_start,
       r_start)`` — every overlapping pair shares that bin, so each pair
       is emitted EXACTLY once with no DISTINCT re-shuffle;
    4. residual exact predicate ``l_start <= r_end AND r_start <= l_end``.

    Choose ``bin_seconds`` near the typical interval length: shorter bins
    multiply the explode factor, longer bins pack unrelated intervals
    into one bin (skew).  All comparisons run on integer epoch
    MICROseconds so sub-second boundaries resolve exactly (and replay
    exactly in any engine).
    """
    bin_us = int(bin_seconds) * 1_000_000

    def us(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    def bins(s: str, e: str) -> Column:
        return F.sequence(
            F.floor(us(s) / bin_us).cast("long"),
            F.floor(us(e) / bin_us).cast("long"),
        )

    lb = left.withColumn("_bin", F.explode(bins(l_start, l_end)))
    rb = right.withColumn("_bin", F.explode(bins(r_start, r_end)))
    anchor = F.floor(F.greatest(us(l_start), us(r_start)) / bin_us).cast("long")
    return (
        lb.join(rb, on="_bin")
        .filter(F.col("_bin") == anchor)
        .filter((us(l_start) <= us(r_end)) & (us(r_start) <= us(l_end)))
        .drop("_bin")
    )


def cross_correlation(
    series: DataFrame,
    order_col: str,
    x: Column,
    y: Column,
    max_lag: int = 3,
    exact_counts: bool = False,
) -> DataFrame:
    """Lead-lag cross-correlation function (CCF) between two aligned
    series: corr(x_t, y_{t-k}) for k = 0..max_lag -- "do errors predict
    purchases two days later?".  The input is an already-bucketed series
    (one row per ``order_col`` tick), so the window ordering runs on the
    bucket-sized table, never raw rows: callers aggregate first (the
    daily rollup is a map-side-combined count) and correlate second.

    All lags come from ONE ordered window (chained LAGs) and ONE
    aggregate of corr moment sums; output is long-form (lag, ccf, n).

    ``exact_counts=True``: when x and y are integer-valued (event counts),
    compute the per-lag Pearson r from EXACT integer moment sums
    (DECIMAL(38,0)) with one final fixed-order double expression instead
    of the builtin corr, whose running-mean co-moment accumulation is
    partition-order-dependent and can flip a 6-dp round between engines
    (the llm_heaps_law r10 flake class)."""
    w = Window.orderBy(F.col(order_col).asc())
    cur = series.select(order_col, x.alias("_x"), y.alias("_y"))
    for k in range(1, max_lag + 1):
        cur = cur.withColumn(f"_y{k}", F.lag(F.col("_y"), k).over(w))

    def ycol(k: int) -> Column:
        return F.col("_y" if k == 0 else f"_y{k}")

    if not exact_counts:
        wide = cur.agg(
            *[
                F.round(F.corr(F.col("_x"), ycol(k)), 6).alias(f"c{k}")
                for k in range(max_lag + 1)
            ],
            *[
                F.count(ycol(k)).cast("long").alias(f"n{k}")
                for k in range(max_lag + 1)
            ],
        )
        structs = F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"),
                    F.col(f"c{k}").alias("ccf"),
                    F.col(f"n{k}").alias("n"),
                )
                for k in range(max_lag + 1)
            ]
        )
        return wide.select(F.explode(structs).alias("p")).select("p.*")

    dec = "decimal(38,0)"
    aggs = []
    for k in range(max_lag + 1):
        both = F.col("_x").isNotNull() & ycol(k).isNotNull()
        xi = F.when(both, F.col("_x").cast("long"))
        yi = F.when(both, ycol(k).cast("long"))
        aggs += [
            F.count(yi).cast("long").alias(f"n{k}"),
            F.coalesce(F.sum(xi.cast(dec)), F.lit(0).cast(dec)).alias(f"sx{k}"),
            F.coalesce(F.sum(yi.cast(dec)), F.lit(0).cast(dec)).alias(f"sy{k}"),
            F.coalesce(F.sum((xi * xi).cast(dec)), F.lit(0).cast(dec)).alias(f"sxx{k}"),
            F.coalesce(F.sum((yi * yi).cast(dec)), F.lit(0).cast(dec)).alias(f"syy{k}"),
            F.coalesce(F.sum((xi * yi).cast(dec)), F.lit(0).cast(dec)).alias(f"sxy{k}"),
        ]
    wide = cur.agg(*aggs)

    def _r(k: int) -> Column:
        n = F.col(f"n{k}").cast(dec)
        num = n * F.col(f"sxy{k}") - F.col(f"sx{k}") * F.col(f"sy{k}")
        dx = n * F.col(f"sxx{k}") - F.col(f"sx{k}") * F.col(f"sx{k}")
        dy = n * F.col(f"syy{k}") - F.col(f"sy{k}") * F.col(f"sy{k}")
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
                F.lit(k).alias("lag"),
                _r(k).alias("ccf"),
                F.col(f"n{k}").alias("n"),
            )
            for k in range(max_lag + 1)
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select("p.*")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest-neighbour as-of join (pandas ``merge_asof(direction=
    'nearest')``): each left row takes the right row with the SMALLEST
    absolute time distance per key, earlier match winning exact-distance
    ties (pandas' backward preference).  ``asof_join`` covers
    at-or-before; sensor alignment and price marking often want the
    closest reading on either side instead.

    Same single-shuffle union pattern, run in both directions inside ONE
    keyed exchange: the ascending window carries the latest at-or-before
    (value, ts), the descending window the earliest at-or-after, and a
    map-side integer-microsecond comparison picks the closer.  No range
    explosion, no per-row lookups, and Catalyst reuses one Exchange for
    both window specs (same partition keys).
    """
    vt = dict(right.dtypes)[value_col]
    lt = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_ts", F.col(left_ts))
        .withColumn("_v", F.lit(None).cast(vt))
    )
    rt = right.select(
        *on,
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        F.col(value_col).alias("_v"),
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    merged = lt.select(rt.columns).unionByName(rt)

    frame = (Window.unboundedPreceding, Window.currentRow)
    # right rows sort before left rows at equal _ts in BOTH directions, so
    # a left row at t sees a right row at exactly t from either side
    w_b = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(*frame)
    )
    w_f = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").desc(), F.col("_side").asc())
        .rowsBetween(*frame)
    )
    rv = F.when(F.col("_side") == 0, F.col("_v"))
    rts = F.when(F.col("_side") == 0, F.col("_ts"))
    filled = merged.select(
        "*",
        F.last(rv, ignorenulls=True).over(w_b).alias("_bv"),
        F.last(rts, ignorenulls=True).over(w_b).alias("_bts"),
        F.last(rv, ignorenulls=True).over(w_f).alias("_fv"),
        F.last(rts, ignorenulls=True).over(w_f).alias("_fts"),
    ).filter(F.col("_side") == 1)

    t = F.unix_micros(F.col("_ts").cast("timestamp"))
    db = t - F.unix_micros(F.col("_bts").cast("timestamp"))
    df_ = F.unix_micros(F.col("_fts").cast("timestamp")) - t
    take_b = F.col("_fts").isNull() | (F.col("_bts").isNotNull() & (db <= df_))
    out = filled.withColumn(
        f"{value_col}{suffix}", F.when(take_b, F.col("_bv")).otherwise(F.col("_fv"))
    ).withColumn(
        "nearest_distance_s",
        F.round(
            F.when(take_b, db.cast("double") / 1e6).otherwise(
                df_.cast("double") / 1e6
            ),
            6,
        ),
    )
    return out.drop("_side", "_ts", "_v", "_bv", "_bts", "_fv", "_fts")


def theil_sen_trend(
    series: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Theil-Sen robust trend per group: the MEDIAN of all pairwise
    slopes (y_j - y_i) / (x_j - x_i), i < j -- breakdown point 29%, so a
    burst of outlier days cannot drag the trend the way OLS's mean-based
    slope can (the robust companion of ``group_regression``).

    The pairwise self-join is quadratic IN THE BUCKET COUNT, not the row
    count: callers aggregate raw rows to buckets first (a daily series is
    ~30 rows per group -> ~435 slope pairs), so the exact all-pairs
    median is bucket-table work no matter how many raw events feed it.
    Slopes are exact ratios of integral deltas when x and y are integral
    (counts over day numbers), so the interpolated median replays
    bit-identically.
    """
    a = series.select(
        *group_cols, x.cast("double").alias("_x"), y.cast("double").alias("_y")
    )
    b = a.select(
        *group_cols, F.col("_x").alias("_x2"), F.col("_y").alias("_y2")
    )
    pairs = a.join(b, on=group_cols).filter(F.col("_x2") > F.col("_x"))
    slopes = pairs.select(
        *group_cols,
        ((F.col("_y2") - F.col("_y")) / (F.col("_x2") - F.col("_x"))).alias("_s"),
    )
    return slopes.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(_s, 0.5)"), 6).alias("theil_sen_slope"),
    )


def interval_coverage(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union length of possibly-overlapping intervals per key — the
    uptime / SLA-coverage / "distinct seconds of activity" rollup
    (TimescaleDB's ``interval coverage``, PostgreSQL range aggregation).

    Shape: ONE window per key partition, ordered by (start, end): each
    row's contribution to the union is
    ``max(0, end - max(start, running_max_prior_end))`` — rows swallowed
    by an earlier interval add 0, rows starting a new island add their
    full span, overlaps add only the uncovered suffix.  A keyed
    aggregate then sums contributions and counts islands (rows whose
    start clears every prior end).  No self-join, no interval explosion:
    sort-within-partition + one shuffle on the key, so 100 TB of
    intervals cost one keyed sort each.

    Arithmetic on integer epoch-microseconds (exact, engine-portable);
    output seconds rounded to 6 dp.

    Output: key_cols + (n_intervals, n_islands, covered_s).
    """
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    base = df.select(*key_cols, s_us.alias("_s"), e_us.alias("_e"))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_end = F.max("_e").over(w)
    contrib = F.greatest(
        F.lit(0).cast("long"),
        F.col("_e") - F.greatest(F.col("_s"), F.coalesce(prior_end, F.col("_s"))),
    )
    new_island = F.when(
        prior_end.isNull() | (F.col("_s") > prior_end), F.lit(1)
    ).otherwise(F.lit(0))
    rows = base.select(
        *key_cols, contrib.alias("_c"), new_island.alias("_ni")
    )
    return rows.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("_ni").cast("long").alias("n_islands"),
        F.round(F.sum("_c").cast("double") / 1e6, 6).alias("covered_s"),
    )


def last_touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    on: list[str],
    conv_ts: str,
    touch_ts: str,
    channel_col: str,
    value_col: str,
    window_seconds: float,
    unattributed: str = "(none)",
) -> DataFrame:
    """Last-touch conversion attribution: each conversion is credited to
    the MOST RECENT prior touch (ad click, visit, campaign email) of the
    same key within an attribution window; conversions with no qualifying
    touch land in an explicit ``unattributed`` bucket so totals reconcile
    against the raw conversion count.

    Shape: the tolerance as-of join (one keyed shuffle, union + window
    fill — no range explosion) followed by a channel rollup.  The classic
    marketing/growth analytics query, and the same plan serves model-
    training feature attribution (label event ← latest preceding
    treatment).

    Output: (channel, n_conversions, revenue) with revenue summed from
    ``value_col`` on the conversion side, rounded to 2 dp.
    """
    # Same-timestamp touches would make the as-of fill order-dependent
    # (which channel wins varies with partitioning): collapse them to
    # one row per (key, ts) with a deterministic MAX(channel) winner —
    # the rule the oracle and the streaming form replay.
    t = touches.groupBy(*on, touch_ts).agg(
        F.max(F.col(channel_col)).alias("_channel")
    )
    out = asof_join_tolerance(
        conversions,
        t,
        on,
        conv_ts,
        touch_ts,
        ["_channel"],
        tolerance_seconds=window_seconds,
    )
    return (
        out.select(
            F.coalesce(F.col("_channel_asof"), F.lit(unattributed)).alias("channel"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.round(F.sum("_v"), 2).alias("revenue"),
        )
    )
