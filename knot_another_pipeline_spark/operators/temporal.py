"""Temporal join operators Spark lacks as built-ins: as-of join, interval
range join, and trailing rolling-window features.

The reference only ever gets temporal alignment through coarse time
bucketing — the co-location join equi-joins on hour windows
(``/root/reference/sql/gold/create_pairs_daily.sql:40-54``) and the
track apps sort per-track frames in pandas on one node
(``/root/reference/apps/track_explorer.py:56-78``); nearest-prior
alignment, interval containment, and trailing-window features have no
distributed form there. Here each is a first-class operator with the
classic scale-safe plan:

- ``asof_join`` — the union-window trick: tag probe and quote rows,
  union, one window over (keys, ts) carrying the latest quote payload
  forward. ONE shuffle on the join keys, no row explosion, no
  inequality-join fallback to broadcast-nested-loop. This is how you do
  ``merge_asof`` on 100 TB.
- ``range_join`` — points-in-intervals with time-bucket blocking:
  intervals explode to the fixed-width buckets they cover, points map to
  exactly one bucket, so the join is a plain equi-join on
  (keys, bucket) with the BETWEEN kept as an in-join filter. Each
  (point, interval) match is produced exactly once — a point joins an
  interval only in the point's own bucket.
- ``rolling_stats`` — trailing time-window aggregates as a native
  ``rangeBetween`` window over epoch micros: one shuffle per key, no
  self-join, whole-stage codegen throughout.
- ``scd2_history`` — change log → type-2 dimension (validity intervals,
  consecutive duplicates collapsed) with all windows sharing one
  key-shuffle.
- ``interval_merge`` — gaps-and-islands coalesce of overlapping
  intervals per key; running-max island numbering, never a self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "acf",
    "asof_join",
    "changepoint_detect",
    "control_chart",
    "cusum_alarm",
    "decayed_agg",
    "dickey_fuller",
    "engle_granger",
    "ewma_smooth",
    "gumbel_maxima",
    "holt_forecast",
    "hurst_exponent",
    "interval_merge",
    "lag_correlation",
    "ljung_box",
    "mann_kendall",
    "max_concurrency",
    "page_hinkley",
    "peak_detection",
    "period_over_period",
    "periodogram",
    "range_join",
    "resample_calendar",
    "rolling_stats",
    "runs_test",
    "scd2_as_of",
    "scd2_history",
    "scd2_lookup",
    "seasonal_decompose",
    "seasonal_naive_error",
    "seasonal_strength",
    "spectral_entropy",
    "theil_sen",
    "time_weighted_avg",
    "trend_fit",
]


def _epoch_micros(col: str) -> Column:
    # unix_micros only accepts TIMESTAMP; parquet written without a
    # timezone surfaces TIMESTAMP_NTZ, so cast first. The NTZ cast
    # interprets wall-clock in the SESSION timezone: under UTC (which
    # the engine's session factory and tune_session both pin) the
    # offset is a constant that cancels in every difference these
    # operators take. A DST-observing session timezone would bend gaps
    # across transitions — keep the session UTC (data_contracts: all
    # reference timestamps are UTC).
    return F.unix_micros(F.col(col).cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
    how: str = "left",
    right_tiebreak: str | None = None,
    matched_ts_col: str = "asof_ts",
) -> DataFrame:
    """As-of join: for every left (probe) row, attach the payload of the
    single nearest right (quote) row at-or-before its timestamp
    (``direction='backward'``; ``'forward'`` matches at-or-after).

    Pandas calls this ``merge_asof``; DuckDB calls it ``ASOF JOIN``;
    Spark has no built-in. A naive translation —
    ``left JOIN right ON keys AND r.ts <= l.ts`` + window max — explodes
    to every historical quote per probe before pruning. This
    implementation is the scalable union-window form:

    1. Union probe and quote rows on (keys, event time), quotes tagged 0
       and probes 1 so a quote at the *same* timestamp sorts before the
       probe that should see it.
    2. One window per key, ordered by (ts, tag[, tiebreak]), carries the
       last non-null quote payload (a single struct — row-level
       semantics, so NULL fields inside a quote don't fall through to an
       older quote) up to each probe row.
    3. Probes are filtered back out; ``tolerance_seconds`` nulls matches
       older (newer, for forward) than the bound, and ``how='inner'``
       drops unmatched probes.

    Cost: ONE hash shuffle on ``on`` + a sort within partitions — the
    same price as the groupBy the caller was already going to do. Skew
    note: one window partition per key; a single pathologically hot key
    serializes on one task (same as any per-key window — pre-split such
    keys upstream if they exist).

    Ties: multiple quotes with identical (key, ts) are ordered by
    ``right_tiebreak`` — the largest wins for integral columns; a
    non-integral tiebreak is ordered by its xxhash64 (deterministic
    across runs, but not the column's natural order — pre-map string
    ids to a bigint if "largest id wins" must be literal). Without a
    tiebreak the winner is partition-order-dependent — pass one (or
    pre-dedupe quotes) whenever quote timestamps can collide and
    determinism matters.

    Output: all left columns, the selected ``right_cols`` (default:
    every right column except keys and timestamp), and the matched
    quote's timestamp as ``matched_ts_col``. Right columns must not
    collide with left's — rename before joining.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    rcols = (
        list(right_cols)
        if right_cols is not None
        else [c for c in right.columns if c not in (*keys, rts)]
    )
    collisions = (set(rcols) | {matched_ts_col}) & set(left.columns)
    collisions |= {matched_ts_col} & set(rcols)
    if collisions:
        raise ValueError(
            f"output columns collide with left/right: {sorted(collisions)}; "
            "rename them (or pick another matched_ts_col) first"
        )
    lcols = [c for c in left.columns if c not in keys]

    quote_pay = F.struct(
        *[F.col(c) for c in rcols], F.col(rts).alias("_matched_ts")
    )
    rpay_type = right.select(quote_pay.alias("_p")).schema["_p"].dataType
    lpay_type = (
        left.select(F.struct(*[F.col(c) for c in lcols]).alias("_p"))
        .schema["_p"]
        .dataType
    )
    probe = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_probe"),
        F.lit(0).cast("long").alias("_tb"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lpay"),
        F.lit(None).cast(rpay_type).alias("_rpay"),
    )
    # SQL join semantics: a NULL key or NULL timestamp never matches.
    # The window would otherwise happily group NULL keys together, so
    # quotes with any NULL key/ts are dropped up front (probes keep
    # their row — they just match nothing, see below).
    quote_valid = F.col(rts).isNotNull()
    for k in keys:
        quote_valid = quote_valid & F.col(k).isNotNull()
    if right_tiebreak:
        tb_type = dict(right.dtypes).get(right_tiebreak, "")
        if tb_type in ("tinyint", "smallint", "int", "bigint"):
            tb_expr = F.col(right_tiebreak).cast("long")
        else:
            # cast('long') on a string id would silently become NULL for
            # every row, restoring the nondeterminism the parameter
            # exists to eliminate — hash instead (deterministic order).
            tb_expr = F.xxhash64(F.col(right_tiebreak))
    else:
        tb_expr = F.lit(0).cast("long")
    quote = right.filter(quote_valid).select(
        *keys,
        F.col(rts).alias("_ats"),
        F.lit(0).alias("_probe"),
        tb_expr.alias("_tb"),
        F.lit(None).cast(lpay_type).alias("_lpay"),
        quote_pay.alias("_rpay"),
    )
    ts_order = (
        F.col("_ats").asc() if direction == "backward" else F.col("_ats").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_probe").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    probe_key_valid = F.col("_ats").isNotNull()
    for k in keys:
        probe_key_valid = probe_key_valid & F.col(k).isNotNull()
    matched = (
        probe.unionByName(quote)
        .withColumn(
            "_m",
            # NULL-key/ts probes keep their row but match nothing
            F.when(
                probe_key_valid, F.last("_rpay", ignorenulls=True).over(w)
            ),
        )
        .filter(F.col("_probe") == 1)
    )
    if tolerance_seconds is not None:
        tol = F.lit(int(tolerance_seconds) * 1_000_000)
        probe_us = F.unix_micros(F.col("_ats").cast("timestamp"))
        match_us = F.unix_micros(F.col("_m._matched_ts").cast("timestamp"))
        in_tol = (
            match_us >= probe_us - tol
            if direction == "backward"
            else match_us <= probe_us + tol
        )
        matched = matched.withColumn("_m", F.when(in_tol, F.col("_m")))
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    return matched.select(
        *keys,
        F.col("_ats").alias(left_ts),
        *[F.col(f"_lpay.{c}").alias(c) for c in lcols if c != left_ts],
        *[F.col(f"_m.{c}").alias(c) for c in rcols],
        F.col("_m._matched_ts").alias(matched_ts_col),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    inclusive_end: bool = True,
) -> DataFrame:
    """Interval (range) join: match each point row to every interval row
    of the same key whose ``[start, end]`` contains the point's
    timestamp.

    Spark compiles a raw ``ts BETWEEN start AND end`` join predicate to
    a broadcast-nested-loop / cartesian plan — quadratic and undistrib-
    utable. The scale shape is time-bucket blocking: each interval
    explodes to the fixed-width buckets it covers, each point maps to
    exactly ONE bucket, and the join becomes an equi-join on
    (keys, bucket) with BETWEEN as an in-join filter. Because a point
    lives in exactly one bucket, every true (point, interval) match is
    emitted exactly once — no post-join dedupe.

    ``bucket_seconds`` is the replication dial: an interval produces
    ``ceil(span / bucket)`` rows, so set it near the typical interval
    span (default 1 h). Too small → interval blow-up; too large → each
    bucket pairs points with intervals they'll fail the BETWEEN on.
    Intervals with ``end < start`` are dropped (Spark's ``sequence``
    would otherwise count *backwards* and silently fabricate buckets).

    Inner join only: points outside every interval are dropped. Interval
    and point columns must be disjoint apart from the keys.
    """
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"point/interval columns collide: {sorted(overlap)}; rename first"
        )
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    b = int(bucket_seconds) * 1_000_000
    p = points.withColumn("_bkt", _epoch_micros(point_ts) - _epoch_micros(point_ts) % b)
    iv = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    _epoch_micros(start_col) - _epoch_micros(start_col) % b,
                    _epoch_micros(end_col) - _epoch_micros(end_col) % b,
                    F.lit(b),
                )
            ),
        )
    )
    end_ok = (
        F.col(point_ts) <= F.col(end_col)
        if inclusive_end
        else F.col(point_ts) < F.col(end_col)
    )
    return (
        p.join(iv, [*keys, "_bkt"])
        .filter((F.col(point_ts) >= F.col(start_col)) & end_ok)
        .drop("_bkt")
    )


def rolling_stats(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    round_to: int = 6,
) -> DataFrame:
    """Trailing time-window features per key: for every row, the count /
    sum / mean / max of ``value_col`` over ``[ts - window, ts]`` of the
    same key — the standard per-entity activity features (requests in
    the last hour, tokens in the last day, ...).

    Implemented as a native ``rangeBetween`` window over epoch micros:
    one shuffle on the key, sorted scan within each partition, all
    whole-stage-codegen — never a self-join (the naive
    ``t1 JOIN t2 ON key AND t2.ts BETWEEN t1.ts - w AND t1.ts`` is
    quadratic in per-key density). Rows sharing an identical timestamp
    are RANGE peers: each sees the other's contribution, matching SQL
    ``RANGE BETWEEN ... PRECEDING AND CURRENT ROW`` in any engine.

    Float sums/means are rounded to ``round_to`` so results are
    cross-engine reproducible.
    """
    if window_seconds < 1:
        raise ValueError(f"window_seconds must be >= 1, got {window_seconds}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(_epoch_micros(ts_col))
        .rangeBetween(-int(window_seconds) * 1_000_000, Window.currentRow)
    )
    v = F.col(value_col)
    return (
        df.withColumn("n_window", F.count(v).over(w).cast("bigint"))
        .withColumn("sum_window", F.round(F.sum(v).over(w), round_to))
        .withColumn("avg_window", F.round(F.avg(v).over(w), round_to))
        .withColumn("max_window", F.max(v).over(w))
    )


def scd2_history(
    df: DataFrame,
    keys: str | list[str],
    *,
    ts_col: str,
    attr_cols: list[str],
    end_of_time: str | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: one validity interval per (key, attribute-state) run, with
    ``valid_from`` / ``valid_to`` / ``is_current`` — the warehouse shape
    for "what did this entity look like on date X" queries that the
    reference answers today by re-scanning raw events
    (``pipelines/refresh_gold_tables.py`` rebuilds whole tables; an SCD2
    dimension answers them with one range predicate).

    Semantics: rows are ordered by ``ts_col`` within each key; a new
    version opens whenever any of ``attr_cols`` differs from the
    previous row's values (NULL-safe comparison — NULL→NULL is NOT a
    change). Consecutive duplicates collapse into one interval, so
    replayed/no-op change events never fork versions. ``valid_to`` is
    the next version's ``valid_from`` (half-open intervals, the join
    convention range_join uses) and NULL — or ``end_of_time`` if given —
    for the current version; ``is_current`` flags it.

    Plan: two windows over ONE shuffle on the key (lag comparison to
    flag version starts, then a running sum to number versions) plus the
    groupBy on (key, version) — Catalyst reuses the same hash
    partitioning for all three, so the whole operator costs a single
    exchange. No self-joins, no collect.

    Ties: rows with identical (key, ts) are ordered by the attribute
    values themselves (deterministic; last state wins at equal
    timestamps only by attribute order, so pre-dedupe equal-ts rows if
    the log can contain them).
    Output: keys, valid_from, valid_to, is_current, attr_cols.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not attr_cols:
        raise ValueError("attr_cols must name at least one tracked column")
    order = [F.col(ts_col).asc(), *[F.col(c).asc_nulls_first() for c in attr_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    # first row per key: lag(ts) is NULL -> always opens version 0
    is_start = F.lag(F.col(ts_col)).over(w).isNull() | changed
    versioned = df.select(*keys, ts_col, *attr_cols).withColumn(
        "_ver",
        F.sum(is_start.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_ver = versioned.groupBy(*keys, "_ver").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.first(c).alias(c) for c in attr_cols],
    )
    w_next = Window.partitionBy(*keys).orderBy(F.col("_ver").asc())
    out = per_ver.withColumn(
        "valid_to", F.lead("valid_from").over(w_next)
    ).withColumn("is_current", F.col("valid_to").isNull())
    if end_of_time is not None:
        out = out.withColumn(
            "valid_to",
            F.coalesce(F.col("valid_to"), F.lit(end_of_time).cast("timestamp")),
        )
    return out.select(*keys, "valid_from", "valid_to", "is_current", *attr_cols)


def interval_merge(
    df: DataFrame,
    keys: str | list[str],
    *,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    min_gap_seconds: int = 0,
) -> DataFrame:
    """Merge overlapping (and near-adjacent, within ``min_gap_seconds``)
    intervals per key into maximal disjoint islands — the
    gaps-and-islands coalesce behind session stitching, maintenance
    windows, and track-segment consolidation (the reference's
    co-location analysis reasons about hour-bucket overlap windows;
    this is the general interval form).

    Classic two-window island numbering, one shuffle total: order
    intervals by (start, end) within each key, compute the running
    maximum of ``end`` over all PRIOR rows, flag an island start where
    the current start exceeds that running max (+ gap), then a running
    sum of flags numbers the islands and one groupBy(key, island)
    collapses them. All three passes share the same hash partitioning
    on the key — Catalyst plans a single exchange — and nothing is
    quadratic in per-key interval count (the naive approach self-joins
    overlap candidates).

    Zero-length and NULL-bounded intervals: rows with NULL start or end
    are dropped (an unbounded interval has no merge semantics here);
    ``end < start`` raises no error but never extends an island.
    Output: keys, island start/end, n_intervals merged into each.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if min_gap_seconds < 0:
        raise ValueError(f"min_gap_seconds must be >= 0, got {min_gap_seconds}")
    s = df.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(_epoch_micros(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    gap_us = F.lit(int(min_gap_seconds) * 1_000_000)
    is_new = (
        prev_max_end.isNull()
        | (_epoch_micros(start_col) > prev_max_end + gap_us)
    )
    islands = s.withColumn(
        "_island",
        F.sum(is_new.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy(*keys, "_island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        )
        .drop("_island")
    )


def period_over_period(
    df: DataFrame,
    period_col: str,
    value_cols: str | list[str],
    *,
    partition_cols: str | list[str] | None = None,
    lag_periods: int = 1,
    round_pct: int = 6,
) -> DataFrame:
    """Period-over-period deltas: for each value column add the previous
    period's value, the absolute delta, and the percent change.

    The reference reports monthly aggregates but leaves "vs last month"
    to the reader (``apps/stat_explorer.py`` renders one period at a
    time). Here it is one ``lag`` window per input row — a single
    shuffle on the partition keys (none ⇒ single ordered partition, fine
    because the input is one row per period, i.e. already aggregated;
    don't call this on raw events). Percent change is NULL when the
    prior value is 0 or NULL (``NULLIF`` semantics, no ±inf).
    """
    values = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    parts = (
        []
        if partition_cols is None
        else [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    w = Window.partitionBy(*parts).orderBy(period_col)
    out = df
    for v in values:
        prev = F.lag(v, lag_periods).over(w)
        out = (
            out.withColumn(f"prev_{v}", prev)
            .withColumn(f"delta_{v}", F.col(v) - F.col(f"prev_{v}"))
            .withColumn(
                f"pct_change_{v}",
                F.round(
                    (F.col(v) - F.col(f"prev_{v}"))
                    / F.nullif(F.col(f"prev_{v}"), F.lit(0)),
                    round_pct,
                ),
            )
        )
    return out


def resample_calendar(
    df: DataFrame,
    ts_col: str,
    *,
    group_cols: str | list[str] | None = None,
    aggs: dict[str, Column] | None = None,
    step: str = "1 day",
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Calendar resample with gap filling: aggregate to fixed ``step``
    buckets, then emit a row for EVERY bucket in the observed span of
    each group — absent buckets appear with the ``fill`` defaults
    (e.g. ``{"n": 0}``) instead of silently missing.

    Downstream consumers (drift monitors, rate alerts) read a missing
    day as "no data", not "zero events" — gap filling makes the
    distinction explicit. Scale shape: one aggregate on
    (group, bucket), then per-group min/max and ONE
    ``sequence()``+``explode`` to build the calendar spine —
    sequence is row-local generation, so the spine costs
    span/step rows per group, never a driver-side date loop. The
    spine→agg join is on (group, bucket); AQE broadcasts the small
    side at low SF and shuffles at high SF.
    """
    groups = (
        []
        if group_cols is None
        else [group_cols]
        if isinstance(group_cols, str)
        else list(group_cols)
    )
    aggs = aggs or {"n_rows": F.count(F.lit(1))}
    bucket = F.date_trunc(
        {"1 day": "day", "1 hour": "hour", "1 week": "week"}.get(step, "day"),
        F.col(ts_col).cast("timestamp"),
    )
    per_bucket = (
        df.withColumn("_bucket", bucket)
        .groupBy(*groups, "_bucket")
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    spine = (
        per_bucket.groupBy(*groups)
        .agg(F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi"))
        .select(
            *groups,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
            ).alias("_bucket"),
        )
    )
    out = spine.join(per_bucket, groups + ["_bucket"], "left")
    for name, default in (fill or {}).items():
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
    return out.withColumnRenamed("_bucket", "bucket")


def decayed_agg(
    df: DataFrame,
    *,
    group_cols: str | list[str],
    ts_col: str,
    ref_ts: str,
    half_life: str = "7 days",
    value_col: str | None = None,
) -> DataFrame:
    """Exponential time-decay aggregation: per group, the half-life-
    weighted event count (and optionally value sum) as of ``ref_ts`` —
    the standard recency feature behind engagement scores, trending
    rankers, and freshness-weighted sampling weights.

    Each row contributes ``0.5 ** (age / half_life)`` where ``age`` is
    ``ref_ts - ts`` in seconds; a row exactly one half-life old counts
    as 0.5 events. Rows AFTER ``ref_ts`` are excluded (a decayed
    aggregate "as of T" must not see the future — replaying the same
    operator at historical cut points yields point-in-time-correct
    features for backtesting).

    Scale shape: the weight is a pure codegen expression evaluated in
    the scan (pow over an epoch difference — no UDF, no window), so the
    whole operator is filter → one partial+final hash aggregate: the
    single shuffle carries one row per (group, partial) and map-side
    combine absorbs the per-row weights. This is the one-pass
    alternative to "recompute a windowed count per day" — at 100 TB you
    run it once per snapshot date rather than materializing per-day
    windows.

    Output: group cols, ``decayed_count`` (round 6), ``n_rows``, and
    ``decayed_sum`` (round 4) when ``value_col`` is given.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    qty, unit = half_life.split()
    seconds = float(qty) * {
        "second": 1.0, "seconds": 1.0,
        "minute": 60.0, "minutes": 60.0,
        "hour": 3600.0, "hours": 3600.0,
        "day": 86400.0, "days": 86400.0,
    }[unit.lower()]
    age = (
        F.lit(ref_ts).cast("timestamp").cast("double")
        - F.col(ts_col).cast("timestamp").cast("double")
    )
    w = F.pow(F.lit(0.5), age / F.lit(seconds))
    aggs = [
        F.round(F.sum(w), 6).alias("decayed_count"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(w * F.col(value_col)), 4).alias("decayed_sum")
        )
    return (
        df.filter(
            F.col(ts_col).cast("timestamp")
            <= F.lit(ref_ts).cast("timestamp")
        )
        .groupBy(*groups)
        .agg(*aggs)
    )


_BUCKET_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


def time_weighted_avg(
    df: DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    max_hold: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average per (entity, calendar bucket) over an
    irregular observation stream — the honest mean for sensor readings,
    prices, or state levels, where the plain ``avg`` over-weights
    chatty periods (a value that HELD for 59 minutes must count 59×
    the one that held for one).

    Semantics: each observation holds from its timestamp until the
    entity's next observation (exclusive); the final observation
    contributes nothing (its holding time is unknown — emit a closing
    reading upstream if the tail matters). ``max_hold`` (e.g.
    ``'2 hours'``) caps a stale reading's influence: a silent sensor
    stops accruing after the cap instead of dominating every bucket
    until it next reports.

    Scale shape: ONE window (lead over the entity key) establishes the
    holding interval; the interval then row-locally explodes into the
    calendar buckets it spans (``sequence`` of bucket starts — fanout =
    buckets spanned, which ``max_hold`` bounds) and clips to each; one
    hash aggregate on (entity, bucket) finishes. The classic
    interval-split-to-buckets shape — billing proration and occupancy
    use the same plan. No self-joins, no spine table.

    Output: entity, bucket_ts, twa (round 6), covered_s (seconds of
    the bucket actually covered, round 6).
    """
    if bucket not in _BUCKET_SECONDS:
        raise KeyError(
            f"bucket must be one of {sorted(_BUCKET_SECONDS)}, got {bucket!r}"
        )
    step = _BUCKET_SECONDS[bucket]
    order = [F.col("_ts").asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy("_e").orderBy(*order)
    s = df.select(
        F.col(entity_col).alias("_e"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
        *([F.col(tiebreak_col)] if tiebreak_col is not None else []),
    ).withColumn("_next", F.lead("_ts").over(w))
    if max_hold is not None:
        # guard the NULL: least() IGNORES nulls, so an unguarded cap
        # would resurrect each entity's final observation (whose _next
        # is NULL = "holding time unknown") as a max_hold-long interval
        # — the documented semantics drop it instead
        s = s.withColumn(
            "_next",
            F.when(
                F.col("_next").isNotNull(),
                F.least(
                    F.col("_next"), F.expr(f"_ts + interval {max_hold}")
                ),
            ),
        )
    s = s.filter(F.col("_next") > F.col("_ts"))
    b0 = F.date_trunc(bucket, F.col("_ts"))
    b_last = F.date_trunc(
        bucket, F.col("_next") - F.expr("interval 1 microsecond")
    )
    spanned = s.select(
        "_e",
        "_ts",
        "_next",
        "_v",
        F.explode(
            F.sequence(b0, b_last, F.expr(f"interval {step} seconds"))
        ).alias("_b"),
    )
    seg_start = F.greatest(F.col("_ts"), F.col("_b"))
    seg_end = F.least(
        F.col("_next"), F.col("_b") + F.expr(f"interval {step} seconds")
    )
    dur = (F.unix_micros(seg_end) - F.unix_micros(seg_start)) / F.lit(1e6)
    return (
        spanned.withColumn("_dur", dur)
        .groupBy(F.col("_e").alias(entity_col), F.col("_b").alias("bucket_ts"))
        .agg(
            F.round(F.sum(F.col("_v") * F.col("_dur")) / F.sum("_dur"), 6)
            .alias("twa"),
            F.round(F.sum("_dur"), 6).alias("covered_s"),
        )
    )


def ewma_smooth(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    alpha: float = 0.3,
    k: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """EWMA control chart over per-series observations: exponentially
    weighted moving average (``ewma_t = α·x_t + (1−α)·ewma_{t−1}``,
    seeded at the first value), the residual of each observation
    against the PRIOR smoothed level, and an alarm when the residual
    exceeds ``k`` residual standard deviations — the classic
    drift/spike monitor for daily pipeline metrics (row counts, null
    rates, latencies), where a z-score on raw values would page on
    seasonality the EWMA has already absorbed.

    The recurrence is computed CLOSED-FORM, not iteratively:
    ``ewma_t = β^t · cumsum_t`` where ``β = 1−α`` and the cumulative
    sum runs over ``x_0, α·x_i·β^{−i}`` — one ordered window per
    series, no driver loop, no state store. The oracle mirrors the
    identical cumsum, so the float rounding agrees. ``β^{−i}`` grows
    geometrically: at α=0.3 the factors pass 10⁹ near i≈60, so cap
    series length ≈ 50·(1/α) rows and re-anchor longer histories per
    period (control charts reset on re-baseline anyway); an IN-PLAN
    guard (``raise_error`` folded into the term expression, zero
    extra scans, lazy like every other operator here) fails the job
    beyond that bound rather than returning quietly-degraded floats.

    ``tiebreak_col`` (a unique row id) makes the within-series order
    total — pass it whenever ``order_col`` can repeat (duplicate
    loads, sub-period observations under a coarse key); with ties and
    no tiebreak, t/ewma/resid/alarm depend on partitioning order.

    One shuffle (partition by series). Output per row: series, t
    (0-based order index), value, ewma, resid (NULL for t=0), alarm.
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    beta = 1.0 - alpha
    order = [F.col("ord")] + ([F.col("tb")] if tiebreak_col else [])
    w = Window.partitionBy("series").orderBy(*order)
    cum = Window.partitionBy("series").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    max_len = int(50.0 / alpha)
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        *([F.col(tiebreak_col).alias("tb")] if tiebreak_col else []),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull())
    t = F.row_number().over(w) - 1
    with_t = s.withColumn("t", t)
    guard = F.when(
        F.col("t") >= max_len,
        F.raise_error(
            F.concat(
                F.lit(
                    f"ewma_smooth: series exceeds the closed-form "
                    f"numeric bound {max_len} for alpha={alpha} "
                    "(re-anchor per period or raise alpha); series="
                ),
                F.col("series").cast("string"),
            )
        ).cast("double"),
    ).otherwise(F.lit(0.0))
    term = F.when(
        F.col("t") == 0, F.col("value")
    ).otherwise(
        F.lit(alpha) * F.col("value") * F.pow(F.lit(beta), -F.col("t"))
    ) + guard
    ewma = F.pow(F.lit(beta), F.col("t")) * F.sum(term).over(cum)
    scored = with_t.withColumn("ewma", F.round(ewma, round_to)).withColumn(
        "resid",
        F.round(F.col("value") - F.lag("ewma").over(w), round_to),
    )
    sigma = scored.groupBy("series").agg(
        F.round(F.stddev_samp("resid"), round_to).alias("_sigma")
    )
    return scored.join(sigma, "series").select(
        "series",
        F.col("t").cast("bigint").alias("t"),
        "value",
        "ewma",
        "resid",
        F.coalesce(
            F.abs(F.col("resid")) > F.lit(float(k)) * F.col("_sigma"),
            F.lit(False),
        ).alias("alarm"),
    )


def scd2_as_of(
    history: DataFrame,
    *,
    as_of: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Time travel over a type-2 dimension: the snapshot of every
    entity as of ``as_of`` — one row per key whose validity interval
    covers the instant, using :func:`scd2_history`'s half-open
    convention (``valid_from <= t < valid_to``, NULL ``valid_to`` =
    current). "What did this table look like on date X" becomes one
    range predicate instead of the reference's full raw-event rescan.

    Pure filter — zero shuffle, no window; on a dimension partitioned
    or Z-ordered by ``valid_from`` the scan prunes to the files whose
    range covers the instant. Rows valid at ``as_of`` from EVERY
    version era qualify exactly once (intervals within a key are
    disjoint by construction).
    """
    t = F.lit(as_of).cast("timestamp")
    return history.filter(
        (F.col(from_col) <= t)
        & (F.col(to_col).isNull() | (F.col(to_col) > t))
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    on: str | list[str],
    *,
    fact_ts: str,
    attr_cols: list[str],
    from_col: str = "valid_from",
    matched_from_col: str = "dim_valid_from",
) -> DataFrame:
    """Enrich facts with the dimension attributes that were valid WHEN
    EACH FACT HAPPENED — the point-in-time join every bitemporal
    warehouse query needs (price at order time, plan at usage time),
    where joining the current dimension silently rewrites history.

    Implemented as :func:`asof_join` on the version-open timestamps
    rather than an interval (BETWEEN) join: :func:`scd2_history`
    guarantees contiguous half-open versions per key, so "the version
    whose interval covers ``fact_ts``" IS "the latest ``valid_from``
    at-or-before ``fact_ts``" — and the as-of rewrite costs ONE
    shuffle with no interval blocking or row expansion. The catalog
    oracle intentionally computes the definitional interval join, so
    the hash match is a differential proof of the equivalence. Facts
    before a key's first version (or with no key) enrich to NULL.

    Output: all fact columns, the version's ``attr_cols``, and its
    ``valid_from`` as ``matched_from_col``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    dim = history.select(*keys, from_col, *attr_cols)
    return asof_join(
        facts,
        dim,
        keys,
        left_ts=fact_ts,
        right_ts=from_col,
        right_cols=attr_cols,
        matched_ts_col=matched_from_col,
    )


def cusum_alarm(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    k: float = 0.5,
    h: float = 5.0,
    round_to: int = 6,
) -> DataFrame:
    """Tabular CUSUM change-point detector per series: standardized
    two-sided cumulative sums ``S⁺_t = max(0, S⁺_{t−1} + z_t − k)``
    and ``S⁻_t = max(0, S⁻_{t−1} − z_t − k)`` with an alarm when
    either exceeds ``h``.  Where :func:`ewma_smooth` pages on a single
    outlier residual, CUSUM accumulates SMALL persistent shifts — the
    level-change monitor (a pipeline's daily volume drifting +1σ for a
    week) that per-point control charts structurally miss.

    The clipped recursion is computed CLOSED-FORM, not iteratively:
    ``max(0, S_{t−1} + x_t)  ≡  C_t − min(0, min_{j≤t} C_j)`` where
    ``C`` is the plain running cumsum of the increments — one ordered
    window per series computing a running sum and a running min, no
    driver loop, no state store, no UDF.  z-scores are rounded BEFORE
    the cumsum so both engines (and any two partitionings of the
    standardization aggregate) feed bit-identical doubles into the
    sequential window arithmetic.

    One shuffle (partition by series); the standardization mean/stddev
    ride the same partition as unbounded windows, so no second pass.
    ``tiebreak_col`` (a unique row id) makes the within-series order
    total — required for determinism when ``order_col`` can repeat.
    Output per row: series, t (0-based), value, s_hi, s_lo, alarm.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if h <= 0:
        raise ValueError(f"h must be > 0, got {h}")
    order = [F.col("ord")] + ([F.col("tb")] if tiebreak_col else [])
    w = Window.partitionBy("series").orderBy(*order)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    full = Window.partitionBy("series")
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        *([F.col(tiebreak_col).alias("tb")] if tiebreak_col else []),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull())
    mu = F.mean("value").over(full)
    sigma = F.stddev_samp("value").over(full)
    z = F.round(
        F.when(
            sigma.isNull() | (sigma == 0), F.lit(0.0)
        ).otherwise((F.col("value") - mu) / sigma),
        round_to,
    )
    scored = s.withColumn("z", z)
    c_hi = F.sum(F.col("z") - F.lit(k)).over(cum)
    c_lo = F.sum(-F.col("z") - F.lit(k)).over(cum)
    # The running min must see the cumsum as a materialized column (a
    # window-over-window expression is rejected); round it once so both
    # engines run the min/subtract over identical doubles.
    scored = (
        scored.withColumn("_c_hi", F.round(c_hi, round_to))
        .withColumn("_c_lo", F.round(c_lo, round_to))
    )
    s_hi = F.round(
        F.col("_c_hi") - F.least(F.lit(0.0), F.min("_c_hi").over(cum)), round_to
    )
    s_lo = F.round(
        F.col("_c_lo") - F.least(F.lit(0.0), F.min("_c_lo").over(cum)), round_to
    )
    return (
        scored.withColumn("t", F.row_number().over(w) - 1)
        .withColumn("s_hi", s_hi)
        .withColumn("s_lo", s_lo)
        .select(
            "series",
            F.col("t").cast("bigint").alias("t"),
            "value",
            "s_hi",
            "s_lo",
            ((F.col("s_hi") > h) | (F.col("s_lo") > h)).alias("alarm"),
        )
    )


def trend_fit(
    df: DataFrame,
    *,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares line fit: slope, intercept, and
    R² from the closed-form moment solution — the metric-trend readout
    ("is this series growing, and how fast?") a monitoring or
    forecasting pipeline runs over thousands of series at once.

    ONE hash aggregate computes everything: slope =
    cov_pop(x,y)/var_pop(x), intercept = ȳ − slope·x̄, R² =
    cov²/(var_x·var_y) — all from the same five sufficient statistics,
    map-side combinable, |groups| output rows.  No window, no second
    pass, no per-group sort: this is the textbook case where the
    moment form beats an iterative fit at any scale.  Degenerate
    groups (a single point, or zero x/y variance) yield NULL
    slope/intercept/R² rather than a division error.

    Rows with NULL x or y are dropped (pairwise-complete, matching SQL
    ``regr_*`` semantics).  Floats round to ``round_to`` so parallel
    aggregation order never leaks into the result.
    """
    s = df.select(
        *[F.col(c) for c in group_cols],
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    agg = s.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.mean("_x").alias("_mx"),
        F.mean("_y").alias("_my"),
        F.covar_pop("_x", "_y").alias("_cov"),
        F.var_pop("_x").alias("_vx"),
        F.var_pop("_y").alias("_vy"),
    )
    slope = F.when(F.col("_vx") > 0, F.col("_cov") / F.col("_vx"))
    r2 = F.when(
        (F.col("_vx") > 0) & (F.col("_vy") > 0),
        F.col("_cov") * F.col("_cov") / (F.col("_vx") * F.col("_vy")),
    )
    return agg.select(
        *group_cols,
        "n",
        F.round(slope, round_to).alias("slope"),
        F.round(F.col("_my") - slope * F.col("_mx"), round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )


def seasonal_decompose(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    period: int = 7,
    round_to: int = 6,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Classical additive seasonal decomposition per series:
    ``value = trend + seasonal + remainder`` — trend from a centered
    moving average over one full period, seasonal indices as the mean
    detrended value per in-period position (centered to sum to ~0),
    remainder as what's left.  The "is Tuesday always low, or is this
    week actually down?" separation every volume monitor needs before
    alarming on raw counts.

    ``period`` must be odd (7 for day-of-week on daily data): the
    centered window is then symmetric — ``rowsBetween(−p//2, p//2)`` —
    and the trend is NULL at the ``p//2`` edge rows where the window
    is incomplete (standard behavior; a partial-window average would
    bend the trend toward the edges).  In-period position is
    ``t % period`` from the per-series row index, not day-of-week
    parsing — identical in any engine and agnostic to the order
    column's type.

    Cost: one shuffle (partition by series) shared by the row-number
    and moving-average windows; the seasonal-index table is
    |series|·period rows — a broadcast join back.  Each stage rounds
    before the next subtraction so both engines (and any partitioning)
    derive the components from identical doubles.

    ``order_col`` must be unique within a series, or pass
    ``tiebreak_col`` (a unique row id): the row-number and centered
    windows order by it, and duplicate order values without a tiebreak
    make ``t`` (hence the in-period position and every component)
    partition-order-dependent — the same contract as
    ``markov_transitions`` / ``cusum_alarm``.

    Output: series, t, value, trend, seasonal, remainder.
    """
    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be odd and >= 3, got {period}")
    half = period // 2
    order = [F.col("ord")] + ([F.col("_tb")] if tiebreak_col else [])
    w = Window.partitionBy("series").orderBy(*order)
    ctr = w.rowsBetween(-half, half)
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        F.col(value_col).cast("double").alias("value"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    ).filter(F.col("value").isNotNull())
    with_trend = (
        s.withColumn("t", F.row_number().over(w) - 1)
        .withColumn(
            "trend",
            F.when(
                F.count(F.lit(1)).over(ctr) == period,
                F.round(F.avg("value").over(ctr), round_to),
            ),
        )
        .withColumn("_detr", F.col("value") - F.col("trend"))
        .withColumn("_pos", F.col("t") % period)
    )
    idx = with_trend.groupBy("series", "_pos").agg(
        F.avg("_detr").alias("_raw_idx")
    )
    centered = idx.withColumn(
        "seasonal",
        F.round(
            F.col("_raw_idx")
            - F.avg("_raw_idx").over(Window.partitionBy("series")),
            round_to,
        ),
    ).select("series", "_pos", "seasonal")
    return (
        with_trend.join(F.broadcast(centered), ["series", "_pos"], "left")
        .select(
            "series",
            F.col("t").cast("bigint").alias("t"),
            "value",
            "trend",
            "seasonal",
            F.round(
                F.col("value") - F.col("trend") - F.col("seasonal"), round_to
            ).alias("remainder"),
        )
    )


def acf(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    max_lag: int = 7,
    round_to: int = 6,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-series autocorrelation function: the correlation of each
    series with itself shifted by k rows, for k = 1..``max_lag`` — the
    seasonality/persistence fingerprint (a weekly cycle shows as a
    spike at lag 7, a trending series decays slowly) that tells a
    forecasting or anomaly pipeline WHICH period to model.

    Each lag is a ``lag(value, k)`` over ONE shared per-series window
    — ``max_lag`` row-local columns, no self-join on t+k (the naive
    form shuffles the series once per lag).  The lag columns unpivot
    via ``stack`` (row-local) and one hash aggregate computes the
    pairwise-complete Pearson correlation per (series, lag).  This is
    the sample cross-correlation of the overlapping segments —
    pairwise means/variances, not the single-global-mean textbook
    estimator — documented so the oracle and any consumer agree on
    the estimator.  Constant segments (zero variance) yield NULL.

    ``order_col`` must be unique within a series, or pass
    ``tiebreak_col`` (a unique row id): ``lag(value, k)`` is defined by
    the window ORDER BY, and duplicate order values without a tiebreak
    make every lag pairing partition-order-dependent — the same
    contract as ``markov_transitions`` / ``cusum_alarm``.

    One shuffle (the series window; the aggregate reuses nothing
    bigger).  Output: series, lag, n_pairs, acf.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    order = [F.col("ord")] + ([F.col("_tb")] if tiebreak_col else [])
    w = Window.partitionBy("series").orderBy(*order)
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        F.col(value_col).cast("double").alias("value"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    ).filter(F.col("value").isNotNull())
    lagged = s.select(
        "series",
        "value",
        *[
            F.lag("value", k).over(w).alias(f"_l{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stack_args = ", ".join(f"{k}, _l{k}" for k in range(1, max_lag + 1))
    long = lagged.selectExpr(
        "series",
        "value",
        f"stack({max_lag}, {stack_args}) as (lag, lagged)",
    ).filter(F.col("lagged").isNotNull())
    # corr() divides by a zero stddev under ANSI mode; build the Pearson
    # quotient from guarded moments instead (NULL for constant segments).
    agg = long.groupBy("series", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.covar_pop("value", "lagged").alias("_cov"),
        F.var_pop("value").alias("_vv"),
        F.var_pop("lagged").alias("_vl"),
    )
    return agg.select(
        "series",
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.round(
            F.when(
                (F.col("_vv") > 0) & (F.col("_vl") > 0),
                F.col("_cov") / F.sqrt(F.col("_vv") * F.col("_vl")),
            ),
            round_to,
        ).alias("acf"),
    )


def changepoint_detect(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Single best changepoint per series by binary segmentation's
    first step: the split position minimizing total within-segment SSE
    — "WHEN did this metric's level shift?" for deploy regressions,
    data-source swaps, seasonality breaks.  Apply recursively to the
    winning halves for multiple changepoints (each level is one more
    pass — the standard binary-segmentation recursion).

    Closed-form from prefix sums: with ``S_t = Σ_{i≤t} x`` and
    ``Q_t = Σ_{i≤t} x²``,

        SSE(1..t) = Q_t − S_t²/t
        cost(t)   = SSE(1..t) + SSE(t+1..n)     for t in 1..n−1

    so the whole scan is ONE per-series window (running S, Q, position)
    plus the series totals over the same partitioning key, and the
    argmin is an aggregate fold ``min(struct(cost, t))`` — one shuffle
    per series key, no self-joins, no per-candidate passes.  The
    rounded cost breaks argmin ties by earliest position, so the split
    is engine-reproducible.  ``order_col`` must be unique per series or
    ``tiebreak_col`` supplied (same contract as ``acf``).

    Output per series (n ≥ 2): series, n, split_pos (1-based, split is
    AFTER this position), split_order (order_col value there),
    sse_total (unsplit), sse_split (best), gain (rounded).
    """
    order = [F.col("_ord").asc()] + (
        [F.col("_tb").asc()] if tiebreak_col else []
    )
    base = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("_ord"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    w = Window.partitionBy("series").orderBy(*order)
    wall = Window.partitionBy("series")
    cum = (
        base.withColumn("_t", F.row_number().over(w))
        .withColumn("_s", F.sum("_x").over(w))
        .withColumn("_q", F.sum(F.col("_x") * F.col("_x")).over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_sn", F.sum("_x").over(wall))
        .withColumn("_qn", F.sum(F.col("_x") * F.col("_x")).over(wall))
    )
    t = F.col("_t").cast("double")
    n = F.col("_n").cast("double")
    sse_l = F.col("_q") - F.col("_s") * F.col("_s") / t
    sse_r = (F.col("_qn") - F.col("_q")) - (
        (F.col("_sn") - F.col("_s")) * (F.col("_sn") - F.col("_s"))
    ) / (n - t)
    cand = cum.filter(F.col("_t") < F.col("_n")).withColumn(
        "_cost", F.round(sse_l + sse_r, round_to)
    )
    best = cand.groupBy("series").agg(
        F.min(
            F.struct(
                F.col("_cost").alias("cost"),
                F.col("_t").alias("t"),
                F.col("_ord").alias("ord"),
            )
        ).alias("_b"),
        F.max("_n").alias("n"),
        F.max(
            F.round(
                F.col("_qn") - F.col("_sn") * F.col("_sn") / F.col("_n"),
                round_to,
            )
        ).alias("sse_total"),
    )
    return best.select(
        "series",
        F.col("n").cast("bigint").alias("n"),
        F.col("_b.t").cast("bigint").alias("split_pos"),
        F.col("_b.ord").alias("split_order"),
        "sse_total",
        F.col("_b.cost").alias("sse_split"),
        F.round(F.col("sse_total") - F.col("_b.cost"), round_to).alias(
            "gain"
        ),
    )


def max_concurrency(
    df: DataFrame,
    *,
    group_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Peak number of simultaneously-open intervals per group — the
    sweep-line classic ("max concurrent sessions", "peak in-flight
    shipments", "how many copies of this resource do we actually
    need").  Interval semantics are half-open ``[start, end)``: an
    interval ending exactly when another starts does NOT overlap it.

    One row-local explode to ±1 boundary events, then ONE window per
    group ordered ``(time, delta)`` — ends sort before starts at the
    same instant (−1 < +1), implementing the half-open rule — and the
    answer is ``max`` over the running sum.  Within an equal
    ``(time, delta)`` tie the running values are a permutation of the
    same multiset, so the maximum is deterministic without any
    tiebreak.  Peak time is the EARLIEST boundary instant achieving
    the maximum.  NULL or inverted (end ≤ start) intervals are
    dropped and counted.

    Output per group: group_cols…, n_intervals, n_dropped,
    max_concurrent, peak_time.
    """
    if not group_cols:
        raise ValueError("group_cols must not be empty")
    s, e = F.col(start_col), F.col(end_col)
    valid = s.isNotNull() & e.isNotNull() & (e > s)
    marked = df.select(*group_cols, s.alias("_s"), e.alias("_e"), valid.alias("_ok"))
    dropped = marked.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_ok"), 1).otherwise(0)).alias("n_intervals"),
        F.sum(F.when(~F.col("_ok"), 1).otherwise(0)).alias("n_dropped"),
    )
    ev = marked.filter(F.col("_ok")).select(
        *group_cols,
        F.explode(
            F.array(
                F.struct(F.col("_s").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("_e").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("_ev"),
    ).select(*group_cols, F.col("_ev.t").alias("t"), F.col("_ev.d").alias("d"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("t").asc(), F.col("d").asc()
    )
    run = ev.withColumn("_run", F.sum("d").over(w))
    peak = run.groupBy(*group_cols).agg(
        F.max("_run").alias("max_concurrent")
    )
    first_peak = (
        run.join(peak, group_cols)
        .filter(F.col("_run") == F.col("max_concurrent"))
        .groupBy(*group_cols, "max_concurrent")
        .agg(F.min("t").alias("peak_time"))
    )
    return (
        dropped.join(first_peak, group_cols, "left")
        .select(
            *group_cols,
            F.col("n_intervals").cast("bigint").alias("n_intervals"),
            F.col("n_dropped").cast("bigint").alias("n_dropped"),
            F.coalesce("max_concurrent", F.lit(0))
            .cast("bigint")
            .alias("max_concurrent"),
            "peak_time",
        )
    )


def seasonal_naive_error(
    df: DataFrame,
    *,
    series_col: str,
    date_col: str,
    value_col: str,
    period: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Seasonal-naive forecast baseline and its error — predict each
    bucket with the value one ``period`` earlier (same weekday last
    week) and report MAE / MAPE / bias per series.  The floor every
    real forecast must beat, and the cheapest volume-anomaly monitor
    that respects weekly shape: a pipeline whose daily counts suddenly
    sit 40% off their seasonal-naive prediction broke, whatever the
    day of week.

    ONE ``lag(period)`` window per series over the (already
    aggregated) per-bucket frame — no self-join on t−period, no model
    state.  The first ``period`` buckets of each series have no
    prediction and are excluded from the error aggregates (counted in
    ``n_buckets`` vs ``n_scored``).  Zero-actual buckets are excluded
    from MAPE only (undefined) — the standard convention, stated
    because implementations silently differ.

    Output per series: series, n_buckets, n_scored, mae, mape, bias
    (mean signed error, + = actual above prediction; rounded).
    """
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    base = df.select(
        F.col(series_col).alias("series"),
        F.col(date_col).alias("d"),
        F.col(value_col).cast("double").alias("x"),
    ).filter(F.col("x").isNotNull())
    w = Window.partitionBy("series").orderBy(F.col("d").asc())
    scored = base.withColumn("_pred", F.lag("x", period).over(w))
    err = F.col("x") - F.col("_pred")
    return scored.groupBy("series").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.when(F.col("_pred").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_scored"),
        F.round(
            F.avg(F.when(F.col("_pred").isNotNull(), F.abs(err))), round_to
        ).alias("mae"),
        F.round(
            F.avg(
                F.when(
                    F.col("_pred").isNotNull() & (F.col("x") != 0),
                    F.abs(err) / F.abs(F.col("x")),
                )
            ),
            round_to,
        ).alias("mape"),
        F.round(
            F.avg(F.when(F.col("_pred").isNotNull(), err)), round_to
        ).alias("bias"),
    )


def theil_sen(
    df: DataFrame,
    *,
    series_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Theil–Sen robust trend per series: slope = the MEDIAN of all
    pairwise slopes ``(y_j − y_i)/(x_j − x_i)``, intercept = the median
    of ``y − slope·x`` — the estimator that shrugs off up to ~29%
    outliers where :func:`trend_fit`'s OLS line chases a single bad
    day (sensor glitches, logging outages, backfill spikes).

    Scale shape: this runs on PRE-AGGREGATED series (daily/hourly
    rollups — the distributed step), so each series has bounded length
    n and the pair table is one self-equi-join on the series key
    producing n(n−1)/2 rows per series — fine for thousands of points
    per series, and the join key keeps every series' pairs in its own
    partition.  Medians via ``percentile`` (linear interpolation,
    matching DuckDB ``quantile_cont``).  Pairs with equal x are
    excluded (vertical slope); series with < 2 distinct x yield NULL
    slope.

    Output per series: series, n_points, n_pairs, slope, intercept.
    """
    d = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            F.col(series_col).alias("series"),
            F.col(x_col).cast("double").alias("x"),
            F.col(y_col).cast("double").alias("y"),
        )
        # four consumers (both self-join sides, the point census, the
        # residual medians) — pin the small pre-aggregated series frame
        # so the upstream rollup runs ONCE, not per branch
        .localCheckpoint(eager=True)
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.series") == F.col("b.series"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.series").alias("series"),
        (
            (F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))
        ).alias("pair_slope"),
    )
    slopes = pairs.groupBy("series").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("percentile(pair_slope, 0.5)").alias("slope"),
    )
    counts = d.groupBy("series").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    resid = (
        d.join(slopes.select("series", "slope"), "series")
        .groupBy("series")
        .agg(
            F.expr("percentile(y - slope * x, 0.5)").alias("intercept")
        )
    )
    return (
        counts.join(slopes, "series", "left")
        .join(resid, "series", "left")
        .select(
            "series",
            "n_points",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.round("slope", round_to).alias("slope"),
            F.round("intercept", round_to).alias("intercept"),
        )
        .orderBy("series")
    )


def holt_forecast(
    df: DataFrame,
    *,
    series_col: str,
    t_col: str,
    y_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Holt double-exponential smoothing per series (level + trend) with
    an h-step-ahead forecast and in-sample one-step error — the
    classic short-horizon volume forecaster for capacity planning and
    ingest-anomaly baselines.

    Recurrence (initialized ``l₀ = y₀``, ``b₀ = y₁ − y₀``; series with
    < 2 points are dropped):
    ``l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})``,
    ``b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}``, one-step error
    ``e_t = y_t − (l_{t−1} + b_{t−1})`` accumulated as SSE from t = 1.

    Scale shape: series are PRE-AGGREGATED rollups, so each collapses
    to one bounded array — ``sort_array(collect_list(struct(t, y)))``
    inside the same hash aggregate that groups the series, then the
    whole recurrence is ONE ``F.aggregate`` fold in codegen, strictly
    chronological so every double op happens in a defined order: the
    DuckDB oracle replays it with a recursive CTE and matches
    bit-for-bit.  No window, no second shuffle, no Python.

    Output per series: series, n_points, level, trend, forecast
    (= level + horizon·trend), rmse (in-sample one-step).
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    d = df.filter(
        F.col(t_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(series_col).alias("series"),
        F.col(t_col).cast("double").alias("t"),
        F.col(y_col).cast("double").alias("y"),
    )
    arr = d.groupBy("series").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("t"), F.col("y")))
        ).alias("pts")
    )
    a, b = float(alpha), float(beta)
    fold = F.expr(
        f"""
        aggregate(
          slice(pts, 3, size(pts) - 2),
          named_struct(
            'l', element_at(pts, 2).y,
            'b', element_at(pts, 2).y - element_at(pts, 1).y,
            'sse', CAST(0.0 AS DOUBLE),
            'n', 1
          ),
          (acc, p) -> named_struct(
            'l', {a}d * p.y + {1 - a}d * (acc.l + acc.b),
            'b', {b}d * (({a}d * p.y + {1 - a}d * (acc.l + acc.b)) - acc.l)
                 + {1 - b}d * acc.b,
            'sse', acc.sse + (p.y - (acc.l + acc.b)) * (p.y - (acc.l + acc.b)),
            'n', acc.n + 1
          ),
          acc -> acc
        )
        """
    )
    # The fold starts at the THIRD point.  With l0 = y0 and b0 = y1 - y0
    # the t=1 update is exactly l1 = y1, b1 = b0 and its one-step error
    # is 0 by construction, so the accumulator is seeded with that
    # post-t=1 state (l = pts[2].y, b = pts[2].y - pts[1].y) and SSE
    # over t>=2 equals SSE over t>=1.
    out = (
        arr.filter(F.size("pts") >= 2)
        .withColumn("_h", fold)
        .select(
            "series",
            (F.col("_h.n") + 1).cast("bigint").alias("n_points"),
            F.round("_h.l", round_to).alias("level"),
            F.round("_h.b", round_to).alias("trend"),
            F.round(
                F.col("_h.l") + F.lit(float(horizon)) * F.col("_h.b"),
                round_to,
            ).alias("forecast"),
            F.round(
                F.when(
                    F.col("_h.n") > 1,
                    F.sqrt(F.col("_h.sse") / (F.col("_h.n") - 1)),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("rmse"),
        )
    )
    return out.orderBy("series")


def mann_kendall(
    df: DataFrame,
    *,
    series_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Mann–Kendall monotone-trend test per series — the
    distribution-free significance companion to :func:`theil_sen`:
    ``S = Σ_{i<j} sign(y_j − y_i)`` over time-ordered pairs, with the
    tie-corrected variance
    ``var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18`` and the
    continuity-corrected ``z = (S − sign(S)) / sqrt(var)``.  Answers
    "is this series really drifting?" without assuming linearity or
    normality — the standard first gate before acting on a fitted
    slope.

    Scale shape: same as :func:`theil_sen` — series are PRE-AGGREGATED
    rollups, the pair table is one self-equi-join on the series key
    (n²/2 rows per bounded-length series, partition-local per series),
    and S is one integer aggregate over it; the tie census is a
    (series, y) count aggregate, exact integer arithmetic throughout
    (z's sqrt is the only float op, identical in any engine).
    Pairs with equal x are excluded, matching the Theil–Sen pair set.

    Significance is emitted as fixed-α booleans (|z| > 1.96 / 2.576),
    the same no-erf convention as ``proportion_test``; the z value
    itself feeds :func:`~knot_another_pipeline_spark.operators.quality.
    fdr_adjust` for multiple-series sweeps.

    Output per series: series, n_points, s_stat, var_s, z,
    trend_95, trend_99.
    """
    d = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            F.col(series_col).alias("series"),
            F.col(x_col).cast("double").alias("x"),
            F.col(y_col).cast("double").alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    a, b = d.alias("a"), d.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.series") == F.col("b.series"))
            & (F.col("a.x") < F.col("b.x")),
        )
        .groupBy(F.col("a.series").alias("series"))
        .agg(
            F.sum(
                F.signum(F.col("b.y") - F.col("a.y")).cast("long")
            ).alias("s_stat")
        )
    )
    n = d.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    ties = (
        d.groupBy("series", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("series")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    nn = F.col("n_points")
    var_s = (
        nn * (nn - 1) * (2 * nn + 5) - F.coalesce("tie_term", F.lit(0))
    ).cast("double") / 18.0
    ss = F.col("s_stat")
    z = F.when(
        var_s > 0,
        (ss - F.signum(ss)).cast("double") / F.sqrt(var_s),
    )
    return (
        n.join(s, "series", "left")
        .join(ties, "series", "left")
        .select(
            "series",
            "n_points",
            F.coalesce(ss, F.lit(0)).cast("bigint").alias("s_stat"),
            F.round(var_s, round_to).alias("var_s"),
            F.round(z, round_to).alias("z"),
            F.when(z.isNotNull(), F.abs(z) > 1.959963984540054).alias(
                "trend_95"
            ),
            F.when(z.isNotNull(), F.abs(z) > 2.5758293035489004).alias(
                "trend_99"
            ),
        )
        .orderBy("series")
    )


def periodogram(
    df: DataFrame,
    *,
    series_col: str,
    t_col: str,
    value_col: str,
    periods: list[float],
    round_to: int = 6,
) -> DataFrame:
    """Per-series periodogram at CANDIDATE periods — "which cycle
    drives this metric: daily, weekly, both?" asked directly of the
    data instead of eyeballing :func:`seasonal_decompose`.  For each
    period P the power at f = 1/P is
    ``(C² + S²)·2/n`` with ``C = Σ(y−ȳ)·cos(2πt/P)``,
    ``S = Σ(y−ȳ)·sin(2πt/P)`` — reported as ``var_share`` (power
    normalized by 2·variance, the fraction of variance a fitted
    cosine at that period explains, O(1) regardless of metric scale)
    and ``amplitude`` (the fitted cosine's amplitude in metric
    units).

    The mean-centering collapses algebraically onto UNCENTERED sums
    (``Σy·cos − ȳ·Σcos``), so the whole computation is ONE hash
    aggregate over (series × |periods|) rows produced by a broadcast
    crossJoin with the tiny candidate list — no per-series join, no
    second pass, no FFT-sized intermediate.  That is the scale
    contract: row volume × k candidates map-side, |series|·k rows
    shuffled.  ``is_dominant`` marks each series' top-power period
    (ties broken toward the shorter period).

    Output per (series, period): series, period, n, var_share,
    amplitude, is_dominant — NULL shares for constant series.
    """
    import math as _math

    if not periods:
        raise ValueError("periods must be non-empty")
    spark = df.sparkSession
    per = spark.createDataFrame(
        [(float(p),) for p in periods], "period double"
    )
    if any(p <= 0 for p in periods):
        raise ValueError(f"periods must be positive, got {periods}")
    t = F.col(t_col).cast("double")
    y = F.col(value_col).cast("double")
    s = df.select(
        F.col(series_col).alias("series"), t.alias("_t"), y.alias("_y")
    ).filter(F.col("_t").isNotNull() & F.col("_y").isNotNull())
    ang = F.lit(2.0 * _math.pi) * F.col("_t") / F.col("period")
    g = (
        s.crossJoin(F.broadcast(per))
        .groupBy("series", "period")
        .agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
            F.sum(F.col("_y") * F.cos(ang)).alias("_yc"),
            F.sum(F.col("_y") * F.sin(ang)).alias("_ys"),
            F.sum(F.cos(ang)).alias("_c"),
            F.sum(F.sin(ang)).alias("_s"),
        )
    )
    n = F.col("_n")
    mean = F.col("_sy") / n
    var = F.col("_syy") / n - mean * mean
    cc = F.col("_yc") - mean * F.col("_c")
    ss = F.col("_ys") - mean * F.col("_s")
    power = (cc * cc + ss * ss) * 2.0 / n
    share = F.when(var > 0, power / (2.0 * var * n))
    amp = F.when(n > 0, F.sqrt(cc * cc + ss * ss) * 2.0 / n)
    w = Window.partitionBy("series").orderBy(
        F.when(var > 0, power / (2.0 * var * n)).desc_nulls_last(),
        F.col("period").asc(),
    )
    return g.select(
        "series",
        "period",
        n.cast("bigint").alias("n"),
        F.round(share, round_to).alias("var_share"),
        F.round(amp, round_to).alias("amplitude"),
        (F.row_number().over(w) == 1).alias("is_dominant"),
    ).orderBy("series", "period")


def lag_correlation(
    df: DataFrame,
    *,
    t_col: str,
    a_col: str,
    b_col: str,
    max_lag: int,
    round_to: int = 6,
) -> DataFrame:
    """Cross-correlation function between two aligned series — "does
    a move in A lead a move in B, and by how many steps?": Pearson
    corr(A_t, B_{t+ℓ}) for every lag ℓ ∈ [−L, L], with ``is_best``
    marking the strongest |corr| (ties toward the smallest |ℓ|, then
    the negative lag).  Positive ℓ means A LEADS B by ℓ steps.

    Scale shape: the (2L+1)-row lag list broadcast-crossJoins the A
    side, which then equi-joins B on the shifted integer key
    ``t + ℓ`` — one hash join carrying N·(2L+1) rows (L is single
    digits in practice), then one moment-sum aggregate to 2L+1 rows.
    Correlations come from the sums (n·Σab − ΣaΣb) / √(...), no
    per-lag passes, no window over the full series.

    Output per lag: lag, n_overlap, corr (NULL when either side is
    constant over the overlap), is_best.
    """
    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    spark = df.sparkSession
    lags = spark.createDataFrame(
        [(int(l),) for l in range(-max_lag, max_lag + 1)], "lag long"
    )
    t = F.col(t_col).cast("long")
    s = df.select(
        t.alias("_t"),
        F.col(a_col).cast("double").alias("_a"),
        F.col(b_col).cast("double").alias("_b"),
    ).filter(F.col("_t").isNotNull())
    a_side = s.select("_t", "_a").filter(F.col("_a").isNotNull())
    b_side = s.select(
        F.col("_t").alias("_tb"), F.col("_b")
    ).filter(F.col("_b").isNotNull())
    j = (
        a_side.crossJoin(F.broadcast(lags))
        .join(b_side, F.col("_tb") == F.col("_t") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.sum("_a").alias("_sa"),
            F.sum("_b").alias("_sb"),
            F.sum(F.col("_a") * F.col("_a")).alias("_saa"),
            F.sum(F.col("_b") * F.col("_b")).alias("_sbb"),
            F.sum(F.col("_a") * F.col("_b")).alias("_sab"),
        )
    )
    n = F.col("_n")
    cov = n * F.col("_sab") - F.col("_sa") * F.col("_sb")
    va = n * F.col("_saa") - F.col("_sa") * F.col("_sa")
    vb = n * F.col("_sbb") - F.col("_sb") * F.col("_sb")
    corr = F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb))
    w = Window.orderBy(
        F.when((va > 0) & (vb > 0), F.abs(cov / F.sqrt(va * vb)))
        .desc_nulls_last(),
        F.abs(F.col("lag")).asc(),
        F.col("lag").asc(),
    )
    return j.select(
        "lag",
        n.cast("bigint").alias("n_overlap"),
        F.round(corr, round_to).alias("corr"),
        (F.row_number().over(w) == 1).alias("is_best"),
    ).orderBy("lag")


def ljung_box(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    max_lag: int = 7,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Ljung–Box portmanteau test per series: is there ANY
    autocorrelation in the first ``max_lag`` lags, in one number?
    ``Q = n(n+2) Σ_k ρ̂_k²/(n−k)``, p-value against χ²(max_lag) — the
    standard residual-whiteness gate after a forecast fit
    (:func:`holt_forecast`, :func:`trend_fit`): if Q rejects, the model
    left structure on the table.

    Uses the TEXTBOOK autocorrelation estimator (deviations from the
    one global series mean, normalized by the lag-0 sum of squares) —
    deliberately not :func:`acf`'s pairwise-complete Pearson, which is
    a different statistic with no χ² null.  Every ρ̂_k reduces from
    moment sums collected in ONE aggregate over ONE window pass:

        ĉ_k·n = Σ x_t x_{t−k} − x̄·Σ(x_t + x_{t−k}) + (n−k)·x̄²

    so the plan is one per-series window (``max_lag`` row-local lag
    columns), one hash aggregate on the series key, and row-local
    arithmetic — one shuffle total, no join back for the mean, no
    unpivot.  The p-value is the Wilson–Hilferty cube-root χ²
    approximation (the same construction as ``kruskal_wallis`` /
    ``cochran_q`` — portable to any SQL engine, no gamma function).

    ``order_col`` must be unique per series or ``tiebreak_col``
    supplied (the :func:`acf` contract).  Output per series: series,
    n, max_lag, q_stat, p_value — NULL stat for constant series or
    n ≤ max_lag.
    """
    from knot_another_pipeline_spark.operators.quality import (
        normal_sf_two_sided,
    )

    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    order = [F.col("ord")] + ([F.col("_tb")] if tiebreak_col else [])
    w = Window.partitionBy("series").orderBy(*order)
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        F.col(value_col).cast("double").alias("value"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    ).filter(F.col("value").isNotNull())
    lagged = s.select(
        "series",
        "value",
        *[
            F.lag("value", k).over(w).alias(f"_l{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    aggs = [
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("value").alias("_sx"),
        F.sum(F.col("value") * F.col("value")).alias("_sxx"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        aggs.append(F.sum(F.col("value") * lk).alias(f"_sp{k}"))
        aggs.append(
            F.sum(
                F.when(lk.isNotNull(), F.col("value") + lk)
            ).alias(f"_se{k}")
        )
    g = lagged.groupBy("series").agg(*aggs)
    n = F.col("_n")
    mean = F.col("_sx") / n
    c0 = F.col("_sxx") - n * mean * mean  # = n·ĉ₀
    q_terms = None
    for k in range(1, max_lag + 1):
        ck = (
            F.coalesce(F.col(f"_sp{k}"), F.lit(0.0))
            - mean * F.coalesce(F.col(f"_se{k}"), F.lit(0.0))
            + (n - k) * mean * mean
        )
        rho2 = (ck / c0) * (ck / c0)
        term = rho2 / (n - k)
        q_terms = term if q_terms is None else q_terms + term
    q = F.when(
        (n > max_lag) & (c0 > 0), n * (n + 2.0) * q_terms
    )
    dof = F.lit(float(max_lag))
    zwh = (F.cbrt(q / dof) - (1.0 - 2.0 / (9.0 * dof))) / F.sqrt(
        2.0 / (9.0 * dof)
    )
    p = F.when(
        zwh.isNotNull(),
        F.when(zwh >= 0, normal_sf_two_sided(zwh) / 2).otherwise(
            1.0 - normal_sf_two_sided(zwh) / 2
        ),
    )
    return g.select(
        "series",
        n.cast("bigint").alias("n"),
        F.lit(max_lag).cast("int").alias("max_lag"),
        F.round(q, round_to).alias("q_stat"),
        F.round(p, round_to).alias("p_value"),
    ).orderBy("series")


def hurst_exponent(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    scales: tuple[int, ...] = (8, 16, 32, 64),
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Hurst exponent per series by classic rescaled-range (R/S)
    analysis: H ≈ 0.5 for a random walk's increments (white noise),
    H > 0.5 for long-memory / trending series, H < 0.5 for
    mean-reverting ones — the one-number "does this metric trend or
    revert" readout that decides whether yesterday's drift should
    alarm (:func:`cusum_alarm`) or is just persistence.

    Estimator: for each window size s in ``scales``, cut the series
    into ⌊n/s⌋ full blocks; per block compute the range R of the
    cumulative deviations from the block mean and the population
    standard deviation S; average R/S over blocks (S = 0 blocks are
    degenerate and excluded); H is the least-squares slope of
    log(avg R/S) against log(s).

    Scale shape: one row_number window per series, an explode by
    |scales| (a 4× row multiplier, row-local), then ONE window pass
    per (series, scale, block) — partitions are at most max(scales)
    rows, so no single-partition funnels regardless of series length —
    computing the running sum, position, and block moments together;
    block range/std reduce in a (series, scale, block) aggregate, the
    per-scale average in a (series, scale) aggregate, and the log-log
    slope folds the ≤|scales| remaining rows per series.  Three
    narrowing shuffles, all on compound keys that spread evenly.

    ``order_col`` must be unique per series or ``tiebreak_col``
    supplied (the :func:`acf` contract).  Output per series: series,
    n, n_scales (scales with ≥1 usable block), hurst (NULL when fewer
    than 2 scales are usable — a slope needs two points).
    """
    if len(scales) < 2:
        raise ValueError(f"need >= 2 scales, got {scales!r}")
    if any(s < 2 for s in scales) or len(set(scales)) != len(scales):
        raise ValueError(f"scales must be distinct and >= 2: {scales!r}")
    order = [F.col("ord")] + ([F.col("_tb")] if tiebreak_col else [])
    widx = Window.partitionBy("series").orderBy(*order)
    s0 = (
        df.select(
            F.col(series_col).alias("series"),
            F.col(order_col).alias("ord"),
            F.col(value_col).cast("double").alias("value"),
            *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
        )
        .filter(F.col("value").isNotNull())
        .select(
            "series",
            "value",
            (F.row_number().over(widx) - 1).alias("_idx"),
        )
    )
    expl = s0.select(
        "series",
        "value",
        "_idx",
        F.explode(
            F.array(*[F.lit(int(s)) for s in scales])
        ).alias("_scale"),
    ).withColumn("_blk", (F.col("_idx") / F.col("_scale")).cast("bigint"))
    wb = Window.partitionBy("series", "_scale", "_blk").orderBy("_idx")
    wall = wb.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = expl.select(
        "series",
        "_scale",
        "_blk",
        F.sum("value").over(wb).alias("_run"),
        F.row_number().over(wb).alias("_pos"),
        F.count(F.lit(1)).over(wall).alias("_cnt"),
        F.sum("value").over(wall).alias("_bsum"),
        F.sum(F.col("value") * F.col("value")).over(wall).alias("_bsq"),
    ).withColumn(
        "_z", F.col("_run") - F.col("_pos") * F.col("_bsum") / F.col("_cnt")
    )
    blocks = (
        scored.filter(F.col("_cnt") == F.col("_scale"))
        .groupBy("series", "_scale", "_blk")
        .agg(
            (F.max("_z") - F.min("_z")).alias("_r"),
            F.sqrt(
                F.max("_bsq") / F.max("_cnt")
                - (F.max("_bsum") / F.max("_cnt"))
                * (F.max("_bsum") / F.max("_cnt"))
            ).alias("_s"),
        )
        .filter(F.col("_s") > 0)
    )
    per_scale = blocks.groupBy("series", "_scale").agg(
        F.avg(F.col("_r") / F.col("_s")).alias("_rs"),
        F.count(F.lit(1)).alias("_nblk"),
    )
    fit = per_scale.filter(F.col("_rs") > 0).groupBy("series").agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum(F.log("_scale")).alias("_su"),
        F.sum(F.log("_rs")).alias("_sv"),
        F.sum(F.log("_scale") * F.log("_scale")).alias("_suu"),
        F.sum(F.log("_scale") * F.log("_rs")).alias("_suv"),
    )
    k = F.col("_k").cast("double")
    denom = F.col("_suu") - F.col("_su") * F.col("_su") / k
    slope = (F.col("_suv") - F.col("_su") * F.col("_sv") / k) / denom
    n_per = s0.groupBy("series").agg(F.count(F.lit(1)).alias("n"))
    return (
        n_per.join(fit, "series", "left")
        .select(
            "series",
            F.col("n").cast("bigint").alias("n"),
            F.coalesce(F.col("_k"), F.lit(0)).cast("int").alias("n_scales"),
            F.round(
                F.when((F.col("_k") >= 2) & (denom > 0), slope), round_to
            ).alias("hurst"),
        )
        .orderBy("series")
    )


def page_hinkley(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 10.0,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Page–Hinkley sequential mean-shift detector per series — the
    classic drift test the streaming-ML literature uses for concept
    drift (Page 1954; Gama et al. 2014 survey): a cumulative deviation
    from the RUNNING mean,

        m_t = Σ_{i≤t} (x_i − x̄_i − δ),   PH_t = m_t − min_{s≤t} m_s,

    alarming when PH_t > λ.  Complements :func:`cusum_alarm` (which
    tests against a FIXED baseline mean): PH self-references the
    running mean, so it needs no calibration window and catches slow
    upward drifts a fixed-baseline CUSUM absorbs into its baseline.

    Scale shape: three stacked cumulative windows (running mean →
    cumulative deviation → running min), all over the SAME
    (series, order) partitioning — one shuffle, one sort, whole-stage
    codegen throughout.  Partitions are per-series; the intended input
    is an already-aggregated series (daily/hourly metric rows), so a
    partition is thousands of rows, not raw events.

    ``order_col`` must be unique per series or ``tiebreak_col``
    supplied.  Output per series: n, max_ph, n_alarms (rows with
    PH > λ), first_alarm_ord (order value of the first alarm, NULL
    when none), drift (any alarm).
    """
    if lam <= 0:
        raise ValueError(f"lam must be positive, got {lam}")
    order = [F.col("ord")] + ([F.col("_tb")] if tiebreak_col else [])
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        F.col(value_col).cast("double").alias("_x"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    ).filter(F.col("_x").isNotNull())
    cum = (
        Window.partitionBy("series")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        s.withColumn("_rmean", F.avg("_x").over(cum))
        .withColumn(
            "_m",
            F.sum(
                F.col("_x") - F.col("_rmean") - F.lit(float(delta))
            ).over(cum),
        )
        .withColumn("_ph", F.col("_m") - F.min("_m").over(cum))
    )
    alarmed = staged.withColumn(
        "_is_alarm", F.col("_ph") > F.lit(float(lam))
    )
    return (
        alarmed.groupBy("series")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.max("_ph"), round_to).alias("max_ph"),
            F.sum(F.when(F.col("_is_alarm"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_alarms"),
            F.min(F.when(F.col("_is_alarm"), F.col("ord"))).alias(
                "first_alarm_ord"
            ),
            F.max(F.col("_is_alarm").cast("int")).cast("boolean").alias(
                "drift"
            ),
        )
        .orderBy("series")
    )


def dickey_fuller(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    crit_5pct: float = -2.86,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Dickey–Fuller unit-root test per series (no augmentation lags,
    with drift): regress Δy_t on y_{t−1} with an intercept and report
    the t-statistic of the y_{t−1} coefficient γ.  γ near 0 (t above
    the critical value) means a unit root — the series is a random
    walk and yesterday's level says nothing mean-reverting; t below
    ``crit_5pct`` (−2.86, the 5% constant-only DF critical value for
    large n) rejects the unit root, licensing mean-reversion plays
    (:func:`cusum_alarm` baselines, :func:`holt_forecast` damping).

    The DF t-statistic is NOT Student-t distributed — its critical
    values come from the Dickey–Fuller tables — so the output reports
    the t-stat and a fixed-critical-value boolean, never a normal
    p-value (the same fixed-α contract as ``proportion_test``).

    Scale shape: one lag window per series (one shuffle), then the
    closed-form OLS from six moment sums in ONE hash aggregate —
    γ = Sxy/Sxx, RSS = Syy − γ·Sxy, se = √(RSS/(n−2)/Sxx), all
    row-local arithmetic on the aggregate row.

    Output per series: n_diffs, gamma, t_stat (NULL when n_diffs < 3
    or the lagged level is constant), stationary_5pct.
    """
    order = [F.col("ord")] + ([F.col("_tb")] if tiebreak_col else [])
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        F.col(value_col).cast("double").alias("_y"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    ).filter(F.col("_y").isNotNull())
    w = Window.partitionBy("series").orderBy(*order)
    lagged = s.withColumn("_ylag", F.lag("_y").over(w)).filter(
        F.col("_ylag").isNotNull()
    )
    pairs = lagged.select(
        "series",
        F.col("_ylag").alias("_x"),
        (F.col("_y") - F.col("_ylag")).alias("_d"),
    )
    agg = pairs.groupBy("series").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_d").alias("_sd"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_d") * F.col("_d")).alias("_sdd"),
        F.sum(F.col("_x") * F.col("_d")).alias("_sxd"),
    )
    # single-point series have no lag pair and would vanish from the
    # pair aggregate — re-attach them from the input series list so
    # they emit (n_diffs=0, NULL stats); NULL moment sums propagate
    # NULL through every division below (ANSI-safe).
    agg = (
        s.select("series")
        .distinct()
        .join(agg, "series", "left")
        .withColumn("_n", F.coalesce("_n", F.lit(0.0)))
    )
    n = F.col("_n")
    sxx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / n
    sdd = F.col("_sdd") - F.col("_sd") * F.col("_sd") / n
    sxd = F.col("_sxd") - F.col("_sx") * F.col("_sd") / n
    gamma = sxd / sxx
    rss = sdd - gamma * sxd
    se = F.sqrt(rss / (n - 2.0) / sxx)
    ok = (n >= 3) & (sxx > 0)
    t = F.when(ok & (se > 0), gamma / se)
    return agg.select(
        "series",
        n.cast("bigint").alias("n_diffs"),
        F.round(F.when(ok, gamma), round_to).alias("gamma"),
        F.round(t, round_to).alias("t_stat"),
        (t < F.lit(float(crit_5pct))).alias("stationary_5pct"),
    ).orderBy("series")


def spectral_entropy(
    df: DataFrame,
    *,
    series_col: str,
    t_col: str,
    value_col: str,
    periods: list[float],
    round_to: int = 6,
) -> DataFrame:
    """Normalized spectral entropy of each series over a CANDIDATE
    period grid — "is this metric one clean cycle or broadband noise"
    in one number: the Shannon entropy of the normalized
    :func:`periodogram` powers, divided by log(k) so 0 means all
    variance at one candidate period and 1 means power spread evenly
    across all k candidates.  The standard tsfeatures/catch22-style
    forecastability score: low entropy → seasonal-naive and
    :func:`holt_forecast` will do well; high entropy → nothing
    periodic to exploit at these scales.

    Scale shape: identical to :func:`periodogram` — mean-centering
    collapsed onto uncentered trig sums, ONE hash aggregate over
    (rows × k candidates) from a broadcast crossJoin, then the entropy
    folds the k per-period rows per series in a second tiny aggregate.
    Zero-power candidates contribute 0 (lim p·ln p), constant series
    yield NULL.

    Output per series: series, n, n_active (candidates with power
    > 0), spectral_entropy, dominant_period (the candidate with the
    most power, ties toward the shorter period).
    """
    import math as _math

    if not periods:
        raise ValueError("periods must be non-empty")
    if any(p <= 0 for p in periods):
        raise ValueError(f"periods must be positive, got {periods}")
    if len(set(periods)) < 2:
        raise ValueError("need >= 2 distinct periods for an entropy")
    spark = df.sparkSession
    per = spark.createDataFrame(
        [(float(p),) for p in periods], "period double"
    )
    t = F.col(t_col).cast("double")
    y = F.col(value_col).cast("double")
    s = df.select(
        F.col(series_col).alias("series"), t.alias("_t"), y.alias("_y")
    ).filter(F.col("_t").isNotNull() & F.col("_y").isNotNull())
    ang = F.lit(2.0 * _math.pi) * F.col("_t") / F.col("period")
    g = (
        s.crossJoin(F.broadcast(per))
        .groupBy("series", "period")
        .agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
            F.sum(F.col("_y") * F.cos(ang)).alias("_yc"),
            F.sum(F.col("_y") * F.sin(ang)).alias("_ys"),
            F.sum(F.cos(ang)).alias("_c"),
            F.sum(F.sin(ang)).alias("_s"),
        )
    )
    mean = F.col("_sy") / F.col("_n")
    var = F.col("_syy") / F.col("_n") - mean * mean
    cc = F.col("_yc") - mean * F.col("_c")
    ss = F.col("_ys") - mean * F.col("_s")
    # Relative power floor: a CONSTANT series leaves ~1e-13 rounding
    # residue in the centered trig sums, which would read as "power".
    # Real power scales like n²·var (a perfect tone hits ~(n·σ)²/4);
    # 1e-20 of that is 7+ orders above the ~(n·σ·ε)² residue and 20
    # below any signal, so the gate is engine-independent (the DuckDB
    # oracle applies the same expression).
    raw = cc * cc + ss * ss
    tol = F.col("_n") * F.col("_n") * var * F.lit(1e-20)
    pw = F.when((var > 0) & (raw > tol), raw).otherwise(F.lit(0.0))
    powered = g.select(
        "series",
        "period",
        F.col("_n"),
        pw.alias("_pw"),
    )
    k = float(len(set(periods)))
    ent = powered.groupBy("series").agg(
        F.max("_n").cast("bigint").alias("n"),
        F.sum(F.when(F.col("_pw") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_active"),
        F.sum("_pw").alias("_tot"),
        F.sum(
            F.when(
                F.col("_pw") > 0, F.col("_pw") * F.log(F.col("_pw"))
            ).otherwise(F.lit(0.0))
        ).alias("_plnp"),
        F.min(
            F.when(
                F.col("_pw") > 0,
                F.struct(
                    (-F.col("_pw")).alias("_negp"),
                    F.col("period").alias("period"),
                ),
            )
        ).alias("_dom"),
    )
    # H = −Σ (p/T)·ln(p/T) = ln T − (Σ p·ln p)/T, normalized by ln k
    h = (
        F.log(F.col("_tot")) - F.col("_plnp") / F.col("_tot")
    ) / F.lit(_math.log(k))
    return ent.select(
        "series",
        "n",
        "n_active",
        F.round(F.when(F.col("_tot") > 0, h), round_to).alias(
            "spectral_entropy"
        ),
        F.col("_dom.period").alias("dominant_period"),
    ).orderBy("series")


def runs_test(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Wald–Wolfowitz runs test per series — "is this sequence random
    around its median, or does it streak?": values above the series
    MEDIAN are +, below are − (exact-median values dropped, the
    standard rule), R counts the maximal same-sign runs, and under
    randomness

        E[R] = 2·n₁·n₂/(n₁+n₂) + 1,
        Var[R] = 2n₁n₂(2n₁n₂ − n₁ − n₂) / ((n₁+n₂)²(n₁+n₂−1)),

    reported as z = (R − E[R])/√Var[R] with the shared two-sided
    normal p.  Too few runs (z « 0) = positive serial dependence /
    regime clumping; too many (z » 0) = oscillation.  The quick
    pre-check before trusting :func:`ljung_box` lags or an
    :func:`acf` shape on a short series.

    Scale shape: the exact per-series median comes from ONE
    ``percentile`` aggregate (a sort-based aggregate per series —
    exact, matching the DuckDB oracle bit-for-bit; at raw-event scale
    feed an aggregated series or swap in approx_percentile and accept
    the oracle drift), broadcast back by a series-keyed join; the run
    count is one lag window over the same (series, order)
    partitioning — run boundaries are sign≠lag(sign) rows, so
    R = Σ boundaries + 1 per series.

    ``order_col`` must be unique per series or ``tiebreak_col``
    supplied.  Output per series: n_above, n_below, runs, z, p_value
    (NULL z/p when either sign is absent or Var = 0).
    """
    order = [F.col("ord")] + ([F.col("_tb")] if tiebreak_col else [])
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        F.col(value_col).cast("double").alias("_x"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    ).filter(F.col("_x").isNotNull())
    med = s.groupBy("series").agg(
        F.expr("percentile(_x, 0.5)").alias("_med")
    )
    signed = (
        s.join(med, "series")
        .filter(F.col("_x") != F.col("_med"))
        .withColumn("_sgn", (F.col("_x") > F.col("_med")).cast("int"))
    )
    w = Window.partitionBy("series").orderBy(*order)
    runs = signed.withColumn(
        "_brk",
        F.when(
            F.lag("_sgn").over(w).isNull()
            | (F.col("_sgn") != F.lag("_sgn").over(w)),
            1,
        ).otherwise(0),
    )
    agg = runs.groupBy("series").agg(
        F.sum("_sgn").cast("double").alias("_n1"),
        F.sum(1 - F.col("_sgn")).cast("double").alias("_n2"),
        F.sum("_brk").cast("double").alias("_r"),
    )
    # med covers EVERY series; agg only series with an off-median value
    # — left-join so an all-at-median series still emits a degenerate
    # row (0, 0, 0, NULL z) instead of vanishing.
    agg = med.select("series").join(agg, "series", "left").select(
        "series",
        F.coalesce("_n1", F.lit(0.0)).alias("_n1"),
        F.coalesce("_n2", F.lit(0.0)).alias("_n2"),
        F.coalesce("_r", F.lit(0.0)).alias("_r"),
    )
    n1, n2, r = F.col("_n1"), F.col("_n2"), F.col("_r")
    # NULL-guarded denominator: a degenerate series (every value at
    # the median) reaches this with n = 0 or 1, and under ANSI mode a
    # bare division by zero errors even inside an unchosen WHEN branch
    # (codegen evaluates eagerly — the oneway_anova note).
    n = F.when(n1 + n2 > 1, n1 + n2)
    mean_r = 2.0 * n1 * n2 / n + 1.0
    var_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (n * n * (n - 1.0))
    )
    z = F.when((n1 > 0) & (n2 > 0) & (var_r > 0), (r - mean_r) / F.sqrt(var_r))
    from knot_another_pipeline_spark.operators.quality import (
        normal_sf_two_sided,
    )

    return agg.select(
        "series",
        n1.cast("bigint").alias("n_above"),
        n2.cast("bigint").alias("n_below"),
        r.cast("bigint").alias("runs"),
        F.round(z, round_to).alias("z"),
        F.round(normal_sf_two_sided(z), round_to).alias("p_value"),
    ).orderBy("series")


def seasonal_strength(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    period: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """STL-style seasonal and trend STRENGTH per series (Hyndman's
    tsfeatures definitions, on a moving-average decomposition):

        trend_t     = centered MA of y over one period,
        detrended_t = y_t − trend_t,
        seasonal_j  = mean(detrended | t mod period = j),
        remainder_t = detrended_t − seasonal_{t mod period},
        F_seasonal  = max(0, 1 − Var(remainder)/Var(detrended)),
        F_trend     = max(0, 1 − Var(remainder)/Var(y − seasonal)).

    The two numbers that decide a forecasting pipeline's shape: high
    F_seasonal → :func:`seasonal_naive_error`'s baseline is strong;
    high F_trend → :func:`holt_forecast`'s level/trend terms matter.

    CONTRACT: ``order_col`` must be a DENSE integer index per series
    (day number, hour number — no gaps), because the centered MA is a
    ROW window; feed an aggregated, gap-filled series.  Edge rows use
    the partial window (the standard simple-MA convention, identical
    in the DuckDB oracle's ROWS BETWEEN frame).

    Scale shape: one (series, order) row window for the MA (one
    shuffle), one (series, phase) window for the seasonal means (a
    second shuffle on the compound key), then ONE variance aggregate
    per series.  No joins, no per-phase passes; partitions are
    per-series aggregated rows.

    Output per series: n, seasonal_strength, trend_strength (NULL
    when the detrended / deseasonalized variance is zero).
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    half = period // 2
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).cast("long").alias("ord"),
        F.col(value_col).cast("double").alias("_y"),
    ).filter(F.col("_y").isNotNull() & F.col("ord").isNotNull())
    w_ma = (
        Window.partitionBy("series")
        .orderBy("ord")
        .rowsBetween(-half, half)
    )
    detr = s.withColumn(
        "_trend", F.avg("_y").over(w_ma)
    ).withColumn("_detr", F.col("_y") - F.col("_trend")).withColumn(
        "_phase", F.pmod(F.col("ord"), F.lit(int(period)))
    )
    w_ph = Window.partitionBy("series", "_phase")
    comp = detr.withColumn(
        "_seas", F.avg("_detr").over(w_ph)
    ).withColumn("_rem", F.col("_detr") - F.col("_seas"))
    agg = comp.groupBy("series").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.var_pop("_rem").alias("_vr"),
        F.var_pop("_detr").alias("_vd"),
        F.var_pop(F.col("_y") - F.col("_seas")).alias("_vt"),
    )
    return agg.select(
        "series",
        "n",
        F.round(
            F.when(
                F.col("_vd") > 0,
                F.greatest(F.lit(0.0), 1.0 - F.col("_vr") / F.col("_vd")),
            ),
            round_to,
        ).alias("seasonal_strength"),
        F.round(
            F.when(
                F.col("_vt") > 0,
                F.greatest(F.lit(0.0), 1.0 - F.col("_vr") / F.col("_vt")),
            ),
            round_to,
        ).alias("trend_strength"),
    ).orderBy("series")


def control_chart(
    df: DataFrame,
    *,
    series_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Shewhart individuals chart with the four classic Western
    Electric run rules per series — the SPC readout operations teams
    actually page on, catching both spikes and the slow drifts a
    single 3σ limit misses:

        R1: one point beyond 3σ,
        R2: 2 of 3 consecutive beyond 2σ on the SAME side,
        R3: 4 of 5 consecutive beyond 1σ on the same side,
        R4: 8 consecutive points on the same side of the center line.

    Center/σ come from the series itself (mean and population σ of
    all points — the retrospective-chart convention; feed a
    calibration slice when you need a frozen baseline), computed from
    moment sums so both engines evaluate the identical arithmetic.

    Scale shape: one moment aggregate per series joined back
    series-keyed, then ONE ordered window pass computing every rule
    from trailing ROW frames over ±1σ/±2σ/side indicator columns — no
    self-joins, no per-rule passes; partitions are per-series
    pre-aggregated rows (the :func:`page_hinkley` contract).

    Output per series: n, mean, sigma, n_r1..n_r4 (points FLAGGED at
    each rule — the point completing the run), n_flagged (any rule),
    first_flag_ord (NULL when clean; σ = 0 series flag nothing).
    """
    order = [F.col("ord")] + ([F.col("_tb")] if tiebreak_col else [])
    s = df.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        F.col(value_col).cast("double").alias("_x"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    ).filter(F.col("_x").isNotNull())
    mom = s.groupBy("series").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    mean = F.col("_sx") / F.col("_n")
    var = F.col("_sxx") / F.col("_n") - mean * mean
    stats = mom.select(
        "series",
        mean.alias("_mu"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sig"),
        F.col("_n").cast("bigint").alias("n"),
    )
    z = (F.col("_x") - F.col("_mu")) / F.col("_sig")
    tagged = (
        s.join(stats, "series")
        .filter(F.col("_sig") > 0)
        .withColumn("_z", z)
        .withColumn("_up", (F.col("_z") > 0).cast("int"))
        .withColumn("_p2", (F.col("_z") > 2).cast("int"))
        .withColumn("_m2", (F.col("_z") < -2).cast("int"))
        .withColumn("_p1", (F.col("_z") > 1).cast("int"))
        .withColumn("_m1", (F.col("_z") < -1).cast("int"))
    )
    w = Window.partitionBy("series").orderBy(*order)
    last3 = w.rowsBetween(-2, 0)
    last5 = w.rowsBetween(-4, 0)
    last8 = w.rowsBetween(-7, 0)
    flagged = (
        tagged.withColumn("_r1", F.abs(F.col("_z")) > 3)
        .withColumn(
            "_r2",
            (F.count(F.lit(1)).over(last3) >= 3)
            & (
                (F.sum("_p2").over(last3) >= 2)
                | (F.sum("_m2").over(last3) >= 2)
            ),
        )
        .withColumn(
            "_r3",
            (F.count(F.lit(1)).over(last5) >= 5)
            & (
                (F.sum("_p1").over(last5) >= 4)
                | (F.sum("_m1").over(last5) >= 4)
            ),
        )
        .withColumn(
            "_r4",
            (F.count(F.lit(1)).over(last8) >= 8)
            & (
                (F.sum("_up").over(last8) >= 8)
                | (F.sum("_up").over(last8) <= 0)
            ),
        )
        .withColumn(
            "_any",
            F.col("_r1") | F.col("_r2") | F.col("_r3") | F.col("_r4"),
        )
    )
    agg = flagged.groupBy("series").agg(
        F.max("_mu").alias("_muf"),
        F.max("_sig").alias("_sigf"),
        F.sum(F.col("_r1").cast("int")).cast("bigint").alias("n_r1"),
        F.sum(F.col("_r2").cast("int")).cast("bigint").alias("n_r2"),
        F.sum(F.col("_r3").cast("int")).cast("bigint").alias("n_r3"),
        F.sum(F.col("_r4").cast("int")).cast("bigint").alias("n_r4"),
        F.sum(F.col("_any").cast("int")).cast("bigint").alias("n_flagged"),
        F.min(F.when(F.col("_any"), F.col("ord"))).alias("first_flag_ord"),
    )
    # re-attach series with sigma = 0 (they flag nothing by contract)
    return (
        stats.join(agg, "series", "left")
        .select(
            "series",
            "n",
            F.round(F.col("_mu"), round_to).alias("mean"),
            F.round(F.col("_sig"), round_to).alias("sigma"),
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
                for c in ("n_r1", "n_r2", "n_r3", "n_r4", "n_flagged")
            ],
            F.col("first_flag_ord"),
        )
        .orderBy("series")
    )


def peak_detection(
    df: DataFrame,
    *,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    min_value: float = 0.0,
    min_prominence_ratio: float = 0.0,
    round_to: int = 6,
) -> DataFrame:
    """Local-maximum peak detection over per-series ordered values —
    the "which days spiked?" readout feeding anomaly triage and
    seasonality eyeballing, complementing the alarm family
    (``cusum_alarm`` / ``ewma_alarm`` flag level SHIFTS; this flags
    individual summits).

    A point is a peak when it is strictly greater than BOTH neighbors
    (series endpoints never qualify — no one-sided inference), its
    value is ≥ ``min_value``, and its prominence proxy
    ``value / max(prev, next)`` is ≥ ``1 + min_prominence_ratio``
    (e.g. 0.2 → at least 20% above the taller shoulder).  Strict
    inequalities make plateaus peakless — deterministic, no
    tie-direction convention to disagree on across engines.

    Scale shape: one per-series lag/lead window (series-partitioned —
    never a global sort) and a row-local predicate; output rows are
    only the peaks.  At 100 TB the cost is the series shuffle, the
    same exchange every other per-series temporal op here rides.

    Output: series cols, ts, value, prev_value, next_value,
    prominence_ratio — peaks only, ordered by series then ts.
    """
    s = df.select(
        *[F.col(c) for c in series_cols],
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_ts").isNotNull() & F.col("_v").isNotNull())
    gp = [F.col(c) for c in series_cols]
    w = Window.partitionBy(*gp).orderBy("_ts")
    lagged = s.select(
        *series_cols,
        "_ts",
        "_v",
        F.lag("_v").over(w).alias("_prev"),
        F.lead("_v").over(w).alias("_next"),
    )
    shoulder = F.greatest(F.col("_prev"), F.col("_next"))
    is_peak = (
        F.col("_prev").isNotNull()
        & F.col("_next").isNotNull()
        & (F.col("_v") > F.col("_prev"))
        & (F.col("_v") > F.col("_next"))
        & (F.col("_v") >= F.lit(float(min_value)))
        & (
            F.col("_v")
            >= shoulder * F.lit(1.0 + float(min_prominence_ratio))
        )
    )
    return (
        lagged.filter(is_peak)
        .select(
            *series_cols,
            F.col("_ts").alias("ts"),
            F.round("_v", round_to).alias("value"),
            F.round("_prev", round_to).alias("prev_value"),
            F.round("_next", round_to).alias("next_value"),
            F.round(F.col("_v") / shoulder, round_to).alias(
                "prominence_ratio"
            ),
        )
        .orderBy(*series_cols, "ts")
    )


def gumbel_maxima(
    df: DataFrame,
    *,
    series_col: str,
    ts_col: str,
    value_col: str,
    block: str = "month",
    return_p: float = 0.99,
    round_to: int = 6,
) -> DataFrame:
    """Block-maxima Gumbel fit per series — the extreme-value answer to
    "what's the worst value we should expect per year?" that
    :func:`~.quality.hill_tail_index` (tail SHAPE) and plain
    percentiles (within-sample only) cannot give: take each block's
    (default calendar month's) maximum, fit Gumbel(μ, β) by method of
    moments (``β = s·√6/π``, ``μ = m − γ_E·β`` with the
    Euler–Mascheroni γ_E), and report the ``return_p`` return level
    ``μ − β·ln(−ln(p))`` — the level exceeded in a block with
    probability 1−p.

    Moments, not MLE: closed-form, deterministic, replayable in any
    SQL engine — the house rule for every fitted statistic here
    (:func:`dickey_fuller`'s OLS, ``eb_shrinkage``'s Beta MoM).

    Scale shape: one (series, block) hash aggregate — the block
    maxima table, ~n_series×n_blocks rows regardless of input size —
    then one per-series moment aggregate.  No window at all; the scan
    dominates at 100 TB.  Series with fewer than 2 blocks (no sample
    s.d.) or zero variance emit NULL fit columns.

    Output per series: series, n_blocks, mean_max, sd_max,
    gumbel_loc, gumbel_scale, return_level.
    """
    import math as _math

    if not (0.0 < return_p < 1.0):
        raise ValueError(f"return_p must be in (0, 1), got {return_p}")
    euler_gamma = 0.5772156649015329
    sqrt6_over_pi = 0.7796968012336293  # sqrt(6)/pi
    blocks = (
        df.select(
            F.col(series_col).alias("series"),
            F.date_trunc(block, F.col(ts_col).cast("timestamp")).alias(
                "_blk"
            ),
            F.col(value_col).cast("double").alias("_v"),
        )
        .filter(F.col("_v").isNotNull() & F.col("_blk").isNotNull())
        .groupBy("series", "_blk")
        .agg(F.max("_v").alias("_mx"))
    )
    agg = blocks.groupBy("series").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.avg("_mx").alias("_m"),
        F.stddev_samp("_mx").alias("_s"),
    )
    ok = (F.col("n_blocks") >= 2) & (F.col("_s") > 0)
    scale = F.when(ok, F.col("_s") * F.lit(sqrt6_over_pi))
    loc = F.col("_m") - F.lit(euler_gamma) * scale
    rl = loc - scale * F.lit(_math.log(-_math.log(return_p)))
    return agg.select(
        "series",
        "n_blocks",
        F.round("_m", round_to).alias("mean_max"),
        F.round(F.when(ok, F.col("_s")), round_to).alias("sd_max"),
        F.round(loc, round_to).alias("gumbel_loc"),
        F.round(scale, round_to).alias("gumbel_scale"),
        F.round(rl, round_to).alias("return_level"),
    ).orderBy("series")


def engle_granger(
    df: DataFrame,
    *,
    order_col: str,
    y_col: str,
    x_col: str,
    group_cols: list[str] | None = None,
    crit_5pct: float = -3.34,
    round_to: int = 6,
) -> DataFrame:
    """Engle–Granger two-step cointegration readout per group: OLS
    ``y = α + β·x`` (closed form from moment sums), then a no-drift
    Dickey–Fuller regression of Δr on r_{t−1} over the residuals —
    the test for "do these two series share a common stochastic
    trend?" that correlation cannot answer (two independent random
    walks correlate spuriously; they never cointegrate).  The ADF
    t-stat is compared to the Engle–Granger 5% critical value (−3.34
    for the constant-included first stage, MacKinnon), not a normal
    quantile — same fixed-α contract as :func:`dickey_fuller`.

    Scale shape: one hash aggregate for the OLS moments, a broadcast
    join of the per-group (α, β) row back onto the pairs, one lag
    window per group for Δr, one closing moment aggregate — two
    narrow shuffles total, everything else row-local algebra.

    Output per group (single row ungrouped): n, beta, alpha, adf_t,
    cointegrated_5pct (NULL stats when n < 4 or a degenerate x).
    """
    gcols = list(group_cols or [])
    s = df.select(
        *[F.col(c) for c in gcols],
        F.col(order_col).alias("_ord"),
        F.col(y_col).cast("double").alias("_y"),
        F.col(x_col).cast("double").alias("_x"),
    ).filter(F.col("_y").isNotNull() & F.col("_x").isNotNull())
    mom = s.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    sxx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / F.col("_n")
    sxy = F.col("_sxy") - F.col("_sx") * F.col("_sy") / F.col("_n")
    beta = F.when((F.col("_n") >= 4) & (sxx > 0), sxy / sxx)
    coef = mom.select(
        *gcols,
        beta.alias("_beta"),
        (F.col("_sy") / F.col("_n")
         - beta * F.col("_sx") / F.col("_n")).alias("_alpha"),
        F.col("_n").cast("bigint").alias("n"),
    )
    joined = (
        s.join(F.broadcast(coef), gcols) if gcols
        else s.crossJoin(F.broadcast(coef))
    )
    resid = joined.select(
        *gcols,
        "_ord",
        "n",
        "_beta",
        "_alpha",
        (
            F.col("_y") - F.col("_alpha") - F.col("_beta") * F.col("_x")
        ).alias("_r"),
    )
    w = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy("_ord")
    lagged = resid.withColumn("_rlag", F.lag("_r").over(w)).filter(
        F.col("_rlag").isNotNull()
    )
    adf = lagged.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("double").alias("_m"),
        F.sum(F.col("_rlag") * (F.col("_r") - F.col("_rlag"))).alias(
            "_srd"
        ),
        F.sum(F.col("_rlag") * F.col("_rlag")).alias("_srr"),
        F.sum(
            (F.col("_r") - F.col("_rlag")) * (F.col("_r") - F.col("_rlag"))
        ).alias("_sdd"),
    )
    # Degenerate-family contract: a group too short (or with a NULL
    # first-stage fit — every residual NULL, so no lag pairs survive)
    # must still emit its row with NULL stats, never vanish.  The
    # coefficient table carries every group, so it anchors a left join.
    if gcols:
        out = coef.join(adf, gcols, "left")
    else:
        out = coef.withColumn("_k", F.lit(1)).join(
            adf.withColumn("_k", F.lit(1)), "_k", "left"
        )
    gamma = F.col("_srd") / F.col("_srr")
    rss = F.col("_sdd") - gamma * F.col("_srd")
    se = F.sqrt(rss / (F.col("_m") - 1.0) / F.col("_srr"))
    ok = (F.col("_m") >= 3) & (F.col("_srr") > 0)
    t = F.when(ok & (se > 0), gamma / se)
    sel = [
        *gcols,
        F.col("n"),
        F.round("_beta", round_to).alias("beta"),
        F.round("_alpha", round_to).alias("alpha"),
        F.round(t, round_to).alias("adf_t"),
        (t < F.lit(float(crit_5pct))).alias("cointegrated_5pct"),
    ]
    out = out.select(*sel)
    return out.orderBy(*gcols) if gcols else out
