"""General relational operator coverage on the star-schema catalog.

The reference's SQL surface (SURVEY §2.2-2.6) is scans → filters → scalar
exprs → equi/self/semi joins → hash aggregates → sort/limit. These
queries exercise that inventory on the driver's TPC-H-ish tables, written
the way one would for a 1000-executor cluster:

- dimension tables are explicitly ``broadcast()`` (region/nation/customer
  sides) so fact scans never shuffle for them;
- aggregations run as partial+final hash aggregates (automatic);
- top-k uses orderBy().limit() → TakeOrderedAndProject (no global sort);
- filters sit directly on scan columns so Catalyst pushes them into the
  parquet reader.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def pricing_summary(lineitem: DataFrame, *, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical scan→filter→hash-agg
    pattern (reference analog: hourly rollup A1)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, *, k: int = 20
) -> DataFrame:
    """Revenue per customer with broadcast dimension joins + top-k."""
    revenue = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "order_revenue"
            )
        )
    )
    joined = orders.join(revenue, orders.o_orderkey == revenue.l_orderkey).join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    )
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("order_revenue"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def regional_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5-shaped multi-join: fact table joins to broadcast dims;
    customer and supplier must share the nation (extra equi constraint)."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("lineitem_count"),
        )
        .orderBy(F.col("r_name").asc(), F.col("revenue").desc())
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join (the reference's IN-subquery cohort filter, J3)."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join — NOT EXISTS."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def top_order_per_customer(orders: DataFrame, *, per: int = 1) -> DataFrame:
    """Window ranking: highest-value order(s) per customer
    (row_number over partitioned desc sort — SURVEY §2.4 note: the one
    windowed operator the reference contracts mandate)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")
        .orderBy("o_custkey", "rn")
    )


def sessionize(
    events: DataFrame,
    *,
    uid_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the previous
    event of the same user is more than ``gap_minutes`` older. One window
    partitioned by user (single shuffle on user_id); session ids are a
    running conditional sum — the standard lag+cumsum idiom.
    Output: uid, session_id, session_start, session_end, n_events."""
    # Order by (ts, uid) with a microsecond-integer gap comparison:
    # unix_micros is exact, unlike second-truncating unix_timestamp. It
    # only accepts TIMESTAMP, and parquet written without a timezone
    # (timestamp[us]) arrives as TIMESTAMP_NTZ — cast first. The cast
    # reads wall-clock in the SESSION timezone: under UTC (pinned by the
    # session factory) the offset is constant and cancels in the gap; a
    # DST-observing session tz would warp gaps across transitions.
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    w = Window.partitionBy(uid_col).orderBy(ts_col)
    gap = F.lit(gap_minutes * 60 * 1_000_000)
    with_breaks = events.withColumn(
        "new_session",
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                micros(ts_col)
                - F.unix_micros(F.lag(F.col(ts_col).cast("timestamp")).over(w))
                > gap
            ),
            1,
        ).otherwise(0),
    ).withColumn("session_seq", F.sum("new_session").over(w))
    return (
        with_breaks.groupBy(
            F.col(uid_col).alias("uid"), F.col("session_seq").alias("session_id")
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("uid", "session_id")
    )


def event_type_breakdown(events: DataFrame) -> DataFrame:
    """Conditional aggregation (CASE-WHEN pivot, reference P18 pattern):
    per-user counts of each event type in one pass."""
    types = ["click", "view", "purchase", "signup", "error"]
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in types
    ]
    return (
        events.groupBy(F.col("user_id").alias("uid"))
        .agg(*aggs, F.count(F.lit(1)).alias("n_total"))
        .orderBy("uid")
    )


def user_set_ops(events: DataFrame) -> DataFrame:
    """Set operators: users who purchased but never errored —
    EXCEPT-distinct (``subtract``), the classic build-a-cohort set op."""
    purchasers = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid")
    )
    error_users = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("uid")
    )
    return purchasers.subtract(error_users).orderBy("uid")


def upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: str | list[str],
    *,
    order_col: str | None = None,
) -> DataFrame:
    """MERGE-style upsert without a table format: rows from ``updates``
    replace same-key rows in ``existing``; unmatched update rows insert.

    The reference maintains gold tables by drop-and-recreate
    (``pipelines/refresh_gold_tables.py`` CTAS per refresh) — fine for
    full rebuilds, quadratically wasteful when a day's late data touches
    0.1% of keys. Without Delta/Iceberg ``MERGE INTO``, the scalable
    plain-parquet shape is union + latest-row-wins: one shuffle on the
    keys, no join (an outer-join MERGE shuffles both sides *and* builds
    join rows just to throw the old side away).

    ``order_col``: versioning column (e.g. an updated_at timestamp).
    When set, the highest value wins regardless of which side it came
    from — replaying an old batch cannot regress a newer row (idempotent
    re-ingestion). When None, ``updates`` rows always beat ``existing``
    (classic MERGE semantics). Among true duplicates the update side
    wins; ties within a side are broken arbitrarily-but-deterministically
    by the precedence column itself.

    Both frames must share the schema (checked). Scale: the single
    shuffle partitions by key; write the result with the same
    partitioning/bucketing as the target to keep downstream joins
    co-located.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if set(existing.columns) != set(updates.columns):
        raise ValueError(
            f"schemas differ: {sorted(existing.columns)} vs "
            f"{sorted(updates.columns)}"
        )
    tagged = existing.withColumn("_pref", F.lit(0)).unionByName(
        updates.select(*existing.columns).withColumn("_pref", F.lit(1))
    )
    # MERGE semantics: a NULL key never matches (NULL != NULL in SQL),
    # so NULL-key rows from both sides pass through untouched instead of
    # collapsing into one window group.
    key_valid = F.lit(True)
    for k in keys:
        key_valid = key_valid & F.col(k).isNotNull()
    order = [F.col("_pref").desc()]
    if order_col is not None:
        order.insert(0, F.col(order_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    deduped = (
        tagged.filter(key_valid)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return deduped.unionByName(tagged.filter(~key_valid)).drop("_pref")


def grouped_totals(
    df: DataFrame,
    group_cols: list[str],
    aggs: list,
    *,
    mode: str = "rollup",
) -> DataFrame:
    """Multi-grain aggregation in one pass: ROLLUP (hierarchical
    subtotals + grand total) or CUBE (every grouping-set combination).

    The reference's notebooks recompute each grain with a separate
    GROUP BY query (per-status, per-priority, overall); ROLLUP/CUBE
    compute all grains in ONE scan — Spark plans an Expand (one row copy
    per grouping set) feeding a single hash aggregate, so the input is
    read once instead of once per grain. At 100 TB that's the difference
    between one pass and N.

    Subtotal rows carry NULL in the rolled-up columns; ``grouping_id``
    disambiguates a subtotal NULL from a NULL data value (standard SQL
    GROUPING semantics, identical in any engine).
    """
    if mode not in ("rollup", "cube"):
        raise ValueError(f"mode must be rollup|cube, got {mode}")
    grouped = (
        df.rollup(*group_cols) if mode == "rollup" else df.cube(*group_cols)
    )
    return grouped.agg(
        F.grouping_id(*group_cols).cast("bigint").alias("grouping_id"), *aggs
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict,
    *,
    salt: int = 16,
    id_col: str | None = None,
) -> DataFrame:
    """Two-stage aggregation with manual key salting — for the skew AQE
    can't fix: a handful of giant groups (event types, status codes,
    the null bucket) where ONE reducer gets the whole group even after
    adaptive splitting of *partitions* (AQE splits skewed partitions,
    but a single group's final merge still lands on one task for
    non-algebraic plans; for algebraic aggs the fix is free).

    Stage 1 groups by (keys, salt) — the giant group fans out over
    ``salt`` reducers; stage 2 merges the ≤ salt partials per key.
    Supported agg specs (algebraic, i.e. mergeable): ``'count'``,
    ``'sum'``, ``'min'``, ``'max'``, ``'avg'`` (rewritten as sum+count
    so the merge is exact), keyed by output column name:
    ``salted_agg(df, ['k'], {'n': ('count', '*'), 's': ('sum', 'v'),
    'm': ('avg', 'v')})``.

    The salt column derives from ``id_col`` (md5-stable) when given,
    else from a row-local hash of ALL columns — shuffle-free either
    way, and row-local on purpose: a partition-derived salt
    (``spark_partition_id()``) silently collapses to a constant per
    group when the input is already partitioned by the group keys
    (directly downstream of a shuffle on the same keys), un-doing the
    giant-group fanout. The merged result is identical under any
    assignment (algebraic merge); only the fanout guarantee differs.
    """
    from knot_another_pipeline_spark.functions.hashing import stable_bucket

    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    salt_col = (
        stable_bucket(id_col, salt)
        if id_col
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    stage1_aggs, stage2_aggs, post = [], [], []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            # count('*') counts rows; count(col) skips NULLs — same
            # split SQL makes
            cnt = F.count(F.lit(1)) if col == "*" else F.count(col)
            stage1_aggs.append(cnt.alias(f"_{name}"))
            stage2_aggs.append(F.sum(f"_{name}").alias(name))
            post.append(F.col(name))
        elif fn == "sum":
            stage1_aggs.append(F.sum(col).alias(f"_{name}"))
            stage2_aggs.append(F.sum(f"_{name}").alias(name))
            post.append(F.col(name))
        elif fn == "min":
            stage1_aggs.append(F.min(col).alias(f"_{name}"))
            stage2_aggs.append(F.min(f"_{name}").alias(name))
            post.append(F.col(name))
        elif fn == "max":
            stage1_aggs.append(F.max(col).alias(f"_{name}"))
            stage2_aggs.append(F.max(f"_{name}").alias(name))
            post.append(F.col(name))
        elif fn == "avg":
            stage1_aggs.append(F.sum(col).alias(f"_{name}_s"))
            stage1_aggs.append(F.count(col).alias(f"_{name}_c"))
            stage2_aggs.append(F.sum(f"_{name}_s").alias(f"_{name}_s2"))
            stage2_aggs.append(F.sum(f"_{name}_c").alias(f"_{name}_c2"))
            post.append(
                (F.col(f"_{name}_s2") / F.col(f"_{name}_c2")).alias(name)
            )
        else:
            raise ValueError(f"unsupported (non-algebraic) agg: {fn}")
    stage1 = df.withColumn("_salt", salt_col).groupBy(*keys, "_salt").agg(
        *stage1_aggs
    )
    return stage1.groupBy(*keys).agg(*stage2_aggs).select(*keys, *post)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of a keyed table: which keys were added,
    removed, changed, or unchanged — the reconciliation step between
    warehouse refreshes (did the rebuild do what the incremental path
    claims?) and the change-feed for downstream caches.

    One full-outer join on the keys. Change detection compares an md5
    over the ``compare_cols`` (default: all shared non-key columns),
    null-sentineled so NULL≠'' and column boundaries can't alias —
    hashing keeps the join payload to one column per side regardless of
    table width, so the shuffle carries (keys + 16 bytes)×2, not the
    whole row.

    Output: keys, status ('added' | 'removed' | 'changed' |
    'unchanged'). Join the result back to either snapshot for payloads.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    cols = (
        list(compare_cols)
        if compare_cols is not None
        else sorted(
            (set(old.columns) & set(new.columns)) - set(keys)
        )
    )

    def _sig(df: DataFrame, side: str) -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in cols
                ],
            )
        )
        return df.select(*keys, h.alias(f"_h_{side}"))

    joined = _sig(old, "old").join(_sig(new, "new"), keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    *,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
    fanout: int = 16,
    allow_nonunique_order: bool = False,
) -> DataFrame:
    """Top-k rows per group, skew-safe: the plain
    ``row_number() OVER (PARTITION BY keys ORDER BY ...)`` sorts each
    group on ONE task — fine for many small groups, a single-task wall
    for a few giant ones (the event-log shape: one bot user with 10⁸
    rows). This runs the two-stage tournament instead: stage 1 ranks
    within ``fanout`` deterministic subgroups in parallel and keeps k
    from each, stage 2 ranks the ≤ fanout·k survivors per group — so no
    task ever sorts more than max(subgroup, fanout·k) rows.

    Subgroup assignment hashes ``tiebreak`` so it is deterministic
    across runs and retries AND fans out even when ``order_col`` has few
    distinct values (integer scores, status codes): hashing a
    low-cardinality order column would land every row of a hot group in
    a handful of subgroups and silently rebuild the single-task sort
    this operator exists to avoid. ``tiebreak`` (a unique id) is
    therefore REQUIRED unless ``allow_nonunique_order=True``, in which
    case the subgroup hash falls back to all columns (row-local, still
    deterministic) and equal-valued rows at the k boundary are chosen
    arbitrarily. ``tiebreak`` also breaks order ties, making the result
    identical to the plain window — which is exactly what the catalog
    oracle checks.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if fanout < 1:
        raise ValueError(f"fanout must be >= 1, got {fanout}")
    if tiebreak is None and not allow_nonunique_order:
        raise ValueError(
            "grouped_topk needs tiebreak=<unique id column>: without it the "
            "subgroup hash degenerates when order_col repeats and boundary "
            "ties are nondeterministic; pass allow_nonunique_order=True to "
            "accept both"
        )
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tiebreak:
        order.append(
            F.col(tiebreak).desc() if descending else F.col(tiebreak).asc()
        )
    sub_cols = (
        [F.col(tiebreak)] if tiebreak else [F.col(c) for c in df.columns]
    )
    sub = F.pmod(F.xxhash64(*sub_cols), F.lit(fanout))
    w1 = Window.partitionBy(*keys, "_sub").orderBy(*order)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_sub", sub)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_sub", "_rn")
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: str | list[str],
    *,
    op_col: str = "op",
    order_col: str,
    delete_ops: tuple[str, ...] = ("D", "d", "delete"),
) -> DataFrame:
    """Apply a change-data-capture log (insert/update/delete events) to a
    keyed snapshot and return the new snapshot — the general form of
    :func:`upsert` for sources that also emit deletes (database CDC
    feeds, takedown/right-to-be-forgotten streams against a training
    corpus).

    Per key, the change with the highest ``order_col`` (LSN / commit
    version / event time) decides the outcome: a delete removes the key,
    anything else replaces the row with the change's payload; keys with
    no changes keep their snapshot row. Changes always beat the snapshot
    (the snapshot is by definition older than its change feed).

    Plan: union + one window over ONE hash shuffle on the keys — the
    same no-join shape as :func:`upsert` (an outer-join MERGE shuffles
    both sides and manufactures join rows just to discard the losers).
    Replays are idempotent: re-applying an already-applied change log
    yields the same table, and an old change can never beat a newer one.

    ``changes`` must carry the snapshot's columns (the payload) plus
    ``op_col`` and ``order_col``. Delete rows may carry NULL payload
    columns. NULL-key snapshot rows pass through untouched (SQL MERGE
    semantics: NULL never matches); NULL-key or NULL-order change rows
    are invalid and dropped. Ties at identical (key, order) between two
    changes are broken by preferring the delete (a takedown beats a
    concurrent edit), then arbitrarily-but-deterministically by payload
    hash.
    Output: the snapshot's columns.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    payload = list(snapshot.columns)
    missing = [c for c in (*payload, op_col, order_col) if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    order_type = dict(changes.dtypes)[order_col]

    key_valid = F.lit(True)
    for k in keys:
        key_valid = key_valid & F.col(k).isNotNull()

    snap = snapshot.select(
        *payload,
        F.lit(None).cast("string").alias("_op"),
        F.lit(None).cast(order_type).alias("_ord"),
        F.lit(0).alias("_chg"),
    )
    chg = (
        changes.filter(key_valid & F.col(order_col).isNotNull())
        .select(
            *payload,
            F.col(op_col).cast("string").alias("_op"),
            F.col(order_col).alias("_ord"),
            F.lit(1).alias("_chg"),
        )
    )
    is_del = F.col("_op").isin(*delete_ops)
    w = Window.partitionBy(*keys).orderBy(
        F.col("_chg").desc(),
        F.col("_ord").desc_nulls_last(),
        is_del.cast("int").desc(),
        F.xxhash64(*[F.col(c) for c in payload]).asc(),
    )
    merged = (
        snap.unionByName(chg)
        .withColumn(
            "_rn",
            F.when(key_valid, F.row_number().over(w)).otherwise(F.lit(1)),
        )
        .filter(F.col("_rn") == 1)
        .filter(~((F.col("_chg") == 1) & is_del))
    )
    return merged.select(*payload)


def pivot_wide(
    df: DataFrame,
    group_cols: str | list[str],
    pivot_col: str,
    pivot_values: list[str],
    *,
    agg: Column | None = None,
) -> DataFrame:
    """Long→wide pivot with an EXPLICIT value list.

    The reference's notebooks hand-write CASE-WHEN pivots per event type
    (the P18 conditional-flag pattern); this is the general form. Passing
    ``pivot_values`` matters at scale: ``pivot(col)`` with no values runs
    an extra distinct job over the whole input to discover the columns,
    then keeps ALL of them (unbounded width on dirty data). With the list
    given, Catalyst rewrites the pivot into a single hash aggregate of
    ``len(pivot_values)`` conditional aggregates — one shuffle on the
    group keys, map-side partials, no discovery pass.

    ``agg`` defaults to ``count(1)``; absent (group, value) combinations
    come out NULL (same as SQL's ``sum(CASE WHEN ...)``), so the result
    is bit-comparable with the CASE-WHEN formulation.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    gb = df.groupBy(*group_cols).pivot(pivot_col, pivot_values)
    return gb.agg(agg if agg is not None else F.count(F.lit(1)))


def unpivot_long(
    df: DataFrame,
    id_cols: str | list[str],
    value_cols: list[str],
    *,
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long melt via the native ``unpivot`` (Expand) operator.

    One pass, no shuffle at all: Expand emits ``len(value_cols)`` rows
    per input row inside the same stage, exactly like the SQL
    ``UNION ALL`` of per-column selects but with ONE scan instead of
    ``len(value_cols)`` scans — at 100 TB the difference is the whole
    job. Values are cast to a common type by the engine; cast them
    yourself first if you need a specific one.
    """
    if isinstance(id_cols, str):
        id_cols = [id_cols]
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )


def skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join for skewed keys (large × medium, both above the
    broadcast threshold).

    A plain shuffle join sends EVERY row of a hot key to one reducer —
    one straggler task runs as long as the biggest key is large, and at
    100 TB a single hot entity (one chatty vessel, one boilerplate
    document hash) can hold the whole stage. The classic fix, expressed
    declaratively:

    - left rows get a row-local salt in [0, salt) derived from
      ``xxhash64`` of the whole row — NOT ``rand()`` (breaks retry
      determinism) and NOT ``spark_partition_id()`` (collapses to a
      constant when the input is already partitioned by the join keys,
      the salted_agg lesson);
    - right rows replicate ``salt``× via a row-local
      ``explode(sequence())`` — an Expand in the same stage, no extra
      scan;
    - the join is then a plain equi-join on (keys…, salt): each hot key
      fans out over ``salt`` reducers.

    Result rows are identical to the unsalted join (each left row meets
    each matching right row exactly once — in its own salt bucket).
    Spark's AQE skew split (``skewJoin.enabled``, on in the session
    factory) solves the same problem reactively by splitting oversized
    partitions; explicit salting still wins when one KEY (not one
    partition) dominates, because AQE cannot split a single key's hash
    bucket across reducers for a sort-merge join.

    Only ``inner`` and ``left`` joins are supported: replicating the
    right side would duplicate right-outer unmatched rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} missing from an input")
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("inputs already carry a _salt column")
    salted_left = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(salted_right, keys + ["_salt"], how)
    return out.drop("_salt")


def reaggregate(
    df: DataFrame,
    group_cols: str | list[str],
    *,
    count_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Merge pre-aggregated partials to a coarser grain without touching
    raw data: counts and sums re-sum, mins re-min, maxes re-max.

    This is the incremental-rollup primitive: at 100 TB you materialize
    per-day partials once and answer month/quarter/lifetime questions by
    re-aggregating the partial table (days × groups rows), never
    re-scanning the raw events. Only works for ALGEBRAIC aggregates —
    count/sum/min/max (and avg as sum÷count at read time); never feed it
    averages, distinct counts, or percentiles, which do not compose
    (combine KMV/HLL sketches for those instead — operators/quality.py
    kmv_distinct).

    Column names are preserved, so a daily partial table re-aggregates
    to monthly with the same schema minus the finer time column.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    aggs = (
        [F.sum(c).alias(c) for c in (count_cols or [])]
        + [F.sum(c).alias(c) for c in (sum_cols or [])]
        + [F.min(c).alias(c) for c in (min_cols or [])]
        + [F.max(c).alias(c) for c in (max_cols or [])]
    )
    if not aggs:
        raise ValueError("no partial-aggregate columns given")
    return df.groupBy(*group_cols).agg(*aggs)


def ntile_assign(
    df: DataFrame,
    order_col: str,
    *,
    n: int = 10,
    partition_cols: str | list[str] | None = None,
    tiebreak: str | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Equal-count quantile buckets (NTILE): rank rows within each
    partition by ``order_col`` and deal them into ``n`` buckets of
    near-equal size — decile/percentile labeling for curriculum
    sampling, quality tiers, per-language length bands.

    One shuffle on the partition keys; within each partition the sort is
    the cost, so PARTITIONED ntile scales with the largest group, not the
    corpus. For a GLOBAL bucket label over billions of rows don't use
    ntile(1 partition) — that serializes the corpus through one task; use
    the distributed ``percentile_rank`` shape instead
    (operators/sampling.py length_percentile_rank query) and floor it.

    ``tiebreak`` (a unique column) makes bucket boundaries deterministic
    when ``order_col`` has duplicates — same lesson as grouped_topk.
    """
    parts = (
        []
        if partition_cols is None
        else [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    order = [F.col(order_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*parts).orderBy(*order)
    return df.withColumn(out_col, F.ntile(n).over(w))


def global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    *,
    rank_col: str = "rank",
) -> DataFrame:
    """Dense global row number 1..N under a TOTAL order — withOUT the
    single-partition ``row_number() OVER (ORDER BY …)`` window that
    funnels the whole table through one task.

    The classic distributed ranking recipe: (1) ``repartitionByRange``
    on the order columns (range partitions are globally ordered
    relative to each other), (2) count rows per partition — a
    partition-count-sized table — and take its exclusive prefix sum
    (the only single-partition window, over ≤ shuffle-partitions rows),
    (3) broadcast the offsets back and add a WITHIN-partition
    row_number. Every stage's per-task work is bounded by its
    partition, so the rank of a 10-billion-row table costs one range
    shuffle + one local sort, not a global sort on one executor.

    ``order_cols`` must define a total order (include a unique
    tiebreaker) — otherwise ties make the rank assignment
    partition-order nondeterministic, the same contract as
    ``grouped_topk``'s tiebreak.

    The range-partitioned frame is pinned with an eager
    ``localCheckpoint`` before the pid is read: the offsets branch and
    the ranking branch would otherwise each instantiate the range
    exchange (whose bounds come from sampling), and any divergence —
    exchange reuse disabled, AQE coalescing one consumer differently —
    silently pairs offsets with the WRONG partitions. The checkpoint
    makes both branches read one materialized partitioning. Cost: one
    materialization of the input — which for this operator's intended
    inputs (aggregated count/score tables, e.g. a vocabulary) is
    orders of magnitude smaller than the corpus; rank raw events
    through a pre-aggregation first.

    Output: input columns + ``rank_col``.
    """
    cols = list(order_cols)
    if not cols:
        raise ValueError("order_cols must not be empty")
    if rank_col in df.columns:
        raise ValueError(f"rank_col {rank_col!r} collides with input column")
    parts = (
        df.repartitionByRange(*cols)
        .localCheckpoint(eager=True)
        .withColumn("_gr_pid", F.spark_partition_id())
    )
    counts = parts.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("_gr_n"))
    w_off = Window.orderBy(F.col("_gr_pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_gr_off", F.coalesce(F.sum("_gr_n").over(w_off), F.lit(0))
    ).select("_gr_pid", "_gr_off")
    w_local = Window.partitionBy("_gr_pid").orderBy(*cols)
    return (
        parts.join(F.broadcast(offsets), "_gr_pid")
        .withColumn(
            rank_col, F.col("_gr_off") + F.row_number().over(w_local)
        )
        .drop("_gr_pid", "_gr_off")
    )


def bloom_filter_build(
    keys: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 17,
    num_hashes: int = 4,
) -> list[int]:
    """Build a Bloom filter over a key set and return it as a compact
    list of 32-bit words — the classic BIG-JOIN PRUNING primitive: a
    10⁷-key dimension compresses to a few hundred KB that rides to
    every executor, so a 100 TB fact table is pre-filtered IN THE SCAN
    (``bloom_filter_probe``) instead of shuffling all of it into a join
    that discards most rows. False positives only (rate ≈
    ``(1 − e^(−k·n/m))^k`` — size ``num_bits`` ≈ 10×|keys| for ~1–2%),
    never false negatives, so the exact join that follows sees a
    superset and total semantics are unchanged.

    Hash family is md5-derived (``int(md5(f"{i}:{key}")[:15], 16)``
    — the engine's standard portable hash), so the identical filter is
    constructible in any engine with md5(): the DuckDB oracle replays
    the same bit math, making even this probabilistic structure
    hash-differential-testable. Bits pack into 32-bit words via ONE
    ``bit_or`` aggregate over the exploded (word, mask) pairs — the
    only shuffle is ≤ ``num_bits/32`` rows — and the word table is
    collected to the driver (num_bits/32 ints; 2¹⁷ bits = 16 KB).

    Returns the dense word list (index = bit // 32).
    """
    from knot_another_pipeline_spark.functions.hashing import hash_hex

    if num_bits < 32 or num_bits % 32 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 32")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    bits = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.conv(hash_hex(key_col, seed=i), 16, 10).cast(
                            "long"
                        ),
                        F.lit(num_bits),
                    )
                    for i in range(num_hashes)
                ]
            )
        ).alias("bit")
    )
    words = (
        bits.select(
            (F.col("bit") / 32).cast("int").alias("w"),
            # shiftleft with a COLUMN amount needs the SQL form — the
            # Python API only takes a literal shift count
            F.expr("shiftleft(1, cast(bit % 32 AS int))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    dense = [0] * (num_bits // 32)
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_filter_probe(
    df: DataFrame,
    key_col: str,
    bloom_words: list[int],
    *,
    num_hashes: int = 4,
) -> DataFrame:
    """Keep rows whose key is POSSIBLY in the Bloom filter built by
    :func:`bloom_filter_build` — the scan-side pre-filter: every bit
    test is pure codegen against a broadcast 1-row word array, so the
    fact table is pruned before any shuffle and rows for absent keys
    never leave the scan stage. Output is a SUPERSET of the true
    matches (false-positive rate set at build time); follow with the
    exact join for final semantics.
    """
    num_bits = 32 * len(bloom_words)
    spark = df.sparkSession
    arr = spark.createDataFrame(
        [(bloom_words,)], "_bloom: array<int>"
    )
    probe = df.crossJoin(F.broadcast(arr))
    from knot_another_pipeline_spark.functions.hashing import hash_hex

    cond = F.lit(True)
    for i in range(num_hashes):
        bit = F.pmod(
            F.conv(hash_hex(key_col, seed=i), 16, 10).cast("long"),
            F.lit(num_bits),
        )
        probe = probe.withColumn(f"_b{i}", bit)
        cond = cond & F.expr(
            f"(element_at(_bloom, cast(_b{i} / 32 AS int) + 1)"
            f" & shiftleft(1, cast(_b{i} % 32 AS int))) != 0"
        )
    return probe.filter(cond).drop(
        "_bloom", *[f"_b{i}" for i in range(num_hashes)]
    )


def basket_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket_size: int = 200,
    round_to: int = 6,
) -> DataFrame:
    """Market-basket association rules: for every ordered pair of items
    co-occurring in a basket, the co-occurrence count and the three
    classic rule metrics — support = P(a,b), confidence = P(b|a), lift
    = P(a,b)/(P(a)·P(b)).  The "customers who bought X also bought Y"
    reduction (recommendations, cross-sell, query-expansion over tag
    sets) the reference's aggregate charts cannot express.

    Plan shape, biggest-first:

    1. ONE basket-key aggregate collects each basket's DISTINCT items
       into a posting list (``collect_set`` — presence, not quantity,
       is what the metrics are defined over, and the set semantics IS
       the dedup, so no separate distinct shuffle).
    2. A per-basket size guard DROPS baskets with more than
       ``max_basket_size`` distinct items (a row-local ``size()``
       filter on the posting list — the window the self-join
       formulation needed is gone).  The pair fanout is size²/basket;
       one degenerate mega-basket (a crawler account, a default/test
       user) would otherwise emit billions of pairs from a single
       task.  The cap is the documented dial — the same guard family
       as the dedup operators' df-cap — and dropped baskets are
       whole-basket drops, so the metrics stay internally consistent.
    3. The C(size, 2) unordered pairs are enumerated ROW-LOCALLY from
       each posting list (guide §2.3/§2.4: one basket shuffle instead
       of the two a self-equi-join pays), then one map-side-combinable
       count aggregate — at most |items|² rows out regardless of input
       size.  Never an all-pairs cross join.
    4. Item frequencies and the basket total re-aggregate from the
       same postings frame and join back onto the pair table:
       |items|-row and 1-row broadcasts under AQE.
    5. Each unordered pair emits BOTH rule directions (a→b and b→a) via
       a row-local union, so confidence is per-antecedent.

    ``min_pair_count`` prunes the long tail BEFORE the metric joins —
    at scale most pairs occur once and carry no signal.
    Output: antecedent, consequent, pair_n, support, confidence, lift.
    """
    from knot_another_pipeline_spark.functions.postings import (
        sorted_pairs_from_postings,
    )

    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    if max_basket_size < 2:
        raise ValueError(f"max_basket_size must be >= 2, got {max_basket_size}")
    posts = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .filter(F.col("basket").isNotNull() & F.col("item").isNotNull())
        .groupBy("basket")
        .agg(F.collect_set("item").alias("_items"))
        .filter(F.size("_items") <= max_basket_size)
    )
    n_baskets = posts.agg(F.count(F.lit(1)).alias("_n_baskets"))
    item_n = posts.select(F.explode("_items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).alias("_item_n"))
    pairs = (
        sorted_pairs_from_postings(
            posts, items_col="_items", a_col="item_a", b_col="item_b"
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_count)
    )
    directed = pairs.selectExpr(
        "stack(2, item_a, item_b, item_b, item_a) as (antecedent, consequent)",
        "pair_n",
    )
    with_n = (
        directed.join(
            item_n.withColumnRenamed("item", "antecedent").withColumnRenamed(
                "_item_n", "_n_ante"
            ),
            "antecedent",
        )
        .join(
            item_n.withColumnRenamed("item", "consequent").withColumnRenamed(
                "_item_n", "_n_cons"
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    return with_n.select(
        "antecedent",
        "consequent",
        F.col("pair_n").cast("bigint").alias("pair_n"),
        F.round(F.col("pair_n") / F.col("_n_baskets"), round_to).alias("support"),
        F.round(F.col("pair_n") / F.col("_n_ante"), round_to).alias("confidence"),
        F.round(
            F.col("pair_n") * F.col("_n_baskets")
            / (F.col("_n_ante") * F.col("_n_cons")),
            round_to,
        ).alias("lift"),
    )


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    k: int = 256,
) -> DataFrame:
    """Pre-flight join size estimate from KMV key sketches — "how many
    rows will this join emit?" answered WITHOUT running the join: each
    side reduces to one ≤ k-hash sketch plus a row count, the key
    overlap comes from the KMV inclusion–exclusion (the exact merge
    identity :func:`~knot_another_pipeline_spark.operators.quality
    .kmv_sketch` documents), and the output estimate assumes uniform
    per-key multiplicity::

        est_rows ≈ |keys_A ∩ keys_B| · (rows_A/|keys_A|) · (rows_B/|keys_B|)

    The planning readout behind "do we need the skew path / a
    broadcast / a pre-filter here" at 100 TB — where actually counting
    the join is the thing being avoided.  The uniform-multiplicity
    assumption UNDERestimates skewed joins (documented; pair with
    ``grouped_totals``-style hot-key profiling when skew is
    suspected).  Deterministic md5 sketches — the estimate itself is
    engine-reproducible and oracle-checked.

    Scale shape: two corpus scans (one per side: count + sketch
    tournament), then driver-trivial array math on two ≤ k-element
    arrays.  The inputs never join.

    Output (one row): n_rows_a, n_rows_b, est_distinct_a,
    est_distinct_b, est_key_overlap, est_join_rows (all bigint).
    """
    from knot_another_pipeline_spark.operators.quality import kmv_sketch

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    a = left.select(F.col(left_key).alias("_k")).filter(
        F.col("_k").isNotNull()
    )
    b = right.select(F.col(right_key).alias("_k")).filter(
        F.col("_k").isNotNull()
    )
    sa = kmv_sketch(a, "_k", k=k).select(F.col("hashes").alias("ha"))
    sb = kmv_sketch(b, "_k", k=k).select(F.col("hashes").alias("hb"))
    ca = a.agg(F.count(F.lit(1)).alias("n_rows_a"))
    cb = b.agg(F.count(F.lit(1)).alias("n_rows_b"))

    def est(arr):
        m = F.size(arr)
        norm = F.conv(F.get(arr, k - 1), 16, 10).cast("double") / F.lit(
            float(1 << 60)
        )
        return F.when(m < k, m.cast("double")).otherwise(
            F.round(F.lit(float(k - 1)) / norm, 0)
        )

    merged = F.slice(
        F.sort_array(F.array_distinct(F.concat(F.col("ha"), F.col("hb")))),
        1,
        k,
    )
    row = (
        sa.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(ca))
        .crossJoin(F.broadcast(cb))
        .select(
            "n_rows_a",
            "n_rows_b",
            est(F.col("ha")).alias("n_a"),
            est(F.col("hb")).alias("n_b"),
            est(merged).alias("n_u"),
        )
    )
    overlap = F.greatest(
        F.lit(0.0), F.col("n_a") + F.col("n_b") - F.col("n_u")
    )
    join_rows = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.round(
            overlap
            * (F.col("n_rows_a") / F.col("n_a"))
            * (F.col("n_rows_b") / F.col("n_b")),
            0,
        ),
    ).otherwise(F.lit(0.0))
    return row.select(
        F.col("n_rows_a").cast("bigint").alias("n_rows_a"),
        F.col("n_rows_b").cast("bigint").alias("n_rows_b"),
        F.col("n_a").cast("bigint").alias("est_distinct_a"),
        F.col("n_b").cast("bigint").alias("est_distinct_b"),
        overlap.cast("bigint").alias("est_key_overlap"),
        join_rows.cast("bigint").alias("est_join_rows"),
    )


def rank_movers(
    df: DataFrame,
    *,
    period_col: str,
    key_col: str,
    value_col: str,
    period_a,
    period_b,
    k: int = 20,
) -> DataFrame:
    """Biggest leaderboard movers between two periods — rank every key
    by value within each period, join the two rankings, and return the
    top-k absolute rank changes — "what shot up / collapsed this
    month" for parts, domains, queries, error codes.  Rank deltas
    (not value deltas) because ranks are scale-free: a 10× traffic
    week moves every raw value but not the ordering.

    Scale shape: the within-period rank comes from ONE
    ``global_rank`` over ``(period, value desc, key)`` — periods are
    contiguous runs under that order, so rank-in-period is the global
    rank minus the period's min rank (+1), recovered with a
    per-period aggregate join — never a ``Window.partitionBy(period)``
    whose single task would sort an entire period.  The two period
    slices join on the key; keys present in only one period are
    reported with NULL opposite-side rank (entries/exits ARE movers)
    and rank ∞-style deltas excluded from the top-k (NULL delta sorts
    last).  Top-k compiles to TakeOrdered.

    Output: key, value_a, value_b, rank_a, rank_b, rank_delta
    (= rank_a − rank_b; positive = climbed), ordered |delta| desc,
    key asc, ≤ k rows (ties beyond k cut deterministically).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    p = F.col(period_col)
    base = (
        df.filter(p.isin([period_a, period_b]))
        .select(
            p.alias("period"),
            F.col(key_col).alias("key"),
            F.col(value_col).cast("double").alias("value"),
        )
        .filter(F.col("key").isNotNull() & F.col("value").isNotNull())
        .groupBy("period", "key")
        .agg(F.sum("value").alias("value"))
    )
    ranked = global_rank(
        base,
        [
            F.col("period").asc(),
            F.col("value").desc(),
            F.col("key").asc(),
        ],
        rank_col="_gr",
    )
    offs = ranked.groupBy("period").agg(F.min("_gr").alias("_off"))
    inperiod = ranked.join(offs, "period").select(
        "period",
        "key",
        "value",
        (F.col("_gr") - F.col("_off") + 1).alias("rank"),
    )
    a = inperiod.filter(F.col("period") == F.lit(period_a)).select(
        "key", F.col("value").alias("value_a"), F.col("rank").alias("rank_a")
    )
    b = inperiod.filter(F.col("period") == F.lit(period_b)).select(
        "key", F.col("value").alias("value_b"), F.col("rank").alias("rank_b")
    )
    joined = a.join(b, "key", "full_outer").select(
        "key",
        "value_a",
        "value_b",
        F.col("rank_a").cast("bigint").alias("rank_a"),
        F.col("rank_b").cast("bigint").alias("rank_b"),
        (F.col("rank_a") - F.col("rank_b")).cast("bigint").alias(
            "rank_delta"
        ),
    )
    return joined.orderBy(
        F.abs(F.col("rank_delta")).desc_nulls_last(), F.col("key").asc()
    ).limit(k)


def pareto_front(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    maximize_x: bool = True,
    maximize_y: bool = True,
) -> DataFrame:
    """Two-dimensional Pareto front (skyline): the rows not dominated
    by any other row, where ``q`` dominates ``p`` iff ``q`` is at least
    as good on BOTH objectives and strictly better on at least one.
    The classic "best trade-off" readout — cheapest-for-largest parts,
    highest-quality-for-shortest documents — that a naive engine writes
    as a quadratic NOT EXISTS self-join.

    Distributed shape (no all-pairs, no single-task global window):

    1. normalize both objectives to "bigger is better" (minimize →
       negate), drop NULL-objective rows (the oracle does the same);
    2. ONE hash aggregate to the distinct-x table ``x → gy = max(y)``
       — a row survives same-x domination iff its y equals its x-group
       max;
    3. the exclusive prefix max of ``gy`` over strictly-greater x —
       the same distributed-prefix recipe as :func:`global_rank`:
       ``repartitionByRange`` on x DESC (pinned with an eager
       ``localCheckpoint`` so the offsets branch and the scan branch
       read ONE materialized partitioning), per-partition running max
       inside each range partition, plus a broadcast exclusive prefix
       over the ≤ shuffle-partitions per-partition maxima.  A distinct
       x value is on the front iff no strictly-greater x reaches its
       y: ``prefix_max < gy`` (NULL prefix = greatest x = on front);
    4. join the (small) front-key table back to the input on (x, y) to
       recover full rows — equal-(x, y) duplicates are mutually
       non-dominating and all survive, matching the oracle's NOT
       EXISTS semantics.

    Every stage is bounded: the skyline-key table is the join's build
    side, the only global structure is the partition-count-sized
    offset table.  At 100 TB this is one aggregate + one range shuffle
    of the distinct-x table + one equi-join.

    Output: the input columns of the non-dominated rows.
    """
    sx = F.col(x_col) if maximize_x else -F.col(x_col)
    sy = F.col(y_col) if maximize_y else -F.col(y_col)
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).withColumns({"_px": sx.cast("double"), "_py": sy.cast("double")})

    gx = base.groupBy("_px").agg(F.max("_py").alias("_gy"))
    parts = (
        gx.repartitionByRange(F.col("_px").desc())
        .localCheckpoint(eager=True)
        .withColumn("_pid", F.spark_partition_id())
    )
    pmax = parts.groupBy("_pid").agg(F.max("_gy").alias("_pm"))
    w_off = Window.orderBy(F.col("_pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = pmax.withColumn("_off", F.max("_pm").over(w_off)).select(
        "_pid", "_off"
    )
    w_local = Window.partitionBy("_pid").orderBy(
        F.col("_px").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    front_keys = (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn("_local", F.max("_gy").over(w_local))
        .withColumn("_prefix", F.greatest("_off", "_local"))
        .filter(F.col("_prefix").isNull() | (F.col("_prefix") < F.col("_gy")))
        .select("_px", F.col("_gy").alias("_py"))
    )
    return base.join(front_keys, ["_px", "_py"]).drop("_px", "_py")


def order_priority_counts(
    orders: DataFrame, lineitem: DataFrame, *, late_days: int = 365
) -> DataFrame:
    """TPC-H Q4-shaped EXISTS readout: per order priority, how many
    orders have at least one line shipped more than ``late_days`` after
    the order date (the schema's analog of Q4's commit-vs-receipt
    lateness — this dataset carries no commit/receipt dates).

    Shape: a LEFT SEMI join with a compound condition (equi key +
    cross-table theta predicate).  Catalyst keeps the equi key as the
    join key, so the semi join is a plain shuffled hash join; the theta
    part evaluates inside it.  The semi join also deduplicates — an
    order with five late lines counts once, with no DISTINCT pass.
    Then one 5-group hash aggregate.  Two shuffles total, both on
    orderkey-sized data, at any scale.
    """
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
    )
    return (
        orders.join(
            lineitem,
            (F.col("o_orderkey") == F.col("l_orderkey")) & late,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13-shaped distribution: how many customers placed exactly
    k orders, INCLUDING k = 0 — the classic outer-join-then-double-
    aggregate shape that a semi/inner join cannot express.

    Shape: aggregate orders per customer first (one shuffle on custkey,
    partial map-side combine), LEFT join customer to the per-customer
    counts (zero-order customers keep NULL → 0), then a second tiny
    aggregate over the count values.  The first aggregate means the
    outer join moves one row per customer, never one per order.
    """
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, "c_custkey", "left")
        .select(F.coalesce(F.col("_n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    brand: str = "Brand#12",
    max_size: int = 10,
    qty_factor: float = 0.2,
    years: float = 7.0,
) -> DataFrame:
    """TPC-H Q17-shaped correlated-scalar-subquery readout: revenue from
    small-quantity lines (below ``qty_factor`` x that part's own average
    quantity) of one brand's small parts, annualized over ``years``.

    Shape: the correlated subquery ``l_quantity < 0.2 * (SELECT avg ...
    WHERE same part)`` decorrelates into a per-part average aggregate
    joined back.  The brand/size filter lands on the part SCAN
    (predicate pushdown), the surviving part keys broadcast into the
    lineitem scan, the per-part averages are computed over only the
    matching lines and broadcast back — the fact table is scanned once
    and never shuffles on the full key space.
    """
    keys = part.filter(
        (F.col("p_brand") == brand) & (F.col("p_size") <= max_size)
    ).select("p_partkey")
    lines = lineitem.join(
        F.broadcast(keys), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    avg_qty = lines.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("_avg_qty")
    )
    small = lines.join(
        F.broadcast(avg_qty.withColumnRenamed("l_partkey", "_pk")),
        F.col("l_partkey") == F.col("_pk"),
    ).filter(F.col("l_quantity") < qty_factor * F.col("_avg_qty"))
    return small.agg(
        F.round(
            F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / years, 2
        ).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


def big_order_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    min_qty: float = 250.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18-shaped IN-(GROUP BY ... HAVING) shape: customers whose
    orders total more than ``min_qty`` units.

    Shape: the HAVING subquery is just an aggregate-then-filter on
    lineitem (one shuffle on orderkey, map-side partial sums); the
    handful of qualifying orders then BROADCAST into orders, and the
    customer dimension broadcasts too — the two big tables never
    shuffle against each other.  Top-k via TakeOrderedAndProject.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def disjunctive_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    branches: Sequence[tuple[str, int, int, float, float]] = (
        ("Brand#12", 1, 5, 1.0, 11.0),
        ("Brand#21", 1, 10, 10.0, 20.0),
        ("Brand#23", 1, 15, 20.0, 30.0),
    ),
) -> DataFrame:
    """TPC-H Q19-shaped disjunctive join: revenue from lines matching
    ANY of several (brand, size range, quantity range) conjunctions.

    Shape: the OR spans both tables, so no single branch can push down
    whole — but the UNION of the part-side disjuncts can and does: the
    part scan is prefiltered to ``any(brand = b AND size in range)``
    before broadcasting, so the fact scan only tests the residual OR
    against the tiny matched dimension rows.  One broadcast join, one
    1-row aggregate, zero shuffles of lineitem.
    """
    part_any = None
    join_any = None
    for brand, lo_sz, hi_sz, lo_q, hi_q in branches:
        p = (F.col("p_brand") == brand) & F.col("p_size").between(
            lo_sz, hi_sz
        )
        j = p & F.col("l_quantity").between(lo_q, hi_q)
        part_any = p if part_any is None else (part_any | p)
        join_any = j if join_any is None else (join_any | j)
    dim = part.filter(part_any).select("p_partkey", "p_brand", "p_size")
    return (
        lineitem.join(
            F.broadcast(dim),
            (F.col("l_partkey") == F.col("p_partkey")) & join_any,
        )
        .agg(
            F.round(
                F.coalesce(
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ),
                    F.lit(0.0),
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


def waiting_suppliers(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    late_days: int = 365,
    status: str = "F",
    k: int = 100,
) -> DataFrame:
    """TPC-H Q21-shaped double-correlated EXISTS/NOT EXISTS: suppliers
    who were the ONLY late shipper in a multi-supplier order (late =
    shipped more than ``late_days`` after the order date, on orders
    with status ``status``).

    Shape: the classic formulation is ``EXISTS (another supplier's
    line) AND NOT EXISTS (another supplier's LATE line)`` — two
    correlated self-joins of the fact table.  Both decorrelate into a
    per-order supplier census: n_suppliers and n_late_suppliers; a late
    line qualifies iff n_suppliers >= 2 AND n_late_suppliers = 1 (the
    late set is exactly {me}).  The census is two PLAIN hash aggregates
    — (orderkey, suppkey) then orderkey — rather than two
    countDistincts, which would plan an Expand that doubles every
    shuffled row.  So: one orderkey-grain shuffle chain for the census,
    one orderkey join back (both map-side-combinable), one broadcast of
    the supplier dimension — instead of two extra self-joins of
    lineitem.  Equivalent because "no OTHER supplier late, me late"
    <=> "exactly one distinct late supplier, me".
    """
    li = lineitem.join(
        orders.filter(F.col("o_orderstatus") == status).select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "_late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS"),
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("_late").cast("int")).alias("_supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_ns"),
        F.sum("_supp_late").alias("_nl"),
    )
    return (
        li.filter(F.col("_late"))
        .join(per_order.withColumnRenamed("l_orderkey", "_ok"),
              F.col("l_orderkey") == F.col("_ok"))
        .filter((F.col("_ns") >= 2) & (F.col("_nl") == 1))
        .join(
            F.broadcast(supplier),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


def idle_customers(
    customer: DataFrame, orders: DataFrame, *, since: str = "2001-01-01"
) -> DataFrame:
    """TPC-H Q22-shaped anti-join + global scalar subquery: per nation,
    the count and total balance of above-average-balance customers with
    NO order since ``since`` (the schema's analog of Q22's "never
    ordered", which is empty on this dataset — every customer has
    ordered at some point).

    Shape: the scalar subquery ``c_acctbal > (SELECT avg(...) WHERE
    c_acctbal > 0)`` is a 1-row aggregate broadcast into a map-side
    compare; the NOT EXISTS is a LEFT ANTI join against only the
    orders rows passing the pushed-down date filter.  One anti-join
    shuffle on custkey, one tiny nation aggregate.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .select(
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            "numcust",
            "totacctbal",
        )
        .orderBy("c_nationkey")
    )


def min_cost_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    *,
    region_name: str = "EUROPE",
    part_type: str = "STANDARD",
    max_size: int = 15,
) -> DataFrame:
    """TPC-H Q2-shaped correlated-min readout: for each qualifying part,
    the supplier(s) in one region offering the MINIMUM unit cost
    (``min(l_extendedprice / l_quantity)`` over that supplier's lines —
    the schema's analog of Q2's ``ps_supplycost``; this dataset carries
    no partsupp table).

    Shape: the classic ``WHERE cost = (SELECT min(cost) ... same part)``
    correlated subquery decorrelates into ONE per-(part, supplier) cost
    aggregate built from the region-filtered fact scan, a per-part min
    over it (map-side combinable — the cost table is already
    part-clustered from its own shuffle, so the min agg is
    exchange-free), and an equality join back on (part, cost).  The
    region restriction is two broadcast dimension hops pushed BELOW the
    aggregate, so out-of-region lines never enter the cost table; the
    part filter lands on the part scan and broadcasts.  Ties (two
    suppliers at the exact minimum) are all returned, as in Q2.
    """
    in_region = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(
                        region.filter(F.col("r_name") == region_name)
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    ).select("s_suppkey", "s_name", "n_name")
    cost = (
        lineitem.filter(F.col("l_quantity") > 0)
        .join(
            F.broadcast(in_region),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    per_part_min = cost.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("unit_cost").alias("_mc")
    )
    dim = part.filter(
        (F.col("p_type") == part_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_name", "p_size")
    return (
        cost.join(
            per_part_min,
            (F.col("l_partkey") == F.col("_pk"))
            & (F.col("unit_cost") == F.col("_mc")),
        )
        .join(F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            F.col("p_size").cast("int").alias("p_size"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


def important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    nation_name: str = "NATION_3",
    fraction: float = 0.002,
) -> DataFrame:
    """TPC-H Q11-shaped HAVING-vs-global-scalar readout: parts whose
    shipped value from one nation's suppliers exceeds ``fraction`` of
    that nation's TOTAL shipped value (Q11's ``ps_supplycost *
    ps_availqty`` becomes ``sum(l_extendedprice)`` — no partsupp table
    in this schema).

    Shape: the scalar subquery ``> fraction * (SELECT sum ...)`` is the
    SAME grouped aggregate summed once more — the per-part value table
    is built with ONE partkey shuffle, its 1-row grand total broadcasts
    back via crossJoin, and the filter is a map-side compare.  The
    nation restriction is a broadcast dimension hop below the
    aggregate.  Never two scans of the fact table.
    """
    nat_supp = supplier.join(
        F.broadcast(
            nation.filter(F.col("n_name") == nation_name).select(
                "n_nationkey"
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    value = (
        lineitem.join(
            F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    total = value.agg(F.sum("value").alias("_total"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("value") > fraction * F.col("_total"))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), F.col("l_partkey").asc())
    )


def top_supplier_revenue(
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    period_start: str = "1996-01-01",
    period_end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-shaped argmax-vs-scalar-max: the supplier(s) whose
    revenue over one quarter equals the maximum revenue of any supplier
    in that quarter (Q15's revenue view + scalar subquery).

    Shape: the revenue view is ONE suppkey-grain aggregate over the
    date-pruned fact scan (filter pushed to parquet); the scalar max is
    a 1-row aggregate OF THAT VIEW, broadcast back with a crossJoin and
    compared map-side — the view's exchange is built once and reused
    for both consumers (ReuseExchange), so the fact table is scanned
    and shuffled exactly once.  Ties all surface, as Q15 requires.
    """
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(period_start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(period_end).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def supplier_part_variety(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    *,
    brand_not: str = "Brand#1",
    sizes: Sequence[int] = (1, 5, 9, 13, 17, 21, 25, 29),
    exclude_negative_balance: bool = True,
) -> DataFrame:
    """TPC-H Q16-shaped NOT-IN + distinct-count readout: how many
    distinct suppliers can ship each (brand, type, size) combination,
    excluding a complained-about supplier set (the schema's analog:
    suppliers with negative account balance; there is no comment
    column), for parts not of one brand and of the listed sizes.

    Shape: the supplier-part relation is the DISTINCT (partkey,
    suppkey) projection of the fact table — one shuffle at pair grain.
    The NOT IN is a broadcast LEFT ANTI join (the exclusion list is a
    filtered dimension); the part filter broadcasts.  The final
    COUNT(DISTINCT suppkey) is TWO PLAIN hash aggregates — dedup to
    (brand, type, size, suppkey) grain, then count — never the
    distinct-aggregate Expand that doubles every shuffled row.
    """
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    if exclude_negative_balance:
        excluded = supplier.filter(F.col("s_acctbal") < 0).select(
            F.col("s_suppkey").alias("l_suppkey")
        )
        pairs = pairs.join(F.broadcast(excluded), "l_suppkey", "left_anti")
    dim = part.filter(
        (F.col("p_brand") != brand_not)
        & F.col("p_size").isin(*[int(s) for s in sizes])
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("int").alias("p_size"),
            "supplier_cnt",
        )
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


def dominant_part_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    *,
    name_prefix: str = "b",
    share: float = 0.2,
) -> DataFrame:
    """TPC-H Q20-shaped correlated half-sum: (supplier, part) pairs
    where one supplier shipped more than ``share`` of a part's TOTAL
    shipped quantity, for parts whose name starts with ``name_prefix``
    (Q20's ``ps_availqty > 0.5 * (SELECT sum(l_quantity) ...)``
    becomes a shipped-share dominance test — no partsupp table).

    Shape: the correlated sum decorrelates into the per-(part,
    supplier) quantity aggregate — ONE partkey-grain shuffle of the
    prefix-pruned fact scan (the part filter broadcasts below it) —
    and the per-part total is a second aggregate OF THAT TABLE
    (part-clustered already, exchange-free), joined back on partkey.
    The fact table is scanned once; nothing correlates row-at-a-time.
    """
    dim = part.filter(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey", "p_name"
    )
    ps = (
        lineitem.join(
            F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy("l_partkey", "l_suppkey", "p_name")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    totals = ps.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    return (
        ps.join(totals, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("supp_qty") > share * F.col("part_qty"))
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_suppkey",
            "s_name",
            F.round("supp_qty", 2).alias("supp_qty"),
            F.round("part_qty", 2).alias("part_qty"),
            F.round(F.col("supp_qty") / F.col("part_qty"), 6).alias(
                "qty_share"
            ),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority top-k: the ``k`` unshipped
    orders (ordered before ``cutoff``, with at least one line shipping
    after it) from one market segment, ranked by open revenue (this
    schema carries ``o_orderpriority`` in place of Q3's
    ``o_shippriority``).

    Shape: the segment filter broadcasts customer keys below the
    orders scan; the date filters land on the orders and lineitem
    parquet scans (PushedFilters).  The one real exchange is the
    orderkey join of the two pruned fact sides, and the revenue
    aggregate reuses that partitioning — ``HashPartitioning(
    l_orderkey)`` satisfies the group-by clustering on
    ``(l_orderkey, o_orderdate, o_orderpriority)``, so no second
    shuffle.  The top-k is ``TakeOrderedAndProject`` (per-partition
    heaps + a k-row driver merge), never a global sort.  Ordering
    uses the ROUNDED revenue so ties break identically everywhere.

    Scale audit (round 11, re: the round-10 probe's 4->16 "cliff"):
    the initial physical plan is IDENTICAL at 1x and 16x replica scale
    — two BroadcastHashJoins, one orderkey exchange,
    TakeOrderedAndProject — and the min-of-3 re-probe measured a 4->16
    time exponent of 0.74 at constant 10-row output (2.9 s at 16x),
    so the r10 single-sample 1.14 exponent was host noise, not a plan
    regime flip.  At true cluster scale the orders side outgrows any
    broadcast threshold and AQE picks SMJ/SHJ on the orderkey — the
    correct shuffle-bound plan, since both fact sides scale together.
    """
    cut = F.lit(cutoff).cast("timestamp")
    cohort = customer.filter(F.col("c_mktsegment") == segment).select(
        "c_custkey"
    )
    open_orders = orders.filter(F.col("o_orderdate") < cut).join(
        F.broadcast(cohort), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        lineitem.filter(F.col("l_shipdate") > cut)
        .join(open_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(k)
    )


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    start: str = "1997-01-01",
    end: str = "1998-12-31",
) -> DataFrame:
    """TPC-H Q7-shaped two-nation trade volume: revenue shipped between
    ``nation_a`` suppliers and ``nation_b`` customers (both directions,
    kept separate), by ship year.

    Shape: both nation restrictions push below the fact joins — the
    two-nation supplier subset broadcasts onto the date-pruned lineitem
    scan (pruning it to ~2/N of lines before anything shuffles), and
    the two-nation customer subset prunes orders the same way.  The
    single at-scale exchange pair is the orderkey join of the two
    pruned sides; the cross-pair disjunction ``(A→B) or (B→A)``
    evaluates map-side after the join (both names are already
    attached), and the final (2×2×years)-group aggregate is a rounding
    error.  The customer attach is left unhinted: at bench scale
    Catalyst broadcasts it, on a 100 TB cluster a 2/N customer slice
    exceeds the threshold and AQE plans the shuffle join on its own.
    """
    pair = [nation_a, nation_b]
    nat = nation.filter(F.col("n_name").isin(pair))
    supp = supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ord_side = orders.join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    line_side = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit(end).cast("timestamp"))
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "supp_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
        )
    )
    return (
        line_side.join(ord_side, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (
                (F.col("supp_nation") == nation_a)
                & (F.col("cust_nation") == nation_b)
            )
            | (
                (F.col("supp_nation") == nation_b)
                & (F.col("cust_nation") == nation_a)
            )
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    *,
    region_name: str = "AMERICA",
    supp_nation: str = "NATION_1",
    part_type: str = "ECONOMY",
    start: str = "1997-01-01",
    end: str = "1998-12-31",
) -> DataFrame:
    """TPC-H Q8-shaped market share: of all ``part_type`` revenue sold
    into one region over two years, the fraction supplied by
    ``supp_nation``, per order year.

    Shape: numerator and denominator come out of ONE aggregate over
    one fact pass — ``sum(when(nation = X, volume))`` next to
    ``sum(volume)`` — never two scans of an 8-table join.  The part
    filter prunes lineitem on the partkey attach (unhinted: broadcast
    at bench scale, AQE's call when a 1/6 part slice outgrows the
    threshold); the supplier→nation attach broadcasts (tiny); the
    region restriction reaches orders through the customer semi-join
    side before the orderkey exchange, and the order-date filter is
    pushed to the orders parquet scan.  The share division happens on
    years-sized data, after all aggregation.
    """
    dim = part.filter(F.col("p_type") == part_type).select("p_partkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    amer = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("_ck_nat"))
    cust = customer.join(
        F.broadcast(amer), F.col("c_nationkey") == F.col("_ck_nat")
    ).select("c_custkey")
    ord_side = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit(end).cast("timestamp"))
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    line_side = (
        lineitem.join(dim, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
        )
    )
    return (
        line_side.join(ord_side, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == supp_nation, F.col("volume"))
                    .otherwise(F.lit(0.0))
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    *,
    name_token: str = "red",
    cost_factor: float = 0.6,
) -> DataFrame:
    """TPC-H Q9-shaped product-type profit: per supplier nation and
    order year, the profit on all parts whose name contains
    ``name_token`` — ``ps_supplycost`` becomes ``cost_factor *
    p_retailprice`` per unit (no partsupp table in this schema).

    Shape: the name filter prunes lineitem on the partkey attach
    (carrying ``p_retailprice`` for the map-side profit expression)
    BEFORE the orderkey exchange, so the one big shuffle moves only
    the qualifying ~name-token fraction of the fact table; the
    supplier→nation attach broadcasts.  Orders contributes only
    ``year(o_orderdate)``, column-pruned at its scan.  One final
    (nations × years)-group aggregate.
    """
    dim = part.filter(
        F.col("p_name").contains(name_token)
    ).select("p_partkey", "p_retailprice")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    line_side = (
        lineitem.join(dim, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "nation",
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.lit(cost_factor)
                * F.col("p_retailprice")
                * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    ord_side = orders.select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    return (
        line_side.join(ord_side, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def layout_pruning(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    id_col: str,
    box: tuple[float, float, float, float],
    group_rows: int = 256,
    order: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Row-group pruning simulator — the readout that turns "Hilbert
    clusters better than Z-order" from folklore into a measured
    number ON THIS TABLE: lay the rows out in three candidate sort
    orders (``natural`` = the id column, ``morton`` =
    :func:`~.functions.hashing.morton_key`, ``hilbert`` =
    :func:`~.functions.hashing.hilbert_key`), cut each layout into
    simulated row groups of ``group_rows`` rows, and count how many
    groups' (min/max x, min/max y) stats intersect the query
    ``box = (x_lo, x_hi, y_lo, y_hi)`` — exactly the parquet
    min/max-pruning decision a scan would make.  ``prune_fraction``
    is the share of the file a box query skips under each layout.

    Scale shape: one :func:`global_rank` per layout (range shuffle +
    bounded prefix-sum — never a single-partition global sort), one
    group-sized aggregate each, then a 3·⌈N/G⌉-row reduction.  The
    key expressions themselves are pure codegen (`morton_key` bit
    dilation, `hilbert_key`'s chained projections).  Rows with NULL
    coordinates are excluded from every layout alike.

    Output per layout: layout, n_rows, n_groups, groups_touched,
    rows_touched, prune_fraction — ordered by layout.
    """
    ranked = layout_rankings(
        df, x_col=x_col, y_col=y_col, id_col=id_col, order=order
    )
    return layout_pruning_readout(
        ranked, box=box, group_rows=group_rows, round_to=round_to
    )


def layout_rankings(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    id_col: str,
    order: int = 16,
) -> DataFrame:
    """The expensive half of :func:`layout_pruning`: lay the rows out
    in the three candidate sort orders (one :func:`global_rank` — a
    range shuffle — per layout) and return the tagged union
    ``(layout, _x, _y, _rk)``.  In a warehouse this IS a materialized
    table (you sort a layout once, then replay many box queries
    against its stats), which is exactly how bench.py stages it — the
    readout is the recurring cost, the three global sorts are not.
    """
    from knot_another_pipeline_spark.functions.hashing import (
        hilbert_key,
        morton_key,
    )

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    keyed = {
        "natural": base.select(
            "_x", "_y", F.col("_id").cast("long").alias("_key"), "_id"
        ),
        "morton": base.select(
            "_x",
            "_y",
            morton_key(F.col("_x"), F.col("_y")).alias("_key"),
            "_id",
        ),
        "hilbert": hilbert_key(
            base, x_col="_x", y_col="_y", out_col="_key", order=order
        ).select("_x", "_y", "_key", "_id"),
    }
    out = None
    for name, d in keyed.items():
        ranked = global_rank(
            d, [F.col("_key"), F.col("_id")], rank_col="_rk"
        ).select(F.lit(name).alias("layout"), "_x", "_y", "_rk")
        out = ranked if out is None else out.unionByName(ranked)
    return out


def layout_pruning_readout(
    ranked: DataFrame,
    *,
    box: tuple[float, float, float, float],
    group_rows: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """The cheap, recurring half of :func:`layout_pruning`: given the
    tagged rankings ``(layout, _x, _y, _rk)``, cut each layout into
    ``group_rows``-row simulated row groups, collect min/max stats,
    and replay the parquet box-intersection pruning decision.  Two
    hash aggregates keyed on (layout, group) then (layout) — no sort,
    no join.
    """
    if group_rows < 1:
        raise ValueError(f"group_rows must be >= 1, got {group_rows}")
    x_lo, x_hi, y_lo, y_hi = (float(v) for v in box)
    groups = ranked.groupBy(
        "layout", F.floor((F.col("_rk") - 1) / group_rows).alias("_g")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.min("_x").alias("_x0"),
        F.max("_x").alias("_x1"),
        F.min("_y").alias("_y0"),
        F.max("_y").alias("_y1"),
    )
    hit = (
        (F.col("_x1") >= x_lo)
        & (F.col("_x0") <= x_hi)
        & (F.col("_y1") >= y_lo)
        & (F.col("_y0") <= y_hi)
    )
    return (
        groups.groupBy("layout")
        .agg(
            F.sum("_n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(hit, 1).otherwise(0))
            .cast("bigint")
            .alias("groups_touched"),
            F.sum(F.when(hit, F.col("_n")).otherwise(0))
            .cast("bigint")
            .alias("rows_touched"),
            F.round(
                1.0
                - F.sum(F.when(hit, 1.0).otherwise(0.0))
                / F.count(F.lit(1)),
                round_to,
            ).alias("prune_fraction"),
        )
        .orderBy("layout")
    )


def forecast_revenue(
    lineitem: DataFrame,
    *,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    discount_lo: float = 0.05,
    discount_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-shaped forecasting-revenue-change readout: the revenue
    increase (``sum(l_extendedprice * l_discount)``) that would have
    resulted from eliminating small discounts on low-quantity lines in
    one shipping year.

    Shape: the whole query is a single scan→filter→1-row aggregate.
    Every predicate (ship-date window, discount band, quantity cap)
    sits directly on a parquet column, so all four land in
    ``PushedFilters`` and the scan reads only the three referenced
    columns; there is no join and no group key — the only exchange is
    the 1-row partial→final aggregate merge.  This is the canonical
    "does the engine push down and prune" probe at 100 TB: the scan,
    not the agg, is the entire cost.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
            & (F.col("l_discount") >= F.lit(discount_lo))
            & (F.col("l_discount") <= F.lit(discount_hi))
            & (F.col("l_quantity") < F.lit(max_qty))
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("forecast_revenue")
        )
    )


def returned_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped returned-item reporting: the ``k`` customers
    who lost the most revenue to returned lines (``l_returnflag =
    'R'``) for orders placed in one quarter, with their nation
    attached.

    Shape: both fact filters are scan-pushed (returnflag on lineitem,
    the order-date window on orders), so the orderkey join — the one
    big exchange — moves only the returned fraction of one quarter.
    Revenue is aggregated down to ``o_custkey`` BEFORE customer
    attaches, so the custkey join input is bounded by the customer
    count, never the lineitem count; nation broadcasts.  The top-k is
    ``TakeOrderedAndProject`` on the rounded revenue (ties broken by
    custkey) — no global sort.

    Revenue accumulates in ``decimal(18,4)`` — decimal addition is
    exact and associative, so the per-customer total is independent of
    partition count and merge order (a double sum can wobble 1 ulp
    with partitioning and flip a round-half-cent boundary).
    """
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .alias("_rev"),
    )
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        returned.join(window, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("_rev"), 2).cast("double").alias("revenue")
        )
    )
    named = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        per_cust.join(named, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def priority_linestatus(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12-shaped priority pivot (this schema carries no
    ``l_shipmode``/``l_receiptdate``, so the pivot category is
    ``l_linestatus`` and the window lands on ``l_shipdate``): per line
    status, how many orders shipped in the window were high-priority
    (``1-URGENT``/``2-HIGH``) vs everything else.

    Shape: the ship-date window is scan-pushed on lineitem, which is
    projected to two columns before the orderkey join — the one real
    exchange.  The CASE-sum pivot happens inside the final hash
    aggregate over the tiny linestatus key space (partial map-side
    combine collapses each partition to a handful of rows before the
    group exchange).  Mirrors Q12's "join then conditional count"
    shape exactly.
    """
    lines = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lines.join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, F.lit(1)).otherwise(F.lit(0))).alias(
                "high_line_count"
            ),
            F.sum(F.when(high, F.lit(0)).otherwise(F.lit(1))).alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    start: str = "1996-01-01",
    end: str = "1996-02-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14-shaped promotion-effect readout: the percentage of one
    month's revenue that came from parts of the promo type.

    Shape: the month window is scan-pushed on lineitem; the part
    dimension broadcasts carrying only ``(p_partkey, is_promo)`` —
    Q14's denominator needs ALL part types, so the flag rides the
    broadcast instead of a filter.  The conditional and total sums
    collapse map-side into one 1-row aggregate; the fact table never
    shuffles.
    """
    dim = part.select(
        "p_partkey",
        (F.col("p_type") == F.lit(promo_type)).alias("_is_promo"),
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .join(F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("_is_promo"), rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


def abc_classes(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    a_cut: float = 0.8,
    b_cut: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """ABC / Pareto classification of keys by value concentration —
    the warehouse classic: rank keys by value descending, class A
    while the running share is ≤ ``a_cut`` (the vital few), B until
    ``b_cut``, C for the long tail.  The sibling of
    :func:`~knot_another_pipeline_spark.operators.quality.gini_concentration`
    that names WHICH keys carry the mass instead of scoring how
    unequal it is.

    Classing rule: a key is A if the cumulative share UP TO AND
    INCLUDING it is ≤ a_cut OR it is the first key (a single dominant
    key is still class A); ties order by key ascending so the
    assignment is total and engine-independent.  Per-key values are
    rounded to ``round_to`` BEFORE ranking so aggregated doubles
    cannot flip the order between engines.

    Scale shape: one hash aggregate to per-key totals (the only pass
    over row volume), then rank + running share over the KEY table —
    one row per key, the ``fdr_adjust`` contract (dimension-sized by
    construction; swap in ``global_rank`` + partition-offset prefix
    sums for a billion-key table).

    Output per key: key, value, share, cum_share, abc_class —
    ordered by rank.
    """
    if not (0 < a_cut < b_cut < 1):
        raise ValueError(
            f"need 0 < a_cut < b_cut < 1, got {a_cut}, {b_cut}"
        )
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.round(F.sum(F.col(value_col).cast("double")), round_to).alias(
            "value"
        )
    ).filter(F.col("value").isNotNull())
    total = per_key.agg(F.sum("value").alias("_tot"))
    w = Window.orderBy(F.col("value").desc(), F.col("key").asc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        per_key.crossJoin(F.broadcast(total))
        .withColumn("_rk", F.row_number().over(w))
        .withColumn("_cum", F.sum("value").over(cum) / F.col("_tot"))
    )
    cls = (
        F.when(
            (F.col("_cum") <= F.lit(float(a_cut))) | (F.col("_rk") == 1),
            F.lit("A"),
        )
        .when(F.col("_cum") <= F.lit(float(b_cut)), F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return ranked.select(
        "key",
        "value",
        F.round(F.col("value") / F.col("_tot"), round_to).alias("share"),
        F.round(F.col("_cum"), round_to).alias("cum_share"),
        cls.alias("abc_class"),
    ).orderBy(F.col("_rk"))


def herfindahl_index(
    df: DataFrame,
    *,
    market_cols: list[str],
    firm_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per market:
    ``HHI = Σ_firms share²`` (0→perfect competition, 1→monopoly) plus
    the effective number of firms ``1/HHI`` — the antitrust-standard
    companion to :func:`~.quality.gini_concentration` (Gini measures
    inequality among participants; HHI measures how few participants
    matter at all, and is the one regulators threshold).

    Scale shape: two nested hash aggregates — firm totals within
    market, then the share-square sum per market — both narrowing,
    shuffling on (market, firm) then market.  No window, no sort; at
    100 TB the fact-table scan dominates and the aggregates ride one
    exchange each.  Firms with non-positive total value are excluded
    from the market (a share needs positive mass); markets with no
    positive firm vanish.

    Output per market: market cols, n_firms, total_value, hhi,
    effective_firms (= 1/HHI).
    """
    firm = (
        df.select(
            *[F.col(c) for c in market_cols],
            F.col(firm_col).alias("_firm"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
        .groupBy(*market_cols, "_firm")
        .agg(F.sum("_v").alias("_fv"))
        .filter(F.col("_fv") > 0)
    )
    mkt = firm.groupBy(*market_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_firms"),
        F.sum("_fv").alias("_tot"),
        F.sum(F.col("_fv") * F.col("_fv")).alias("_sq"),
    )
    hhi = F.col("_sq") / (F.col("_tot") * F.col("_tot"))
    return mkt.select(
        *market_cols,
        "n_firms",
        F.round("_tot", round_to).alias("total_value"),
        F.round(hhi, round_to).alias("hhi"),
        F.round(F.lit(1.0) / hhi, round_to).alias("effective_firms"),
    ).orderBy(*market_cols)
