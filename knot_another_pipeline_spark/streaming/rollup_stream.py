"""Structured Streaming variant of the windowed rollup.

The reference is batch-only (SURVEY §2.8) — its hourly "window" is a
batch ``date_trunc`` group key refreshed day-at-a-time. This module is
the streaming extension SURVEY §7 anticipates: the same per-entity hourly
aggregate as ``operators.rollup``, expressed over an unbounded source
with a watermark for late data.

Semantics parity: a tumbling 1-hour window on event time ≡ the batch
``date_trunc('hour', event_ts)`` group key; the watermark bounds state
exactly where the batch job's day-partition rebuild bounds recompute.
At scale this replaces the reference's "re-run the day's CTAS when late
data lands" with incremental state updates.

.. note:: **Checkpoint compatibility.** The streaming groupBy key keeps
   the input ``uid`` type (native long for numeric ids) rather than the
   earlier cast-to-string. That changed the state-store key schema: a
   streaming query restarted from a checkpoint written before the change
   fails with a state schema compatibility error. Upgrading operators
   must start the query from a fresh checkpoint location (the epoch-
   partitioned sink is replay-idempotent, so reprocessing the source
   from the new checkpoint converges to the same log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_windowed_rollup(
    stream: DataFrame,
    *,
    uid_col: str,
    ts_col: str,
    value_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(uid, tumbling-window) streaming aggregate with late-data
    tolerance. Returns a streaming DataFrame; attach any sink via
    ``writeStream`` (tests use the in-memory sink with
    ``trigger(availableNow=True)``).

    Output: uid, window_ts (window start), avg_value, message_count.
    """
    # uid keeps its input type — same rule as the batch operators
    # (operators.pairs): numeric ids group/compare as longs, and the
    # streaming log's pair orientation (uid_a < uid_b in the sink's
    # self-join) matches batch co_movement_pairs on the same data
    # instead of diverging to lexicographic order.
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(uid_col).alias("uid"),
            F.window(F.col(ts_col), window_duration).alias("win"),
        )
        .agg(
            F.avg(value_col).alias("avg_value"),
            F.count(F.lit(1)).alias("message_count"),
        )
        .select(
            "uid",
            F.col("win.start").alias("window_ts"),
            "avg_value",
            "message_count",
        )
    )


def streaming_co_location(
    stream: DataFrame,
    *,
    uid_col: str,
    ts_col: str,
    value_col: str,
    output_path: str,
    checkpoint_path: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    cell_divisor: float = 50.0,
):
    """The flagship co-movement analytic over an unbounded source: the
    watermarked rollup stream feeds a per-micro-batch self-join that
    appends co-located (uid_a, uid_b, window, cell) events to a parquet
    log.

    Why per-batch joining is *complete*: in append output mode a window
    only leaves the streaming aggregation when the watermark passes its
    end — at that point every entity's row for that window is finalized
    and emitted in the same micro-batch, so the within-batch self-join
    sees each window whole. Pairing never needs cross-batch state; the
    day-grain scoring (hT/gT/overlaps — ``operators.pairs``) then runs
    as a cheap batch job over the log, which is exactly the reference's
    incremental shape ("append new day partitions",
    ``refresh_gold_tables.py:579-584``) with the window-finalization
    race handled by the watermark instead of day-boundary convention.

    Replay idempotence: ``foreachBatch`` is at-least-once — after a
    failure the last micro-batch is re-run with the *same* ``epoch_id``.
    Each batch therefore lands in its own ``epoch=<id>`` Hive partition
    via dynamic partition overwrite, so a replay rewrites that one
    partition in place instead of appending duplicate pair rows (which
    would double-count hT/gT downstream).

    Returns the started ``StreamingQuery`` (caller awaits termination).
    """
    rolled = streaming_windowed_rollup(
        stream,
        uid_col=uid_col,
        ts_col=ts_col,
        value_col=value_col,
        window_duration=window_duration,
        watermark=watermark,
    ).withColumn(
        "cell",
        F.concat(
            F.lit("c"),
            F.floor(F.col("avg_value") / F.lit(cell_divisor))
            .cast("bigint")
            .cast("string"),
        ),
    )

    return (
        rolled.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(co_location_pair_writer(output_path))
        .trigger(availableNow=True)
        .start()
    )


def co_location_pair_writer(output_path: str):
    """``foreachBatch`` sink for :func:`streaming_co_location`: self-join
    the finalized windows in the micro-batch and write the pair rows under
    an ``epoch=<epoch_id>`` partition with dynamic overwrite, so replaying
    the same epoch (foreachBatch's at-least-once contract) is a no-op
    rather than an append of duplicates."""

    def pair_batch(batch_df: DataFrame, epoch_id: int) -> None:
        a = batch_df.alias("a")
        b = batch_df.alias("b")
        pairs = a.join(
            b,
            (F.col("a.window_ts") == F.col("b.window_ts"))
            & (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.uid") < F.col("b.uid")),
            "inner",
        ).select(
            F.col("a.uid").alias("uid_a"),
            F.col("b.uid").alias("uid_b"),
            F.col("a.window_ts").alias("window_ts"),
            F.col("a.cell").alias("cell"),
            F.lit(int(epoch_id)).alias("epoch"),
        )
        (
            pairs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(output_path)
        )

    return pair_batch


def streaming_dedup(
    stream: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication: keep the first event per key within
    the watermark horizon (``dropDuplicatesWithinWatermark``).

    The batch analog is ``operators.dedup.latest_row_dedup``; streaming
    cannot keep *latest* (that needs the future), so the contract is
    keep-FIRST — the standard at-least-once → exactly-once collapse for
    replayed sources. State is one entry per key seen inside the
    watermark window and is evicted as the watermark advances, so state
    size is bounded by key cardinality per horizon, not stream length —
    the property that keeps this viable on an unbounded 100 TB/day feed.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def read_co_location_log(spark, output_path: str) -> DataFrame:
    """Batch reader for the streaming co-location log.

    Drops the ``epoch`` partition column — a replay-idempotence artifact
    of the sink (one Hive partition per micro-batch), not part of the
    pair schema — so downstream batch scoring sees exactly the columns
    the batch self-join produces: uid_a, uid_b, window_ts, cell. Feed the
    result (with ``day_date = to_date(window_ts)``) to
    ``operators.pairs.score_co_located`` for day-grain hT/gT/overlap
    scoring identical to the non-streaming path.
    """
    return spark.read.parquet(output_path).drop("epoch")


def streaming_sessionize(
    stream: DataFrame,
    *,
    uid_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
):
    """Stateful gap-based sessionization via ``applyInPandasWithState``
    (GroupState) — the custom-stateful-operator pattern the batch
    ``operators.relational.sessionize`` window implements declaratively.

    Per entity, events within ``gap_minutes`` of the previous event extend
    the open session; a larger gap (or state timeout past the watermark)
    closes it and emits one row. State per key is three scalars
    (start/end/count) — bounded, watermark-evicted, and shuffled only on
    the entity key, so at scale the operator behaves like any keyed
    streaming aggregate.

    Output stream: uid, session_start, session_end, n_events.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("uid", StringType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_ms", LongType()),
            StructField("end_ms", LongType()),
            StructField("n", LongType()),
        ]
    )
    gap_ms = gap_minutes * 60_000

    def update(key, pdfs, state: GroupState):
        (uid,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((uid, s, e, n))
                state.remove()
        else:
            ts_all = []
            for pdf in pdfs:
                ts_all.append(pd.to_datetime(pdf["ts"]))
            ts = pd.concat(ts_all).sort_values()
            ms = (ts.astype("int64") // 1_000_000).tolist()
            if state.exists:
                s, e, n = state.get
            else:
                s, e, n = ms[0], ms[0], 0
            for t in ms:
                if t - e > gap_ms:
                    closed.append((uid, s, e, n))
                    s, e, n = t, t, 1
                else:
                    e = max(e, t)
                    n += 1
            state.update((s, e, n))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "uid": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="ms"
                    ),
                    "session_end": pd.to_datetime(
                        [c[2] for c in closed], unit="ms"
                    ),
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(uid_col).cast("string").alias("uid"), F.col(ts_col).alias("ts"))
        .groupBy("uid")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_upsert_sink(
    stream: DataFrame,
    *,
    keys: str | list[str],
    output_path: str,
    checkpoint_path: str,
    order_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Maintain a keyed gold table incrementally from a stream: each
    micro-batch MERGEs into the parquet table via
    :func:`~..operators.relational.upsert` — late rows *update* their
    key in place instead of appending a duplicate.

    This is the incremental replacement for the reference's
    "late data landed → re-run the whole day's CTAS"
    (``refresh_gold_tables.py`` drop-and-recreate): only each batch's
    keys are reconciled, not the day's.

    Replay safety: foreachBatch is at-least-once, and this sink is
    naturally idempotent — upserting the same batch twice converges to
    the same table (latest-row-wins is associative/idempotent per key),
    so no epoch bookkeeping is needed. With ``order_col`` set (an
    event-time/version column) replays are also *reorder*-safe: an old
    batch re-applied after a newer one cannot regress a key.

    The rewrite cost is the table scan per batch (plain parquet has no
    row-level update); at warehouse scale, point the sink at a
    *partition-scoped* path (e.g. one table per day) or swap the write
    for a format with MERGE (Delta/Iceberg) keeping this exact call
    shape. The read-modify-write is staged through a ``_staging``
    sibling so a mid-write crash never loses the merged state: the
    merged result lands in staging (with Spark's ``_SUCCESS`` marker),
    the old table is renamed aside, staging is promoted, then the old
    copy is dropped. At every instant either the live table or a
    *complete* staging copy exists — the recovery step at the top of
    each batch promotes an orphaned complete staging before merging, so
    a crash in any window replays cleanly from the checkpoint.
    """
    import os
    import shutil

    from knot_another_pipeline_spark.operators.relational import upsert

    # Same guard as warehouse.compact_parquet: the staged rewrite renames
    # through os.replace, which only works on a local filesystem (and only
    # within one mount — cross-device promotion would raise EXDEV). An
    # s3://... path would write staging via Spark then fail the batch at
    # os.replace with an obscure FileNotFoundError; reject it up front.
    # Object-store deployments should swap this sink for a MERGE-capable
    # format (Delta/Iceberg) keeping the same call shape.
    if "://" in output_path and not output_path.startswith("file://"):
        raise ValueError(
            "streaming_upsert_sink stages its rewrite with local renames; "
            f"non-local output_path {output_path!r} is not supported — use a "
            "local path (staging/tombstone siblings live on the same "
            "filesystem) or a MERGE-capable table format"
        )

    key_list = [keys] if isinstance(keys, str) else list(keys)

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        staging = output_path.rstrip("/") + "_staging"
        tombstone = output_path.rstrip("/") + "_old"
        # crash recovery: a complete staging (merged result, _SUCCESS
        # present) with no live table means we died mid-promotion —
        # promote it now rather than mistaking this for a first batch.
        if not os.path.exists(output_path) and os.path.exists(
            os.path.join(staging, "_SUCCESS")
        ):
            os.replace(staging, output_path)
        if os.path.exists(tombstone):
            shutil.rmtree(tombstone)  # leftover old copy from a crash
        if os.path.exists(output_path):
            existing = spark.read.parquet(output_path)
            merged = upsert(
                existing,
                batch_df.select(*existing.columns),
                key_list,
                order_col=order_col,
            )
        else:
            # first batch: still dedupe within the batch itself
            merged = upsert(
                batch_df.limit(0), batch_df, key_list, order_col=order_col
            )
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(output_path):
            os.replace(output_path, tombstone)
        os.replace(staging, output_path)
        if os.path.exists(tombstone):
            shutil.rmtree(tombstone)

    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(merge_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    how: str = "left",
    broadcast_dim: bool = True,
):
    """Stream-static enrichment join: attach dimension attributes (entity
    metadata, routing tables, quality thresholds) to a stream without
    stateful join machinery.

    Spark re-evaluates the static side per micro-batch, so a dimension
    read from a table/path picks up slowly-changing updates between
    batches for free — no restart, no state store, no watermark. With
    ``broadcast_dim`` (default) the dim ships to every executor and the
    stream side never shuffles: the right shape whenever the dimension
    fits in executor memory (the usual case — keep dims narrow). Set it
    False for a jumbo dimension and let the planner shuffle instead.

    This is deliberately a thin, *named* wrapper: the semantic contract
    (per-batch dim refresh, no state, stream side unshuffled) is the
    operator; the implementation is one join.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def streaming_session_rollup(
    stream: DataFrame,
    *,
    uid_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization as a NATIVE ``session_window`` streaming
    aggregate — the JVM-state twin of ``streaming_sessionize``.

    ``streaming_sessionize`` (applyInPandasWithState) exists for custom
    per-session logic — arbitrary Python over each session's rows. When
    the per-session result is just aggregates (bounds + counts), that
    flexibility costs Arrow round-trips and a Python worker per
    partition; ``session_window`` keeps the merging-window state entirely
    in the JVM state store with codegen aggregates, and late rows merge
    sessions server-side (two sessions separated by < gap collapse when
    a bridging late event arrives, exactly like the batch lag+cumsum
    rewrite would on replay).

    Batch parity: on a bounded input this equals the batch
    ``operators.relational.sessionize`` output, INCLUDING the
    exact-threshold boundary — a follow-up event at ``ts + gap`` merges
    into the session in both forms (the native window extends through
    ``ts+gap`` inclusive; the batch lag+cumsum rule breaks only on
    strictly-greater gaps). The parity test pins both the generic
    equality and this boundary case.
    Output: uid, session_start, session_end_ts, n_events.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(uid_col).alias("uid"),
            F.session_window(F.col(ts_col), gap).alias("sess"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("uid", "session_start", "session_end_ts", "n_events")
    )


def radius_pair_writer(
    output_path: str, radius_m: float, max_abs_lat: float = 75.0
):
    """``foreachBatch`` sink for :func:`streaming_radius_pairs`: run the
    batch :func:`~knot_another_pipeline_spark.operators.pairs.radius_pairs`
    blocking join over the micro-batch's finalized windows and land the
    pair rows under an ``epoch=<epoch_id>`` partition with dynamic
    overwrite (same replay-idempotence contract as
    :func:`co_location_pair_writer`)."""

    def pair_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from knot_another_pipeline_spark.operators.pairs import radius_pairs

        pairs = radius_pairs(
            batch_df,
            id_col="uid",
            lat_col="lat",
            lon_col="lon",
            radius_m=radius_m,
            time_col="window_ts",
            time_grain="second",  # window starts are already aligned
            max_abs_lat=max_abs_lat,
        ).withColumn("epoch", F.lit(int(epoch_id)))
        (
            pairs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(output_path)
        )

    return pair_batch


def streaming_radius_pairs(
    stream: DataFrame,
    *,
    uid_col: str,
    ts_col: str,
    lat_col: str,
    lon_col: str,
    radius_m: float,
    output_path: str,
    checkpoint_path: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    max_abs_lat: float = 75.0,
):
    """Distance-true streaming co-location: per-window mean positions
    feed the wrap-correct radius blocking join per micro-batch — the
    streaming twin of batch ``radius_pairs``, upgrading
    :func:`streaming_co_location`'s cell-EQUALITY pairing (which misses
    neighbors straddling a cell edge) to true haversine distance.

    Completeness argument is identical to streaming_co_location: in
    append mode a window leaves the aggregation only when the watermark
    passes its end, so the within-batch radius join sees every entity's
    finalized row for that window together — no cross-batch pair state.
    The per-batch work is the batch operator itself (3×3 grid blocking,
    codegen haversine), so streaming and batch semantics cannot drift:
    they are one code path, and the parity test replays the same events
    through both.

    Returns the started ``StreamingQuery`` (caller awaits termination).
    """
    # lat averages arithmetically; lon needs the CIRCULAR mean
    # (atan2 of mean sin/cos) — an entity straddling the antimeridian
    # (fixes at ±179.95°) would otherwise average to a phantom position
    # near 0°, ~20,000 km from its real location.
    lon_rad = F.radians(F.col(lon_col))
    rolled = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window_duration).alias("w"),
            F.col(uid_col).alias("uid"),
        )
        .agg(
            F.avg(F.col(lat_col)).alias("lat"),
            F.avg(F.sin(lon_rad)).alias("_sin"),
            F.avg(F.cos(lon_rad)).alias("_cos"),
        )
        .select(
            F.col("w.start").alias("window_ts"),
            "uid",
            "lat",
            F.degrees(F.atan2(F.col("_sin"), F.col("_cos"))).alias("lon"),
        )
    )
    return (
        rolled.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(radius_pair_writer(output_path, radius_m, max_abs_lat))
        .trigger(availableNow=True)
        .start()
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    left_watermark: str = "20 minutes",
    right_watermark: str = "20 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-STREAM interval join: match right-stream events to the
    left-stream event they follow within ``max_delay`` on a shared key
    — impressions→clicks attribution, order→shipment pairing, request→
    response stitching — the two-moving-sides case ``streaming_enrich``
    (stream-static) cannot express.

    Both sides carry watermarks, and the join condition time-bounds
    the match (``left_ts <= right_ts <= left_ts + max_delay``), which
    is exactly what lets Spark bound the state store: a buffered left
    row can be dropped once the right watermark passes its match
    window, instead of growing state forever (an unbounded-condition
    stream-stream join is rejected by the planner for this reason).
    State per key ≈ events inside (watermark + max_delay) — set the
    watermarks to the real out-of-order bound, not higher. For outer
    flavors Spark emits the NULL-padded row only after the watermark
    proves no match can arrive — results are late by design, not
    missing.

    Columns: the join key survives once as ``on`` —
    ``coalesce(left, right)``, so watermark-expired unmatched rows
    from EITHER side of an outer flavor keep their key (dropping the
    right copy would NULL the key on every unmatched right row).
    Pre-alias any other colliding names. Thin, named wrapper on
    purpose — the semantic contract (time-bounded condition ⇒ bounded
    state; watermark-gated outer emission) is the operator.
    """
    l = left.withWatermark(left_ts, left_watermark).alias("l")
    r = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = l.join(r, cond, how)
    return joined.select(
        F.coalesce(F.col(f"l.{on}"), F.col(f"r.{on}")).alias(on),
        *[F.col(f"l.{c}") for c in left.columns if c != on],
        *[F.col(f"r.{c}") for c in right.columns if c != on],
    )


def streaming_distinct_monitor(
    stream: DataFrame,
    *,
    group_cols: str | list[str],
    value_col: str,
    state_path: str,
    checkpoint_path: str,
    p: int = 9,
    trigger_available_now: bool = True,
):
    """Incremental distinct-count monitor over a stream — live
    "distinct users per event type" without ever storing the user set:
    each micro-batch's rows become row-local HLL register observations
    (:func:`~..operators.quality.hll_registers`, pure codegen — no
    streaming aggregation state), and the register table merges by
    max-rho.  The merge IS :func:`streaming_upsert_sink` keyed on
    ``(group…, register)`` with ``order_col="rho"`` — latest-by-rho
    upsert is exactly the HLL register fold, so this sink inherits the
    upsert sink's replay idempotence (re-applying a batch cannot
    change a max) and reorder safety (an old batch cannot regress a
    register) with zero new machinery.

    State is ≤ 2^p rows per group FOREVER — the monitor's footprint
    never grows with traffic, the property that makes it deployable
    against an unbounded stream.  Read the current estimates any time
    with :func:`read_distinct_estimates` (the state table stays
    register-form so merges remain exact; estimates are derived at
    read).
    """
    from knot_another_pipeline_spark.operators.quality import hll_registers

    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    regs = hll_registers(
        stream, group_cols=keys, value_col=value_col, p=p
    )
    return streaming_upsert_sink(
        regs,
        keys=[*keys, "register"],
        output_path=state_path,
        checkpoint_path=checkpoint_path,
        order_col="rho",
        trigger_available_now=trigger_available_now,
    )


def read_distinct_estimates(
    spark,
    state_path: str,
    *,
    group_cols: str | list[str],
    p: int = 9,
    round_to: int = 2,
) -> DataFrame:
    """Current distinct-count estimates from a
    :func:`streaming_distinct_monitor` state table: one bounded read of
    the ≤ 2^p-rows-per-group register parquet, then the standard HLL
    estimator (:func:`~..operators.quality.hll_estimate`)."""
    from knot_another_pipeline_spark.operators.quality import hll_estimate

    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    regs = spark.read.parquet(state_path)
    return hll_estimate(regs, group_cols=keys, p=p, round_to=round_to)


def streaming_cms_monitor(
    stream: DataFrame,
    *,
    item_col: str,
    state_path: str,
    checkpoint_path: str,
    depth: int = 4,
    width: int = 1024,
    trigger_available_now: bool = True,
):
    """Incremental heavy-hitter monitor over a stream — live item
    frequency estimates without storing the item universe: each
    micro-batch reduces to a Count-Min sketch
    (:func:`~..operators.quality.cms_sketch`, ≤ depth·width rows no
    matter the batch size) and sketches merge by ADDING bucket
    counts — the CMS merge identity.  The sum-merge can't ride the
    latest-wins upsert (it is an accumulation, not a replacement), so
    the foreachBatch stages the summed table through the same
    ``_staging``/tombstone promotion protocol
    :func:`streaming_upsert_sink` uses — crash-safe, and the state
    stays ≤ depth·width rows FOREVER.

    Replay caveat (stated, not hidden): foreachBatch is
    at-least-once, and unlike the max-merge HLL monitor a re-applied
    batch DOUBLE-counts — exactly-once accounting needs an epoch
    ledger or an idempotent store.  With the default
    ``availableNow`` trigger and a clean checkpoint the batch
    sequence replays deterministically; estimates remain upper bounds
    either way (CMS never undercounts).

    Query the state any time with
    :func:`~..operators.quality.cms_estimate` over
    ``spark.read.parquet(state_path)``.
    """
    import os
    import shutil

    from knot_another_pipeline_spark.operators.quality import cms_sketch

    if "://" in state_path and not state_path.startswith("file://"):
        raise ValueError(
            "streaming_cms_monitor stages its rewrite with local renames; "
            f"non-local state_path {state_path!r} is not supported"
        )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        staging = state_path.rstrip("/") + "_staging"
        tombstone = state_path.rstrip("/") + "_old"
        if not os.path.exists(state_path) and os.path.exists(
            os.path.join(staging, "_SUCCESS")
        ):
            os.replace(staging, state_path)
        if os.path.exists(tombstone):
            shutil.rmtree(tombstone)
        batch_sketch = cms_sketch(
            batch_df, item_col=item_col, depth=depth, width=width
        )
        if os.path.exists(state_path):
            existing = spark.read.parquet(state_path)
            merged = (
                existing.unionByName(batch_sketch)
                .groupBy("d", "bucket")
                .agg(F.sum("n").cast("bigint").alias("n"))
            )
        else:
            merged = batch_sketch
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(state_path):
            os.replace(state_path, tombstone)
        os.replace(staging, state_path)
        if os.path.exists(tombstone):
            shutil.rmtree(tombstone)

    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(merge_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_fairness_monitor(
    stream: DataFrame,
    *,
    group_col: str,
    score_col: str,
    label_col: str,
    ts_col: str,
    threshold: float,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(group, tumbling-window) live fairness readout of a
    thresholded scorer — the streaming companion of
    ``operators.evaluation.group_fairness``: when a quality/toxicity
    classifier gates a corpus in flight, this monitors whether one
    slice's selection rate or error profile drifts away from the rest
    WITHOUT waiting for a batch audit.

    Same conditional-aggregate shape as the batch operator, windowed:
    one watermarked groupBy((group, window)) whose state is bounded by
    |groups| × open windows. Rates that need the window-global
    denominator (the dp gap vs overall) are deliberately NOT computed
    here — they need a second pass over the window and belong to the
    batch audit; the stream emits the per-group ingredients so any
    consumer can join two groups' rows and difference them.

    Output per (group, window): group, window_ts, n, base_rate,
    pos_rate, tpr, fpr — NULL where the denominator class is absent,
    exactly the batch operator's convention (verified by the
    batch-parity test).
    """
    y = F.col(label_col).cast("int")
    pred = (F.col(score_col) >= F.lit(threshold)).cast("int")
    base = stream.filter(
        F.col(group_col).isNotNull()
        & F.col(score_col).isNotNull()
        & F.col(label_col).isNotNull()
    ).select(
        F.col(group_col).alias("group"),
        F.col(ts_col).alias("_ts"),
        y.alias("_y"),
        pred.alias("_p"),
    )
    yy = F.col("_y")
    pp = F.col("_p")
    return (
        base.withWatermark("_ts", watermark)
        .groupBy(
            "group", F.window(F.col("_ts"), window_duration).alias("win")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(yy).alias("base_rate"),
            F.avg(pp).alias("pos_rate"),
            (F.sum(pp * yy) / F.nullif(F.sum(yy), F.lit(0))).alias("tpr"),
            (
                F.sum(pp * (1 - yy))
                / F.nullif(F.sum(1 - yy), F.lit(0))
            ).alias("fpr"),
        )
        .select(
            "group",
            F.col("win.start").alias("window_ts"),
            F.col("n").cast("bigint").alias("n"),
            F.round("base_rate", 6).alias("base_rate"),
            F.round("pos_rate", 6).alias("pos_rate"),
            F.round("tpr", 6).alias("tpr"),
            F.round("fpr", 6).alias("fpr"),
        )
    )


def streaming_window_funnel(
    stream: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int = 86_400,
    watermark: str = "2 hours",
):
    """Stateful time-boxed funnel monitor — the streaming twin of
    ``operators.behavior.window_funnel`` (ClickHouse ``windowFunnel``
    semantics): per user, the longest in-order step chain fitting in
    ``window_seconds`` of its first event, emitted as an append row
    every time the user FIRST reaches a new level.

    The batch DP is order-sensitive, so per-user state keeps two bounded
    pieces via ``applyInPandasWithState``:

    - ``starts``: the max-start DP accumulator over events already
      folded (``len(steps)`` longs — a later chain start strictly
      dominates, exactly the batch accumulator);
    - a PENDING buffer of (ts, step) pairs not yet ordered-safe: an
      event folds only once the watermark passes it (strictly), because
      an earlier-timestamped event can still arrive until then.  The
      buffer is bounded by the watermark horizon × the user's event
      rate — the same bound every other monitor's state carries.

    Replay/at-least-once delivery is free: folding a duplicate event
    re-applies ``max`` against the same value, so the DP is idempotent
    and no level row is emitted twice.  Events later than the watermark
    are dropped by Spark upstream, identical to the other monitors.

    Output stream (append): uid, funnel_level, reached_ts — the level
    trace is monotone per user; the max row per user equals the batch
    operator's level for every user that reached step 1.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    if len(steps) < 2:
        raise ValueError(f"need at least 2 steps, got {steps!r}")
    k = len(steps)
    step_idx = {s: i + 1 for i, s in enumerate(steps)}
    win_ms = int(window_seconds) * 1000

    out_schema = StructType(
        [
            StructField("uid", StringType()),
            StructField("funnel_level", IntegerType()),
            StructField("reached_ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("starts", ArrayType(LongType(), containsNull=True)),
            StructField("pend_t", ArrayType(LongType())),
            StructField("pend_l", ArrayType(IntegerType())),
        ]
    )

    def _fold(starts, events):
        """Apply ordered (t_ms, level) events to the DP; yield first-
        reach (level, t_ms) emissions."""
        hits = []
        for t, l in events:
            if l == 1:
                if starts[0] is None:
                    hits.append((1, t))
                    starts[0] = t
                elif t > starts[0]:
                    starts[0] = t
            else:
                prev = starts[l - 2]
                if prev is not None and t <= prev + win_ms:
                    if starts[l - 1] is None:
                        hits.append((l, t))
                        starts[l - 1] = prev
                    elif prev > starts[l - 1]:
                        starts[l - 1] = prev
        return hits

    def update(key, pdfs, state: GroupState):
        (uid,) = key
        if state.exists:
            starts, pend_t, pend_l = state.get
            starts = list(starts)
            pending = list(zip(pend_t, pend_l))
        else:
            starts = [None] * k
            pending = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ms = (
                    pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000
                ).tolist()
                for t, typ in zip(ms, pdf["typ"].tolist()):
                    l = step_idx.get(typ)
                    if l is not None:
                        pending.append((int(t), l))
        wm = state.getCurrentWatermarkMs()
        ripe = sorted(e for e in pending if e[0] < wm)
        pending = [e for e in pending if e[0] >= wm]
        hits = _fold(starts, ripe)
        state.update(
            (
                starts,
                [t for t, _ in pending],
                [l for _, l in pending],
            )
        )
        if pending:
            # re-arm so the buffer folds when the watermark passes it
            # even if the user never fires another event
            state.setTimeoutTimestamp(wm + 1)
        if hits:
            yield pd.DataFrame(
                {
                    "uid": [uid] * len(hits),
                    "funnel_level": [l for l, _ in hits],
                    "reached_ts": pd.to_datetime(
                        [t for _, t in hits], unit="ms"
                    ),
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).cast("string").alias("uid"),
            F.col(type_col).cast("string").alias("typ"),
            F.col(ts_col).alias("ts"),
        )
        .filter(F.col("typ").isin(*steps))
        .groupBy("uid")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_msprt_monitor(
    stream: DataFrame,
    *,
    ts_col: str,
    arm_col: str,
    value_col: str,
    control: str,
    treatment: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-tumbling-window experiment moment increments — the
    streaming feeder for the always-valid mixture-SPRT readout
    (``operators.evaluation.msprt_from_moments``): mSPRT is THE test
    built for continuous peeking, so its natural home is a stream
    that appends one moment row per closed window which the readout
    view re-reduces into Λ and the running-min p at query time.

    The cumulative sums and the running min CANNOT live in the
    stream: they are unbounded-lookback aggregates over all prior
    windows, which append-mode watermarked aggregation correctly
    refuses to express.  The split is therefore: stream = bounded
    per-window conditional moments (state bounded by open windows,
    exactly the :func:`streaming_fairness_monitor` shape), batch view
    = the per-look window math over one row per look.

    Output per window (column names are exactly
    ``msprt_from_moments``' contract): look (window start), dnc, dsc,
    dqc, dnt, dst, dqt.
    """
    v = F.col(value_col).cast("double")
    arm = F.col(arm_col).cast("string")
    is_c = arm == F.lit(control)
    is_t = arm == F.lit(treatment)
    base = stream.filter(v.isNotNull() & (is_c | is_t)).select(
        F.col(ts_col).alias("_ts"),
        F.when(is_c, 1.0).otherwise(0.0).alias("_ic"),
        F.when(is_c, v).otherwise(0.0).alias("_vc"),
        F.when(is_c, v * v).otherwise(0.0).alias("_qc"),
        F.when(is_t, 1.0).otherwise(0.0).alias("_it"),
        F.when(is_t, v).otherwise(0.0).alias("_vt"),
        F.when(is_t, v * v).otherwise(0.0).alias("_qt"),
    )
    return (
        base.withWatermark("_ts", watermark)
        .groupBy(F.window(F.col("_ts"), window_duration).alias("win"))
        .agg(
            F.sum("_ic").alias("dnc"),
            F.sum("_vc").alias("dsc"),
            F.sum("_qc").alias("dqc"),
            F.sum("_it").alias("dnt"),
            F.sum("_vt").alias("dst"),
            F.sum("_qt").alias("dqt"),
        )
        .select(
            F.col("win.start").alias("look"),
            "dnc",
            "dsc",
            "dqc",
            "dnt",
            "dst",
            "dqt",
        )
    )


def streaming_page_hinkley_feeder(
    stream: DataFrame,
    *,
    ts_col: str,
    series_col: str,
    value_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-tumbling-window mean increments — the streaming feeder for
    the Page–Hinkley drift readout (``operators.temporal.
    page_hinkley``): PH's running mean, cumulative deviation, and
    running minimum are unbounded-lookback recurrences over ALL prior
    looks, which append-mode watermarked aggregation correctly refuses
    to express — the same stream-feeder/batch-view split as
    :func:`streaming_msprt_monitor`.  The stream appends one bounded
    row per closed (series, window); the batch view runs
    ``page_hinkley(series_col="series", order_col="win_start",
    value_col=sum/n)`` over the accumulated rows at query time.

    State is bounded by open windows × live series (the
    :func:`streaming_fairness_monitor` argument); payload rows never
    accumulate in state.

    Output per closed window: series, win_start, n, total (Σ value) —
    mean reconstructs as total/n at read time so late re-emits of the
    same window stay mergeable upstream.
    """
    v = F.col(value_col).cast("double")
    base = stream.filter(v.isNotNull()).select(
        F.col(ts_col).alias("_ts"),
        F.col(series_col).cast("string").alias("series"),
        v.alias("_v"),
    )
    return (
        base.withWatermark("_ts", watermark)
        .groupBy(
            "series", F.window(F.col("_ts"), window_duration).alias("win")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_v").alias("total"),
        )
        .select(F.col("series"), F.col("win.start").alias("win_start"),
                "n", "total")
    )
