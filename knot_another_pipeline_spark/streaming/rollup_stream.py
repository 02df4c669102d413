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
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(uid_col).cast("string").alias("uid"),
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
