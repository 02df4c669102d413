"""Input-parallelism repair for expensive row-local pipelines.

The guide's §2.5 "input skew" case: an unsplittable input (one parquet
row group, a gzip file) gives the scan ONE task, so every row-local
transform chained on it — regex shingling, tokenization, per-word
replace chains — runs single-threaded no matter how many cores the
session has. The fix is the guide's: repartition immediately after the
read, paying one cheap shuffle of the raw rows to buy full parallelism
for the expensive map work.

``fan_out_small_scan`` applies that fix ADAPTIVELY: it is a no-op
whenever the input already has at least half the session's configured
shuffle parallelism (a 100 TB table scans as thousands of splits, so at
cluster scale this never fires), and repartitions to
``spark.sql.shuffle.partitions`` — the deployment's own scale knob —
when it does fire. Row-local results are partitioning-independent, so
downstream values are unchanged.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

#: Memo of the compiled plan's partition count per DataFrame OBJECT.
#: ``df.rdd.getNumPartitions()`` costs ~15 ms of physical planning per
#: call; with ``load_table`` returning the same memoized DataFrame
#: object across query builds, the count is a pure function of the
#: object (plans are immutable). Weak keys: dropping the DataFrame
#: drops the memo entry.
_NPART_MEMO: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` for row-local work if its plan has too few
    partitions for the session's parallelism; identity otherwise.

    Intended for the INPUT of regex/tokenization-heavy operators.
    Partition count is read from the compiled plan (no job is run);
    environments where that introspection is unavailable (e.g. Spark
    Connect) just keep the input as-is.
    """
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        try:
            n = spark.sparkContext.defaultParallelism
        except Exception:
            return df
    if n <= 1:
        return df
    try:
        cur = _NPART_MEMO.get(df)
    except TypeError:  # unhashable/not weakref-able DataFrame variant
        cur = None
    if cur is None:
        try:
            cur = df.rdd.getNumPartitions()
        except Exception:  # Spark Connect: no RDD handle — leave untouched
            return df
        try:
            _NPART_MEMO[df] = cur
        except TypeError:
            pass
    if cur >= max(2, n // 2):
        return df
    return df.repartition(n)
