"""Posting-list pair generation for bounded-group co-occurrence joins.

The classic co-occurrence shape — "every pair of ids sharing a key" —
is usually written as a self-equi-join on the key with an ``a < b``
orientation filter.  That pays the key's shuffle twice (both join
sides), runs the join machinery to emit the d² rows, and for string
keys (shingles) ships the key bytes through both exchanges.

When per-key group sizes are BOUNDED (a stop-shingle df cap, an order's
line count, a session's item count), the same pairs can come from ONE
aggregation: collect the ids per key into a sorted posting list, then
enumerate the C(d, 2) ordered pairs row-locally with two chained
generators (``posexplode`` + ``explode(slice(...))`` — native Generate
nodes, no interpreted higher-order functions).  One exchange of the
key instead of two, no join, and the key bytes never ship a second
time (guide §2.3 "shuffle fewer bytes", §2.4 "remove shuffles
outright").

Use ONLY where the group size is bounded by construction or by an
explicit pre-filter: an unbounded hot key would build its whole
posting list in one aggregation buffer — the exact job-killer the df
caps exist to prevent.  Callers keep their df-cap prefilter BEFORE
collecting postings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sorted_pairs_from_postings(
    posts: DataFrame,
    *,
    items_col: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """All ordered pairs ``(x, y)`` with ``x < y`` from each row's
    posting-list array (need not be pre-sorted; sorted internally so
    enumeration order gives ``x <= y`` by construction).

    Exactly reproduces the multiset semantics of the
    ``a JOIN b ON key AND a.id < b.id`` self-join: duplicates in the
    list yield d_a·d_b pairs and equal ids never pair.  Pure Generate
    nodes — no shuffle, no interpreted lambda per element.
    """
    items = F.sort_array(F.col(items_col))
    ex = posts.select(
        *[F.col(c) for c in keep_cols],
        items.alias("_items"),
        F.posexplode(items).alias("_i", a_col),
    )
    tail: Column = F.slice(
        F.col("_items"),
        F.col("_i") + F.lit(2),
        F.size(F.col("_items")) - F.col("_i") - F.lit(1),
    )
    return ex.select(
        *[F.col(c) for c in keep_cols],
        F.col(a_col),
        F.explode(tail).alias(b_col),
    ).filter(F.col(a_col) < F.col(b_col))


__all__ = ["sorted_pairs_from_postings"]
