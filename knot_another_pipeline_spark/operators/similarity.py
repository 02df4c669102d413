"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (BASELINE.json north star). Two tiers:

- :func:`cosine_topk` — exact brute-force top-k. The query side is small
  and gets broadcast; the corpus streams through in parallel, so the cost
  is one corpus scan per batch of queries — the right baseline, and at
  100 TB still viable when queries ≪ corpus because no shuffle of the
  corpus ever happens.
- :func:`lsh_bucket_topk` — random-hyperplane LSH variant: both sides map
  to sign-bit bucket keys; candidate pairs come from an equi-join on the
  bucket, so the corpus never cross-joins. Hyperplanes are derived
  deterministically from md5, so results are reproducible run-to-run
  (and the bucketing is expressible in the differential oracle).

Vector math is built-in higher-order functions (``zip_with`` +
``aggregate``) — JVM-side, no Python in the loop. The fold is sequential
over the array, so the floating-point sum order is deterministic —
differential engines computing the same left-to-right double fold match
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from knot_another_pipeline_spark.functions.hashing import hash64


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-to-right double fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Norms are precomputed on both sides (one pass each) so the join
    computes only the dot product. Self-matches (same id) are excluded.
    Ties broken by neighbor id for determinism.
    Output: query_id, neighbor_id, cos_sim, rank.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplane(plane_id: int, dim: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5 — computed on
    the driver once (tiny), broadcast as a literal array."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{plane_id}:{d}".encode()).hexdigest()
        comps.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
    return comps


def lsh_bucket_key(vec: Column, *, dim: int, num_planes: int = 8) -> Column:
    """Sign-bit bucket key: bit p set ⇔ vec·plane_p > 0."""
    key = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(p, dim)])
        bit = F.when(dot(vec, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        key = key * 2 + bit
    return key


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 6,
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket, then exact
    cosine re-rank within bucket. Recall < 1 by design; the scan is an
    equi-join on the bucket key instead of a cross join."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        lsh_bucket_key(F.col(vec_col), dim=dim, num_planes=num_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
        lsh_bucket_key(F.col(vec_col), dim=dim, num_planes=num_planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int = 50,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into Voronoi
    cells around a small deterministic centroid set (every
    ``centroid_stride``-th vector by id — reproducible without a
    training step), then search only the ``nprobe`` cells nearest each
    query.

    Scale shape: the centroid table is tiny and broadcast; cell
    assignment is the broadcast cross product reduced by an *aggregate*
    argmax (``max`` over ``struct(cos, -cent_id)``) — partial aggregation
    collapses the C-per-row expansion map-side, so the one shuffle
    carries a single row per corpus vector (a window/row_number
    formulation would shuffle and sort all C× rows). The candidate join
    is an equi-join on cell id touching ~nprobe/C of the corpus. Exact
    cosine re-ranks within the probed cells (recall < 1 by design).
    ``centroid_stride`` keeps the demo centroid set deterministic without
    a training step; a production deployment replaces it with a trained,
    *fixed-size* centroid table (stride keeps C ∝ corpus, which stops
    being broadcastable somewhere past 10⁶ cells).
    Output: query_id, neighbor_id, cos_sim, rank.
    """
    cents = corpus.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cent_id"),
        F.col(vec_col).alias("centv"),
        l2_norm(F.col(vec_col)).alias("centn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    # argmax by (cos desc, cent_id asc) — -cent_id makes struct-max break
    # ties toward the lowest centroid id, matching the oracle's
    # row_number ordering exactly.
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("cent_cos", dot(F.col("cv"), F.col("centv")) / (F.col("cn") * F.col("centn")))
        .groupBy("neighbor_id")
        .agg(
            F.first("cv").alias("cv"),
            F.first("cn").alias("cn"),
            F.max(
                F.struct(
                    F.col("cent_cos").alias("cos"),
                    (-F.col("cent_id")).alias("neg_id"),
                )
            ).alias("best"),
        )
        .select(
            "neighbor_id", "cv", "cn", (-F.col("best.neg_id")).alias("cell")
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cent_cos").desc(), F.col("cent_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_cos", dot(F.col("qv"), F.col("centv")) / (F.col("qn") * F.col("centn")))
        .withColumn("cent_rank", F.row_number().over(probe_w))
        .filter(F.col("cent_rank") <= nprobe)
        .select("query_id", "qv", "qn", F.col("cent_id").alias("cell"))
    )
    scored = (
        probes.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
