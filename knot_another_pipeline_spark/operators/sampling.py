"""Deterministic sampling, splitting, and budgeted selection.

Training pipelines need *reproducible* subsets — a rerun must pick the
same rows (`df.sample()` cannot promise that across partitionings, and a
random split leaks between train and test on re-ingest). Everything here
keys on the stable sha256 bucket (`functions.hashing.stable_bucket`, the
same primitive the reference uses for its silver `bucket_id`,
``/root/reference/pipelines/ais_pipeline.py:517-518``), so membership is
a pure function of the row id: deterministic, engine-portable (the DuckDB
oracle reproduces it), and stable under repartitioning, retries, and
incremental appends.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from knot_another_pipeline_spark.functions.hashing import hash_hex, stable_bucket


def hash_sample(
    df: DataFrame, *, id_col: str, percent: int, buckets: int = 100
) -> DataFrame:
    """Deterministic ``percent``% sample: keep rows whose stable bucket
    falls below the cutoff. A pure map-side filter — no shuffle, no RNG
    state — so the same ids are sampled at any scale and on reruns."""
    if not 0 <= percent <= buckets:
        raise ValueError(f"percent must be in [0, {buckets}]")
    return df.filter(
        stable_bucket(F.col(id_col).cast("string"), buckets) < F.lit(percent)
    )


def split_by_hash(
    df: DataFrame,
    *,
    id_col: str,
    weights: dict[str, int],
    buckets: int = 100,
) -> DataFrame:
    """Reproducible train/val/test assignment: bucket ranges in the given
    order (e.g. ``{"train": 90, "val": 5, "test": 5}`` → buckets 0-89,
    90-94, 95-99). Adds a ``split`` column; rows never migrate between
    splits across reruns or appends — the leakage guarantee random
    splitting can't give an incremental pipeline."""
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    if sum(weights.values()) != buckets:
        raise ValueError(f"weights must sum to {buckets}: {weights}")
    b = stable_bucket(F.col(id_col).cast("string"), buckets)
    expr = F.lit(None).cast("string")
    lo = 0
    for name, w in weights.items():
        expr = F.when((b >= lo) & (b < lo + w), F.lit(name)).otherwise(expr)
        lo += w
    return df.withColumn("split", expr)


def token_budget_select(
    df: DataFrame,
    *,
    id_col: str,
    score_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Greedy quality-ordered selection up to a token budget: take
    documents in (score DESC, id ASC) order while the running token sum
    stays within ``budget`` — the standard data-mixing step when a
    training run buys the best N tokens, not the best N documents.

    Scale shape — a naive ``sum() OVER (ORDER BY score)`` is a
    single-partition global window. Instead this runs the classic
    distributed prefix-sum: (1) per-score token totals (bounded by
    distinct score values), (2) an exclusive running offset over that
    table (the only single-partition window), (3) offsets joined back,
    and the within-score cumulative sum windows partition BY score — so
    no stage ever funnels the corpus through one task.

    The offsets table's size is the number of *distinct score values*:
    small for rounded/bucketed scores, but ~N for a continuous score
    (raw perplexity), where a forced broadcast would OOM the driver. The
    join is therefore left to AQE, which broadcasts exactly when the
    built side is actually small (`token_budget_by_group` makes the same
    call). For continuous scores, also note the single-partition offset
    window in step (2) degrades to a global sort — round the score
    first (e.g. ``F.round(score, 3)``); ties break by id so selection
    stays deterministic.
    Rows with a NULL score are *not selectable* and are dropped up front
    (explicitly — a NULL grouping key would otherwise silently vanish in
    the offsets join): an unscorable document has no place in a
    quality-ordered ranking.
    Output: id, score, n_tokens, cum_tokens (rows with cum_tokens ≤
    budget).
    """
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(score_col).alias("score"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
    ).filter(F.col("score").isNotNull())
    totals = s.groupBy("score").agg(F.sum("n_tokens").alias("bucket_tokens"))
    # exclusive prefix over the per-score totals (higher scores first)
    w_off = (
        Window.orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0))
    ).select("score", "offset")
    w_in = Window.partitionBy("score").orderBy(F.col("id").asc())
    return (
        s.join(offsets, "score")
        .withColumn(
            "cum_tokens", F.col("offset") + F.sum("n_tokens").over(w_in)
        )
        .filter(F.col("cum_tokens") <= F.lit(budget))
        .select("id", "score", "n_tokens", "cum_tokens")
    )


def assign_shards(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    tokens_per_shard: int,
    bucket_width: int | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic balanced sharding: assign documents (in id order) to
    consecutive shards of ~``tokens_per_shard`` tokens — the writer-side
    step that turns a filtered corpus into evenly sized training files.

    ``group_col`` restarts the numbering per group: with
    ``group_col='split'`` each of train/val/test gets its own shard 0..k
    and every shard holds ~``tokens_per_shard`` tokens *of that split* —
    the right shape when shards are written under ``partitionBy(split)``
    directories (a globally-numbered shard would be spread across split
    directories and systematically under-filled per split).

    ``shard = floor((cum_tokens - n_tokens) / tokens_per_shard)`` over
    the id-ordered running sum, i.e. a document starts the shard its
    first token falls in (a document may straddle a boundary; shards are
    approximately, not exactly, equal — exact packing is a sequential
    bin-pack no engine parallelizes deterministically).

    The running sum is the distributed prefix-sum again, but the
    partition key must preserve id ORDER (a hash bucket would interleave
    ids across buckets and corrupt the cumsum), so it is the id *range*
    bucket ``floor(id / bucket_width)`` — numeric ids required, same rule
    (and same remedy: pre-hash to bigint) as ``similarity.assign_cells``.
    Per-bucket totals, an exclusive offset window over the totals table
    (``~N/bucket_width`` rows), then within-bucket cumulative sums
    ordered by id. ``bucket_width`` sizes against the id SPACING, not the
    row count: pick it so rows-per-bucket ≈ buckets ≈ √N. By default it is
    DERIVED from the data — one cheap ``(min, max, count)`` aggregate,
    then ``width = (max-min+1) / √N`` — which lands on √N-row buckets for
    dense sequential ids AND for ids hashed uniformly over 2⁶⁴ (where a
    fixed small default would put ~1 row per bucket, balloon the offsets
    table to ~N rows, and rebuild the single-task funnel this function
    exists to avoid). Pass ``bucket_width`` explicitly only to pin plans
    across runs. The offsets join is left to Catalyst/AQE — broadcast
    while the totals table is small, shuffle join beyond — rather than
    force-broadcast (a mis-sized width must degrade to a shuffle, not
    ship ~N rows through the driver).
    Output: id, n_tokens, shard.
    """
    s = _id_ordered_cumsum(
        df,
        id_col=id_col,
        token_col=token_col,
        bucket_width=bucket_width,
        group_col=group_col,
    )
    return s.withColumn(
        "shard",
        F.floor(
            (F.col("cum") - F.col("n_tokens")) / F.lit(tokens_per_shard)
        ).cast("bigint"),
    ).select("id", "n_tokens", "shard")


def _id_ordered_cumsum(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    bucket_width: int | None,
    group_col: str | None = None,
) -> DataFrame:
    """Shared distributed prefix-sum over id order (see ``assign_shards``
    for the full scale rationale): id-range buckets preserve order, the
    only single-partition window runs over the ~√N-row totals table, the
    offsets join is left to AQE. Returns (id, n_tokens, cum[, g]).

    The id must be integral: the order-preserving range bucket is
    ``floor(id / width)``, and a string id would cast to NULL and
    silently collapse every row into one null bucket — one task doing
    the whole cumsum, masked as success. Validated for every caller
    (assign_shards, pack_sequences)."""
    id_type = dict(df.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"id-ordered cumsum requires an integral id column; "
            f"{id_col!r} is {id_type!r} (hash string ids to a bigint "
            "first, e.g. functions.hashing.hash64, and set bucket_width "
            "to 2**64 // sqrt(N))"
        )
    if bucket_width is None:
        lo, hi, n = df.select(
            F.min(id_col), F.max(id_col), F.count(F.lit(1))
        ).first()
        if n == 0 or lo is None:
            bucket_width = 1
        else:
            span = int(hi) - int(lo) + 1
            bucket_width = max(1, round(span / max(1.0, float(n) ** 0.5)))
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    grp = (
        [F.col(group_col).alias("g")] if group_col is not None else []
    )
    grp_keys = ["g"] if group_col is not None else []
    s = df.select(
        *grp,
        F.col(id_col).alias("id"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
    ).withColumn("b", F.floor(F.col("id") / F.lit(bucket_width)))
    totals = s.groupBy(*grp_keys, "b").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w_off = (
        Window.partitionBy(*grp_keys)
        .orderBy(F.col("b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0))
    ).select(*grp_keys, "b", "offset")
    w_in = Window.partitionBy(*grp_keys, "b").orderBy(F.col("id").asc())
    return (
        s.join(offsets, [*grp_keys, "b"])
        .withColumn("cum", F.col("offset") + F.sum("n_tokens").over(w_in))
        .select(*grp_keys, "id", "n_tokens", "cum")
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    seq_len: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end in id
    order and cut the token stream into fixed ``seq_len`` training
    windows — the standard LM-pretraining example-assembly step (every
    window is exactly ``seq_len`` tokens; documents cross window
    boundaries rather than padding them).

    Where ``assign_shards`` maps documents to ~equal *files*, this maps
    them to exact-length *training sequences* and reports where inside
    the window each document lands — what a writer needs to emit packed
    examples without re-tokenizing: the pack a document starts in, its
    token offset inside that pack, and how many packs it spans.

    Scale shape: the id-ordered running sum is the same distributed
    prefix-sum as ``assign_shards`` (id-range buckets, √N-row offsets
    table, AQE join); everything after is row-local arithmetic. No
    global window, no driver state. Zero-token documents are dropped
    up front (they occupy no window; keeping them would pin ambiguous
    pack ids to empty rows).

    Output: id, n_tokens, pack_id (0-based), offset_in_pack (0-based
    token offset where the document starts), n_packs_spanned.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    s = _id_ordered_cumsum(
        df.filter(F.col(token_col).cast("bigint") > 0),
        id_col=id_col,
        token_col=token_col,
        bucket_width=None,
    )
    start = F.col("cum") - F.col("n_tokens")
    first_pack = F.floor(start / F.lit(seq_len)).cast("bigint")
    last_pack = F.floor((F.col("cum") - 1) / F.lit(seq_len)).cast("bigint")
    return s.select(
        "id",
        "n_tokens",
        first_pack.alias("pack_id"),
        F.pmod(start, F.lit(seq_len)).cast("bigint").alias("offset_in_pack"),
        (last_pack - first_pack + 1).alias("n_packs_spanned"),
    )


def token_budget_by_group(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    score_col: str,
    token_col: str,
    budget_per_group: int,
) -> DataFrame:
    """Data mixing: an independent greedy token budget per group
    (source/domain/language) — the standard recipe step "take the best N
    tokens from each domain".

    Same distributed prefix-sum as :func:`token_budget_select`, with the
    group key prepended to every partitioning: per-(group, score) totals,
    offset windows partitioned by group (rows per partition = that
    group's distinct scores), within-(group, score) cumulative sums.
    Nothing ever funnels a whole group's documents — let alone the corpus
    — through one task. Unlike the single-budget variant, the offsets
    table here is (groups × distinct scores) — unbounded in group count —
    so it is NOT force-broadcast; Catalyst/AQE picks the join strategy
    (broadcast while it fits, shuffle join beyond). NULL scores or group
    keys are dropped up front (documented non-selectable, as in
    :func:`token_budget_select`).
    Output: group, id, score, n_tokens, cum_tokens (rows within their
    group's budget).
    """
    s = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.col(score_col).alias("score"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
    ).filter(F.col("score").isNotNull() & F.col("grp").isNotNull())
    totals = s.groupBy("grp", "score").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w_off = (
        Window.partitionBy("grp")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0))
    ).select("grp", "score", "offset")
    w_in = Window.partitionBy("grp", "score").orderBy(F.col("id").asc())
    return (
        s.join(offsets, ["grp", "score"])
        .withColumn(
            "cum_tokens", F.col("offset") + F.sum("n_tokens").over(w_in)
        )
        .filter(F.col("cum_tokens") <= F.lit(budget_per_group))
        .select(
            F.col("grp").alias(group_col), "id", "score", "n_tokens",
            "cum_tokens",
        )
    )


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: k rows where
    inclusion probability is proportional to ``weight_col`` — the
    quality-weighted corpus subsampling step (sample 10M docs favoring
    high quality scores, reproducibly).

    Algorithm A-ES (Efraimidis & Spirakis 2006): each row gets key
    ``ln(u) / w`` with u uniform in (0,1); the k LARGEST keys are the
    sample. u is md5-derived from (seed, id) — no RNG state, so the
    same (data, seed, k) yields the same sample in any engine with
    md5(), executor count and partitioning included. Changing ``seed``
    redraws.

    Scale: the key is a codegen expression; top-k-by-key compiles to
    TakeOrderedAndProject (per-partition top-k, then merge of k·P rows)
    — never a global sort. One pass, no shuffle of the corpus.

    Rows with NULL, zero, or negative weight are excluded (they have no
    sampling probability). Ties are broken by id for full determinism.
    """
    from knot_another_pipeline_spark.functions.hashing import hash64

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # u in (0, 1]: (h + 1) / 2^60 over the 60-bit nonnegative hash64
    u = (hash64(F.col(id_col), seed=seed).cast("double") + 1.0) / F.lit(
        float(1 << 60)
    )
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("_sample_key", key)
        .orderBy(F.col("_sample_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_sample_key")
    )


def stratified_cap(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    cap: int,
    seed: int = 0,
) -> DataFrame:
    """Cap every group at ``cap`` rows, chosen deterministically — the
    class-balancing step for training sets (no language/domain/label may
    dominate): groups under the cap keep everything, groups over it keep
    a reproducible hash-ranked subset (md5 of (seed, id) — a uniform
    random draw that is identical in any engine and independent of
    partitioning). Changing ``seed`` redraws; changing ``cap`` only
    extends/truncates the same ranking, so caps can be tuned without
    reshuffling which rows survive the smaller cap.

    One shuffle on the group key; the per-group ranking window is the
    standard top-k shape (for a pathologically hot group, route through
    ``operators.relational.grouped_topk`` with the same hash as the
    order column).
    """
    from knot_another_pipeline_spark.functions.hashing import hash_hex

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(group_col).orderBy(
        hash_hex(id_col, seed=seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def stratified_sample(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum FRACTION sampling — the reproducible
    ``df.sampleBy``: each group keeps its configured share of rows,
    chosen by stable id hash instead of RNG, so reruns, appends, and
    other engines (the DuckDB oracle) select the identical ids.

    Complements :func:`stratified_cap` (exact per-group row CAP): a cap
    bounds absolute volume, a fraction preserves relative composition —
    down-sampling an over-represented language to 10% keeps its
    internal distribution intact. Unlisted groups get
    ``default_fraction`` (0 = drop, 1 = keep all).

    A pure map-side filter — no shuffle, no per-group state: the
    fraction lookup compiles to a CASE chain over the group column and
    the keep decision is ``stable_bucket(id) < fraction·buckets``.
    Granularity is 1/``buckets`` (default 10⁴ → 0.01 %; cutoffs round
    HALF-UP, so any fraction ≥ 1/(2·buckets) keeps at least one
    bucket); as with
    hash_sample, a larger fraction's selection is a SUPERSET of a
    smaller one's, so tightening a mix never resamples ids.

    Output: input rows that survive their stratum's fraction.
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(
            f"default_fraction must be in [0, 1], got {default_fraction}"
        )
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")

    def _cut(f: float) -> int:
        # consistent half-UP (floor(x+0.5)), not Python's half-to-even:
        # 0.00005*10000 = 0.5 must keep ONE bucket, not silently zero
        import math as _math

        return int(_math.floor(f * buckets + 0.5))

    cutoff = F.lit(_cut(default_fraction))
    for g, f in sorted(fractions.items()):
        cutoff = F.when(
            F.col(group_col) == F.lit(g), F.lit(_cut(f))
        ).otherwise(cutoff)
    return df.filter(
        stable_bucket(F.col(id_col).cast("string"), buckets) < cutoff
    )


def temperature_mix(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based group rebalancing: downsample each group so the
    kept mix follows ``q_g ∝ p_g^α`` instead of the natural frequencies
    ``p_g`` — the standard multilingual/multi-source balancing step
    (α < 1 flattens the distribution toward uniform; α = 1 keeps it;
    α = 0 targets fully uniform). Downsample-only: the keep fraction is
    ``p_g^(α−1)`` normalized so the rarest group keeps everything —
    no row is ever duplicated (deterministic pipelines upsample at the
    *reader*, by epoch-dependent repetition, not in the corpus).

    Selection is the stable-hash acceptance filter (same md5 machinery
    as ``hash_sample``): a row survives iff its normalized 60-bit hash
    fraction < its group's keep fraction — reproducible run-to-run,
    engine-to-engine, and monotone in α (a corpus mixed at a lower
    temperature is a subset of one mixed at a higher keep profile).

    Scale shape: group stats are one hash aggregate reduced to
    #groups rows; the max-normalizer is a 1-row broadcast cross join;
    the fraction joins back by group key (AQE broadcasts — #groups is
    languages/sources, not corpus-scale) and the acceptance test is a
    pure map-side codegen filter. One data-sized shuffle total (the
    stats aggregate reads the corpus; the filter does not shuffle).

    Output: id, group, keep_fraction (rounded 6; diagnostic), for kept
    rows only.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    # NULL groups are dropped UP FRONT, explicitly: groupBy would count
    # them into the totals but the fractions equi-join (null ≠ null)
    # would silently drop their rows — rows that influence every other
    # group's keep fraction yet never appear in the output. Same rule
    # as token_budget_select's null scores: an ungrouped row has no
    # place in a per-group rebalance.
    s = df.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp")
    ).filter(F.col("grp").isNotNull())
    counts = s.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(F.sum("n").alias("total"))
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "grp",
        F.pow(
            F.col("n").cast("double") / F.col("total").cast("double"),
            F.lit(alpha - 1.0),
        ).alias("r"),
    )
    norm = rates.agg(F.max("r").alias("r_max"))
    fractions = rates.crossJoin(F.broadcast(norm)).select(
        "grp", (F.col("r") / F.col("r_max")).alias("keep_fraction")
    )
    frac = (
        F.conv(hash_hex(F.col("id")), 16, 10).cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        s.join(fractions, "grp")
        .filter(frac < F.col("keep_fraction"))
        .select(
            "id",
            F.col("grp").alias(group_col),
            F.round("keep_fraction", 6).alias("keep_fraction"),
        )
    )


def negative_samples(
    interactions: DataFrame,
    items: DataFrame,
    *,
    user_col: str,
    item_col: str,
    k: int = 4,
    oversample: int = 2,
    seed: int = 0,
) -> DataFrame:
    """Deterministic negative sampling for recommender / contrastive
    training data: for each user, ``k`` items the user has NOT
    interacted with, drawn pseudo-randomly but reproducibly — the same
    negatives on every rerun, any partitioning, any engine (md5-derived
    draws; the DuckDB oracle replays them exactly). Implicit-feedback
    training is impossible without this step, and ``df.sample`` can
    neither exclude positives nor promise stability.

    Shape: items get dense indices via ``global_rank`` (range partition
    + per-partition offset prefix sum — no single-task global window,
    so even a billion-item catalog indexes in parallel); each user
    row-locally explodes ``k·oversample``
    draw attempts, attempt j targeting index ``hash64(user:j:seed) mod
    n_items``; drawn items resolve through an equi-join on the index
    (AQE broadcasts the dimension), positives fall out via a left-anti
    join on (user, item) — the only interactions-sized shuffle —
    repeat draws of one item keep their earliest attempt, and the
    first ``k`` survivors by attempt order win. Heavy users can
    exhaust ``k·oversample`` attempts (collisions with their own
    positives); raise ``oversample`` — rejection odds decay
    geometrically in attempts × (1 − catalog-fraction-interacted).

    Output: user, item, neg_rank (1..k, stable draw order).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    from knot_another_pipeline_spark.functions.hashing import hash64

    from knot_another_pipeline_spark.operators.relational import global_rank

    inter = interactions.select(
        F.col(user_col).alias("user"), F.col(item_col).alias("item")
    )
    # Dense item index via the distributed ranking recipe (range
    # partition + per-partition offsets), NOT row_number() OVER (ORDER
    # BY item) — that window funnels the whole item catalog through one
    # task, the exact anti-pattern global_rank exists to avoid.
    indexed = global_rank(
        items.select(F.col(item_col).alias("item")).distinct(),
        [F.col("item").asc()],
        rank_col="_rk",
    ).select("item", (F.col("_rk") - 1).alias("_idx"))
    n_items = indexed.agg(F.count(F.lit(1)).alias("_n"))
    m = k * oversample
    attempts = (
        inter.select("user")
        .distinct()
        .crossJoin(F.broadcast(n_items))
        .select(
            "user",
            "_n",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"),
        )
        .select(
            "user",
            "j",
            F.pmod(
                hash64(
                    F.concat_ws(":", F.col("user"), F.col("j")), seed=seed
                ),
                F.col("_n"),
            ).alias("_idx"),
        )
    )
    drawn = attempts.join(indexed, "_idx").select("user", "item", "j")
    negatives = (
        drawn.join(inter, ["user", "item"], "left_anti")
        .groupBy("user", "item")
        .agg(F.min("j").alias("j"))
    )
    rank_w = Window.partitionBy("user").orderBy("j")
    return (
        negatives.withColumn("neg_rank", F.row_number().over(rank_w))
        .filter(F.col("neg_rank") <= k)
        .select("user", "item", F.col("neg_rank").cast("bigint").alias("neg_rank"))
    )


def effective_sample_size(
    df: DataFrame,
    *,
    group_cols: list[str],
    weight_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kish effective sample size per group — ``ESS = (Σw)²/Σw²`` — the
    honesty check on every weighted dataset this module produces
    (``dsir_weights`` importance weights, ``temperature_mix`` slice
    weights, survey-style reweighting): n weighted rows do NOT carry n
    rows of information, and when a few huge weights dominate, ESS
    collapses and downstream estimates are noise.  Report ESS next to
    any weighted metric or resampling step; ``ess_ratio`` < ~0.5 means
    the weighting is doing violence to the sample.

    ONE hash aggregate (Σw, Σw², max w, n) with map-side partials —
    zero joins, zero windows, constant state per group.  Rows with
    NULL, zero or negative weights are excluded (and counted), since
    they carry no resampling mass.

    Output per group: group_cols…, n, n_excluded, sum_w, ess,
    ess_ratio (= ess/n), max_w_share (= max w / Σw, rounded).
    """
    if not group_cols:
        raise ValueError("group_cols must not be empty")
    w = F.col(weight_col).cast("double")
    ok = w.isNotNull() & (w > 0)
    agg = df.groupBy(*group_cols).agg(
        F.sum(F.when(ok, 1).otherwise(0)).alias("_n"),
        F.sum(F.when(~ok | w.isNull(), 1).otherwise(0)).alias("_nx"),
        F.sum(F.when(ok, w)).alias("_sw"),
        F.sum(F.when(ok, w * w)).alias("_sww"),
        F.max(F.when(ok, w)).alias("_mw"),
    )
    ess = F.when(
        F.col("_sww") > 0, F.col("_sw") * F.col("_sw") / F.col("_sww")
    )
    return agg.select(
        *group_cols,
        F.col("_n").cast("bigint").alias("n"),
        F.col("_nx").cast("bigint").alias("n_excluded"),
        F.round("_sw", round_to).alias("sum_w"),
        F.round(ess, round_to).alias("ess"),
        F.round(
            F.when(F.col("_n") > 0, ess / F.col("_n")), round_to
        ).alias("ess_ratio"),
        F.round(
            F.when(F.col("_sw") > 0, F.col("_mw") / F.col("_sw")), round_to
        ).alias("max_w_share"),
    )


def reweight_to_target(
    df: DataFrame,
    *,
    group_col: str,
    target_shares: dict,
    round_to: int = 6,
) -> DataFrame:
    """Importance weights that reshape a corpus's group mix to a TARGET
    distribution — ``w_g = target_share_g / observed_share_g`` — the
    declarative half of dataset mixing: where ``temperature_mix``
    derives its target from a temperature exponent, this takes the
    target mix directly ("30% code, 60% web, 10% books") and emits the
    per-group weight to multiply into sampling probabilities or loss
    weights.  Shares are renormalized over the groups PRESENT in both
    the data and the target, so a missing group reweights the rest
    consistently instead of silently leaking mass.

    ONE hash aggregate to group counts (group-cardinality rows), then
    row-local arithmetic against broadcast literals — the corpus is
    scanned once and never joined.  Also reports the Kish effective
    sample size the weighting implies (``ESS = (Σn·w)²/Σn·w²``,
    computed over the group table) so the "did this weighting destroy
    my sample" check ships with the weights.

    Output per group: group, n, observed_share, target_share, weight,
    with ess / ess_ratio (corpus-wide, repeated; rounded).
    """
    if not target_shares:
        raise ValueError("target_shares must not be empty")
    if any(v < 0 for v in target_shares.values()):
        raise ValueError("target shares must be >= 0")
    tmap = F.create_map(
        *[
            x
            for k, v in sorted(target_shares.items())
            for x in (F.lit(k), F.lit(float(v)))
        ]
    )
    counts = (
        df.select(F.col(group_col).alias("group"))
        .filter(F.col("group").isNotNull())
        .groupBy("group")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("_t", tmap[F.col("group")])
        .filter(F.col("_t").isNotNull() & (F.col("_t") > 0))
    )
    totals = counts.agg(
        F.sum("n").alias("_nn"), F.sum("_t").alias("_tt")
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "group",
        "n",
        (F.col("n").cast("double") / F.col("_nn")).alias("_obs"),
        (F.col("_t") / F.col("_tt")).alias("_tgt"),
    )
    w = F.col("_tgt") / F.col("_obs")
    ess_tot = scored.select(
        (F.col("n") * w).alias("_nw"), (F.col("n") * w * w).alias("_nww")
    ).agg(
        F.sum("_nw").alias("_snw"),
        F.sum("_nww").alias("_snww"),
        F.sum(F.lit(0)).alias("_z"),
    )
    n_all = counts.agg(F.sum("n").alias("_n_all"))
    return (
        scored.crossJoin(F.broadcast(ess_tot))
        .crossJoin(F.broadcast(n_all))
        .select(
            "group",
            F.col("n").cast("bigint").alias("n"),
            F.round("_obs", round_to).alias("observed_share"),
            F.round("_tgt", round_to).alias("target_share"),
            F.round(w, round_to).alias("weight"),
            F.round(
                F.col("_snw") * F.col("_snw") / F.col("_snww"), round_to
            ).alias("ess"),
            F.round(
                F.col("_snw")
                * F.col("_snw")
                / F.col("_snww")
                / F.col("_n_all"),
                round_to,
            ).alias("ess_ratio"),
        )
    )


def shard_moves(
    df: DataFrame,
    *,
    key_col: str,
    n_from: int,
    n_to: int,
    round_to: int = 6,
) -> DataFrame:
    """Data-movement cost of resharding ``n_from`` → ``n_to`` shards
    under two placement schemes — the capacity-planning readout before
    a cluster resize:

    - ``mod``: shard = hash(key) % n — the naive scheme; changing n
      remaps almost every key (expected moved fraction ≈ 1 − 1/n_to
      for coprime sizes), so a resize rewrites the whole corpus;
    - ``rendezvous``: shard = argmax_s hash(s:key) (highest-random-
      weight / HRW hashing) — only keys whose winning shard changes
      move, expected ≈ |n_to − n_from|/max(n_from, n_to): a resize
      touches one shard's worth of data.

    Everything is row-local: the per-shard weights are a transform
    over a MATERIALIZED fixed-width hex-hash array (lexicographic max
    = numeric max, the ``hash_hex`` contract, so no base conversion),
    the winner is one ``array_max`` + ``array_position``, and the only
    aggregate is a 1-row count per scheme.  Candidate-shard count is
    the array width — resharding math never shuffles the corpus.

    Output (2 rows): scheme, n_keys, n_moved, moved_frac.
    """
    if n_from < 1 or n_to < 1:
        raise ValueError(f"shard counts must be >= 1, got {n_from}->{n_to}")
    key = F.col(key_col)
    base = df.filter(key.isNotNull()).select(key.alias("_k"))
    h = F.conv(hash_hex(F.col("_k"), seed=0), 16, 10).cast("bigint")
    mod = base.select(
        (F.pmod(h, F.lit(n_from)) != F.pmod(h, F.lit(n_to)))
        .cast("bigint")
        .alias("_moved")
    )
    n_max = max(n_from, n_to)
    weights = F.transform(
        F.sequence(F.lit(0), F.lit(n_max - 1)),
        lambda s: hash_hex(F.col("_k"), seed=s),
    )
    staged = base.select(F.col("_k"), weights.alias("_w"))
    owner_from = F.array_position(
        F.col("_wf"), F.array_max(F.col("_wf"))
    )
    owner_to = F.array_position(F.col("_w2"), F.array_max(F.col("_w2")))
    rdv = (
        staged.select(
            F.slice("_w", 1, n_from).alias("_wf"),
            F.slice("_w", 1, n_to).alias("_w2"),
        )
        .select((owner_from != owner_to).cast("bigint").alias("_moved"))
    )

    def _summary(moved: DataFrame, scheme: str) -> DataFrame:
        return moved.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.coalesce(F.sum("_moved"), F.lit(0))
            .cast("bigint")
            .alias("n_moved"),
        ).select(
            F.lit(scheme).alias("scheme"),
            "n_keys",
            "n_moved",
            F.round(
                F.col("n_moved") / F.nullif(F.col("n_keys"), F.lit(0)),
                round_to,
            ).alias("moved_frac"),
        )

    return _summary(mod, "mod").unionByName(_summary(rdv, "rendezvous"))
