"""ML feature engineering over relational tables: supervised target
encoding and the feature-hashing trick.

The bridge from warehouse tables to model matrices — the last step a
training-data pipeline runs before examples leave the cluster. Both
operators are deterministic (stable hashes, closed-form smoothing), so
feature values are reproducible across reruns and engines — the same
property the sampling/dedup stages guarantee, extended to features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from knot_another_pipeline_spark.functions.hashing import hash64

__all__ = [
    "binned_mutual_info",
    "class_weights",
    "dsir_weights",
    "feature_gain",
    "hash_features",
    "quantile_normalize",
    "target_encode",
    "woe_iv",
]


def target_encode(
    df: DataFrame,
    *,
    id_col: str,
    category_col: str,
    target_col: str,
    smoothing: float = 20.0,
    leave_one_out: bool = True,
) -> DataFrame:
    """Smoothed target encoding of a categorical column — replace each
    category with (a shrunk estimate of) the target mean among its
    rows, the classic high-cardinality categorical feature.

    ``leave_one_out=True`` (default) excludes the row's OWN target from
    its encoding — ``te_i = (sum_c − y_i + m·μ) / (n_c − 1 + m)`` — the
    standard leakage guard: with the row included, the feature
    memorizes its own label and the model overfits silently (a
    singleton category would encode exactly its target). ``m`` is the
    ``smoothing`` pseudo-count toward the global mean μ; a singleton
    category under LOO encodes exactly μ.

    Scale shape: one hash aggregate to per-category (n, sum) — bounded
    by the category cardinality — a 1-row global-mean broadcast, and a
    join back on the category (AQE broadcasts while the category table
    is small). The encoding itself is row-local arithmetic; rows with
    a NULL category or NULL target are dropped (neither side of the
    estimate is defined for them).

    Output: id, category, target, te (rounded 6).
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(category_col).alias("category"),
        F.col(target_col).cast("double").alias("target"),
    ).filter(F.col("category").isNotNull() & F.col("target").isNotNull())
    stats = s.groupBy("category").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("target").alias("_sum")
    )
    mu = s.agg(F.avg("target").alias("_mu"))
    joined = s.join(stats, "category").crossJoin(F.broadcast(mu))
    m = F.lit(float(smoothing))
    if leave_one_out:
        te = (F.col("_sum") - F.col("target") + m * F.col("_mu")) / (
            F.col("_n") - 1 + m
        )
    else:
        te = (F.col("_sum") + m * F.col("_mu")) / (F.col("_n") + m)
    return joined.select(
        "id", "category", "target", F.round(te, 6).alias("te")
    )


def hash_features(
    df: DataFrame,
    *,
    id_col: str,
    cols: list[str],
    num_features: int = 1 << 18,
) -> DataFrame:
    """The feature-hashing trick: categorical columns become sparse
    feature coordinates ``index = h(col=value) mod D`` with a ±1 sign
    hash — fixed-dimension model input with NO vocabulary table, no
    fitting pass, and graceful collision behavior (the sign hash makes
    colliding features cancel in expectation rather than add).

    Scale shape: entirely row-local until one hash aggregate on
    (id, index) that sums signs for within-row collisions — no
    vocabulary build, no broadcast, nothing proportional to category
    cardinality anywhere. md5-derived index and sign make the layout
    engine-portable (the DuckDB oracle reproduces it bit-for-bit) and
    stable across reruns — a model trained yesterday reads today's
    features.

    Output (sparse COO): id, feature_idx, feature_val — one row per
    distinct populated coordinate; NULL column values contribute no
    coordinate.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if num_features < 2:
        raise ValueError(f"num_features must be >= 2, got {num_features}")
    coords = []
    for c in cols:
        payload = F.concat(
            F.lit(c), F.lit("="), F.col(c).cast("string")
        )
        idx = F.pmod(hash64(payload), F.lit(num_features))
        sign = F.when(
            F.pmod(hash64(payload, seed=1), F.lit(2)) == 0, F.lit(1)
        ).otherwise(F.lit(-1))
        coords.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(idx.alias("i"), sign.alias("s")),
            )
        )
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.array(*coords), lambda x: x.isNotNull())
        ).alias("_c"),
    )
    return (
        exploded.groupBy(
            "id", F.col("_c.i").alias("feature_idx")
        )
        .agg(F.sum("_c.s").cast("bigint").alias("feature_val"))
        .filter(F.col("feature_val") != 0)
    )


def dsir_weights(
    source: DataFrame,
    target: DataFrame,
    *,
    id_col: str,
    text_col: str,
    target_text_col: str | None = None,
    num_buckets: int = 1024,
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score each SOURCE document by how much more likely
    its hashed-unigram bag is under the TARGET distribution than under
    the source distribution — ``log w(x) = Σ_tok [ln p_tgt(b(tok)) −
    ln p_src(b(tok))]`` with tokens folded into ``num_buckets`` hashed
    feature buckets and add-``alpha`` smoothing on both models.
    Sampling source docs with probability ∝ exp(log w) (e.g. Gumbel
    top-k on ``logweight``, or a threshold) reshapes a raw crawl
    toward a curated target corpus without training anything.

    Scale shape: both distributions live in ``num_buckets``-row count
    tables — the only state is 2×D rows regardless of corpus size, so
    the log-ratio table is always broadcastable. Tokenize + bucket is
    row-local codegen (split + md5 hash + pmod); each corpus pays one
    hash aggregate over (bucket), and scoring is one explode → join
    against the broadcast D-row ratio table → per-doc sum. No token
    vocabulary, no skew risk beyond hot buckets (bounded by D), and
    the target corpus is typically a small curated sample anyway.

    Output per source document (zero-token docs emit no row): id,
    n_tokens, logweight (= Σ log-ratio, round_to), avg_logratio
    (= logweight/n_tokens, the length-normalized variant, round_to).
    """
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from knot_another_pipeline_spark.operators.text_analysis import _tokens

    d = F.lit(num_buckets)
    a = F.lit(float(alpha))

    def _buckets(df: DataFrame, col: str, with_id: bool) -> DataFrame:
        # tokenize + hash is the heavy row-local step: parallelize a
        # one-row-group scan (guide §2.5; no-op on parallel inputs)
        from knot_another_pipeline_spark.functions.partitioning import (
            fan_out_small_scan,
        )

        cols = [F.col(id_col).alias("id")] if with_id else []
        return fan_out_small_scan(df).select(
            *cols, F.explode(_tokens(F.col(col))).alias("tok")
        ).select(*(["id"] if with_id else []),
                 F.pmod(hash64(F.col("tok")), d).alias("bucket"))

    src_tok = _buckets(source, text_col, with_id=True)
    tgt_tok = _buckets(target, target_text_col or text_col, with_id=False)
    src_cnt = src_tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt_src")
    )
    tgt_cnt = tgt_tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt_tgt")
    )
    # Full outer over the two <=D-row tables so buckets seen by only one
    # model still get their smoothed estimate on the other side.
    counts = src_cnt.join(tgt_cnt, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("cnt_src", F.lit(0)).cast("double").alias("cnt_src"),
        F.coalesce("cnt_tgt", F.lit(0)).cast("double").alias("cnt_tgt"),
    )
    totals = counts.agg(
        F.sum("cnt_src").alias("n_src"), F.sum("cnt_tgt").alias("n_tgt")
    )
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("cnt_tgt") + a) / (F.col("n_tgt") + a * d))
            - F.log((F.col("cnt_src") + a) / (F.col("n_src") + a * d))
        ).alias("logratio"),
    )
    return (
        src_tok.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("logratio"), round_to).alias("logweight"),
            F.round(
                F.sum("logratio") / F.count(F.lit(1)), round_to
            ).alias("avg_logratio"),
        )
    )


def feature_gain(
    df: DataFrame,
    *,
    label_col: str,
    feature_cols: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Information-gain feature ranking: for each categorical feature,
    how many bits of label entropy it removes —
    ``gain = H(label) − H(label | feature)`` — the decision-tree split
    criterion used standalone to rank candidate features, leakage
    screens ("a 'feature' with gain ≈ H(label) is the label"), and
    segmentation keys.

    All features are evaluated in ONE pass: a row-local ``stack``
    unpivots (feature, value) pairs — values cast to string so
    heterogeneous features share the column — then a single hash
    aggregate builds the (feature, value, label) cell table, at most
    Σ|domain|·|labels| rows.  Entropies come from the identity
    ``H = (1/N)·Σ n·(log2 N_v − log2 n)`` over cells, with the
    windows running over the aggregated cell table, never the input.
    Per-feature parent entropy is computed over that feature's
    non-null rows, so features with different null masks are each
    scored on their own support.

    Output: feature, n, parent_entropy, cond_entropy, gain.
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in feature_cols
    )
    long = (
        df.filter(F.col(label_col).isNotNull())
        .selectExpr(
            f"CAST(`{label_col}` AS STRING) AS _l",
            f"stack({len(feature_cols)}, {pairs}) AS (_f, _v)",
        )
        .filter(F.col("_v").isNotNull())
    )
    cells = long.groupBy("_f", "_v", "_l").agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    w_f = Window.partitionBy("_f")
    w_fv = Window.partitionBy("_f", "_v")
    w_fl = Window.partitionBy("_f", "_l")
    # NB: column resolution is case-insensitive — "_N*" aliases would
    # collide with "_n", so the window totals are "_nf"/"_nv"/"_nl".
    scored = cells.select(
        "_f",
        "_n",
        F.sum("_n").over(w_f).alias("_nf"),
        F.sum("_n").over(w_fv).alias("_nv"),
        F.sum("_n").over(w_fl).alias("_nl"),
        # each (f, l) marginal term must be counted once, not once per
        # value cell — weight it by this cell's share of the marginal
        (F.col("_n") / F.sum("_n").over(w_fl)).alias("_lshare"),
    )
    cond_term = F.col("_n") * (F.log2("_nv") - F.log2("_n"))
    parent_term = (
        F.col("_lshare") * F.col("_nl") * (F.log2("_nf") - F.log2("_nl"))
    )
    agg = scored.groupBy("_f").agg(
        F.max("_nf").cast("bigint").alias("n"),
        (F.sum(parent_term) / F.max("_nf")).alias("_h"),
        (F.sum(cond_term) / F.max("_nf")).alias("_hc"),
    )
    return agg.select(
        F.col("_f").alias("feature"),
        "n",
        F.round("_h", round_to).alias("parent_entropy"),
        F.round("_hc", round_to).alias("cond_entropy"),
        F.round(F.col("_h") - F.col("_hc"), round_to).alias("gain"),
    )


def woe_iv(
    df: DataFrame,
    *,
    feature_cols: list[str],
    label_col: str,
    smoothing: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Weight of Evidence and Information Value per categorical feature
    level — the credit-scoring-standard univariate screen: WoE is the
    log-odds shift a level carries
    (``ln((pos_share)/(neg_share))``), and IV is the
    population-weighted divergence ``Σ (pos_share − neg_share)·WoE`` —
    a single number ranking features by predictive power BEFORE any
    model is trained (rule of thumb: IV < 0.02 useless, > 0.5 suspect).
    The categorical sibling of ``feature_gain``; ``target_encode``
    consumes what this ranks.

    Scale shape: every feature is unpivoted row-locally (explode of a
    ``len(feature_cols)``-wide struct array — no per-feature job), so
    the counting is ONE hash aggregate on ``(feature, level)`` with
    map-side partials.  Per-feature totals ride a window over the same
    partitioning key (no second exchange).  Shares are
    add-``smoothing`` estimated so a pure level (all-pos or all-neg —
    finite sample, not a law) keeps finite WoE.  Rows with NULL labels
    are dropped; NULL feature values form their own ``(null)`` level —
    missingness is usually informative.

    Output: feature, level, n_pos, n_neg, woe, iv_term, iv (feature
    total, repeated per level).
    """
    if not feature_cols:
        raise ValueError("feature_cols must not be empty")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    lab = F.col(label_col).cast("boolean")
    stacked = df.filter(lab.isNotNull()).select(
        lab.alias("_y"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.coalesce(
                            F.col(c).cast("string"), F.lit("(null)")
                        ).alias("level"),
                    )
                    for c in feature_cols
                ]
            )
        ).alias("fl"),
    )
    counts = stacked.groupBy("fl.feature", "fl.level").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~F.col("_y"), 1).otherwise(0)).alias("n_neg"),
    )
    w = Window.partitionBy("feature")
    s = F.lit(float(smoothing))
    n_levels = F.count(F.lit(1)).over(w)
    pos_share = (F.col("n_pos") + s) / (
        F.sum("n_pos").over(w) + s * n_levels
    )
    neg_share = (F.col("n_neg") + s) / (
        F.sum("n_neg").over(w) + s * n_levels
    )
    woe = F.log(pos_share / neg_share)
    iv_term = (pos_share - neg_share) * woe
    return (
        counts.withColumn("_woe", woe)
        .withColumn("_ivt", iv_term)
        .select(
            "feature",
            "level",
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.col("n_neg").cast("bigint").alias("n_neg"),
            F.round("_woe", round_to).alias("woe"),
            F.round("_ivt", round_to).alias("iv_term"),
            F.round(F.sum("_ivt").over(w), round_to).alias("iv"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    *,
    id_col: str,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Quantile normalization across groups — replace each value with
    the POOLED distribution's order statistic at the value's
    within-group quantile, so every group ends up with an identical
    marginal distribution (the batch-effect corrector from genomics,
    equally at home aligning per-source quality scores or per-device
    sensor scales before they're compared or thresholded together).

    Deterministic semantics (mirrored by the oracle):

    - within-group position ``p = (rank−1)/(n_g−1)`` under the total
      order (value asc, id asc); a 1-row group maps to p = 0.5;
    - target = pooled order statistic at index ``⌊p·(N−1)⌋ + 1``
      (lower interpolation — no averaging, so the mapped values are
      actual observed values).

    Scale shape: the pooled order statistics come from ``global_rank``
    (range-partitioned prefix sums — never a single-task global sort);
    within-group ranks are one window on the group key; the lookup is
    a partitioned equi-join on the computed index.  Three shuffles
    total, each keyed and data-sized — no per-quantile jobs.

    Output: id, group, value, normalized (rounded).
    """
    from knot_another_pipeline_spark.operators.relational import global_rank

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("group"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull())
    wg = Window.partitionBy("group").orderBy(
        F.col("value").asc(), F.col("id").asc()
    )
    wall = Window.partitionBy("group")
    ranked = base.withColumn("_rk", F.row_number().over(wg)).withColumn(
        "_ng", F.count(F.lit(1)).over(wall)
    )
    pooled = global_rank(
        base.select(F.col("value").alias("_pv"), F.col("id").alias("_pid")),
        [F.col("_pv").asc(), F.col("_pid").asc()],
        rank_col="_idx",
    ).select("_idx", "_pv")
    n_total = base.agg(F.count(F.lit(1)).alias("_n"))
    p = F.when(
        F.col("_ng") > 1,
        (F.col("_rk") - 1).cast("double") / (F.col("_ng") - 1),
    ).otherwise(F.lit(0.5))
    with_idx = ranked.crossJoin(F.broadcast(n_total)).withColumn(
        "_idx", F.floor(p * (F.col("_n") - 1)).cast("bigint") + 1
    )
    return (
        with_idx.join(pooled, "_idx")
        .select(
            "id",
            "group",
            "value",
            F.round(F.col("_pv"), round_to).alias("normalized"),
        )
    )


def binned_mutual_info(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    x_bins: int,
    y_bins: int,
    x_lo: float,
    x_hi: float,
    y_lo: float,
    y_hi: float,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information between two numeric columns over a fixed
    equi-width grid — the NONLINEAR dependence screen: Pearson
    (``correlation_matrix``) sees only linear structure, but a
    U-shaped or thresholded relationship has near-zero r and plainly
    nonzero MI.  Fixed explicit bounds (not data-driven quantiles)
    keep the estimate deterministic, comparable across snapshots, and
    oracle-replayable — the same contract as ``psi_stability``'s
    grid.

        MI  = Σ_xy p(x,y) · ln( p(x,y) / (p(x)·p(y)) )   (nats)
        NMI = MI / min(H(x), H(y))                       (0..1)

    One hash aggregate on the (x_bin, y_bin) cell key — at most
    ``x_bins·y_bins`` rows of state — then marginals re-aggregate
    FROM the cells (never a second data pass) and the MI sum is a
    row-local fold over the joined cell table.  Out-of-range and NULL
    rows are dropped and counted.  No smoothing: empty cells
    contribute 0 exactly (0·ln0 = 0), so MI of independent columns
    converges to 0 from above.

    Output (one row): n_rows, n_dropped, mi, h_x, h_y, nmi (rounded).
    """
    if x_bins < 2 or y_bins < 2:
        raise ValueError("x_bins and y_bins must be >= 2")
    if not (x_hi > x_lo and y_hi > y_lo):
        raise ValueError("hi must be > lo for both axes")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    ok = (
        x.isNotNull() & y.isNotNull()
        & (x >= x_lo) & (x < x_hi) & (y >= y_lo) & (y < y_hi)
    )
    xb = F.floor((x - x_lo) / ((x_hi - x_lo) / x_bins))
    yb = F.floor((y - y_lo) / ((y_hi - y_lo) / y_bins))
    marked = df.select(ok.alias("_ok"), xb.alias("_xb"), yb.alias("_yb"))
    dropped = marked.agg(
        F.sum(F.when(F.col("_ok"), 1).otherwise(0)).alias("n_rows"),
        F.sum(F.when(~F.col("_ok"), 1).otherwise(0)).alias("n_dropped"),
    )
    cells = (
        marked.filter(F.col("_ok"))
        .groupBy("_xb", "_yb")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    mx = cells.groupBy("_xb").agg(F.sum("_c").alias("_cx"))
    my = cells.groupBy("_yb").agg(F.sum("_c").alias("_cy"))
    n = cells.agg(F.sum("_c").alias("_n"))
    joined = (
        cells.join(mx, "_xb")
        .join(my, "_yb")
        .crossJoin(F.broadcast(n))
    )
    p = F.col("_c").cast("double") / F.col("_n")
    px = F.col("_cx").cast("double") / F.col("_n")
    py = F.col("_cy").cast("double") / F.col("_n")
    terms = joined.agg(F.sum(p * F.log(p / (px * py))).alias("_mi"))
    hx = mx.crossJoin(F.broadcast(n)).agg(
        F.sum(
            -(F.col("_cx").cast("double") / F.col("_n"))
            * F.log(F.col("_cx").cast("double") / F.col("_n"))
        ).alias("_hx")
    )
    hy = my.crossJoin(F.broadcast(n)).agg(
        F.sum(
            -(F.col("_cy").cast("double") / F.col("_n"))
            * F.log(F.col("_cy").cast("double") / F.col("_n"))
        ).alias("_hy")
    )
    out = (
        dropped.crossJoin(F.broadcast(terms))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
    )
    hmin = F.least(F.col("_hx"), F.col("_hy"))
    return out.select(
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_dropped").cast("bigint").alias("n_dropped"),
        F.round("_mi", round_to).alias("mi"),
        F.round("_hx", round_to).alias("h_x"),
        F.round("_hy", round_to).alias("h_y"),
        F.round(
            F.when(hmin > 0, F.col("_mi") / hmin), round_to
        ).alias("nmi"),
    )


def class_weights(
    df: DataFrame,
    *,
    label_col: str,
    beta: float = 0.99,
    round_to: int = 6,
) -> DataFrame:
    """Training loss weights per class from label frequencies — both the
    classic inverse-frequency weight N/(C·n_c) and the class-balanced
    "effective number of samples" weight of Cui et al. 2019
    ((1−β)/(1−β^n_c), renormalized to mean 1 across classes) — the
    table a trainer broadcasts into its loss when the label histogram
    is skewed.

    ONE hash aggregate on the label key reduces the frame to C rows;
    the totals ride in as a broadcast 1-row frame.  Pure codegen.

    Output per class: label, n, frac, inv_freq_weight, eff_num_weight.
    """
    if not 0 < beta < 1:
        raise ValueError(f"beta must be in (0, 1), got {beta}")
    counts = (
        df.filter(F.col(label_col).isNotNull())
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.agg(
        F.sum("n").alias("_total"),
        F.count(F.lit(1)).alias("_classes"),
    )
    eff = (1 - F.pow(F.lit(beta), F.col("n"))) / F.lit(1.0 - beta)
    raw_eff = F.lit(1.0) / eff
    with_tot = counts.crossJoin(F.broadcast(totals))
    # Normalize the effective-number weights to mean 1 across classes.
    eff_sum = with_tot.agg(
        F.sum(raw_eff).alias("_eff_sum"), F.max("_classes").alias("_c")
    )
    return (
        with_tot.crossJoin(F.broadcast(eff_sum))
        .select(
            "label",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("_total"), round_to).alias("frac"),
            F.round(
                F.col("_total")
                / (F.col("_classes") * F.col("n")),
                round_to,
            ).alias("inv_freq_weight"),
            F.round(
                raw_eff * F.col("_c") / F.col("_eff_sum"), round_to
            ).alias("eff_num_weight"),
        )
    )
