"""Behavioral analytics over event streams: funnels and cohort retention.

The reference's event analysis stops at per-type counts and daily
volumes (``apps/stat_explorer.py`` renders aggregate charts; nothing
sequences events per user). A training-data/product pipeline needs the
two classic user-journey reductions, each expressible as ONE hash
aggregate per user — no per-user sorting, no self-joins:

- ``funnel`` — first-touch funnel: a user reaches step *i* when their
  earliest step-*i* event is strictly later than their earliest
  step-*i−1* event. One groupBy(user) computing a conditional ``min``
  per step, then one tiny aggregate over users. This is the
  order-of-first-occurrence funnel (the default in most product
  analytics engines); it does not require the steps to be adjacent.
- ``cohort_retention`` — users cohorted by first-activity period; each
  (cohort, offset) cell counts distinct users active that many periods
  after their cohort period. Two aggregates sharing the user_id
  shuffle: first-touch per user, then distinct users per cell. The
  first-touch table joins back to activity on user_id — at scale AQE
  picks broadcast vs shuffle by the user-dimension size.

Both return small results (steps, resp. cohort×offset cells) from a
single pass over events — the scan dominates, as it should at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "activity_streaks",
    "audience_overlap",
    "cohort_retention",
    "conversion_attribution",
    "covisitation_llr",
    "cumulative_users",
    "dau_mau",
    "funnel",
    "funnel_timing",
    "growth_accounting",
    "journey_topk",
    "log_rank_test",
    "markov_transitions",
    "nelson_aalen",
    "next_event_examples",
    "rfm_segments",
    "survival_curve",
    "window_funnel",
]


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    max_step_seconds: int | None = None,
) -> DataFrame:
    """First-touch funnel over ``steps`` (ordered list of event types).

    Returns one row per step: ``step_index`` (1-based), ``step``, and
    ``n_users`` — the number of users whose first occurrences of
    steps 1..i are in strictly increasing time order. Monotone by
    construction: n_users(i+1) ≤ n_users(i).

    ``max_step_seconds`` adds a conversion window: step *i* counts only
    when it follows step *i−1* within that many seconds — "viewed within
    a day of signing up", the form product funnels actually report.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    firsts = events.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(event_col) == s, F.col(ts_col))).alias(f"_t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # reached_i = t0 < t1 < ... < t_i. A missing step makes the
    # comparison NULL — fold that to 0 (CASE-WHEN semantics) so a step
    # nobody reaches sums to 0, not NULL.
    as_flag = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0))  # noqa: E731
    reached = F.col("_t0").isNotNull()
    flags = [as_flag(reached).alias("_r0")]
    for i in range(1, len(steps)):
        prev, cur = F.col(f"_t{i-1}"), F.col(f"_t{i}")
        step_ok = cur > prev
        if max_step_seconds is not None:
            step_ok = step_ok & (
                F.unix_micros(cur.cast("timestamp"))
                - F.unix_micros(prev.cast("timestamp"))
                <= max_step_seconds * 1_000_000
            )
        reached = reached & step_ok
        flags.append(as_flag(reached).alias(f"_r{i}"))
    totals = firsts.select(*flags).agg(
        *[F.sum(f"_r{i}").alias(f"_n{i}") for i in range(len(steps))]
    )
    # one input row -> len(steps) output rows: row-local posexplode
    return totals.select(
        F.posexplode(F.array(*[F.col(f"_n{i}") for i in range(len(steps))])).alias(
            "_idx", "n_users"
        )
    ).select(
        (F.col("_idx") + 1).cast("int").alias("step_index"),
        F.element_at(F.array(*[F.lit(s) for s in steps]), F.col("_idx") + 1).alias(
            "step"
        ),
        F.col("n_users").cast("long").alias("n_users"),
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Monthly cohort retention matrix.

    Cohort = month of the user's first event; a user is "retained at
    offset k" when they have any event in cohort_month + k months.
    Returns (cohort_month DATE, month_offset INT, n_active BIGINT).

    Month arithmetic is integer ``year*12 + month`` — identical in every
    engine, immune to month-length edge cases that ``months_between``
    float semantics introduce.
    """
    month_idx = lambda c: (  # noqa: E731
        F.year(c) * F.lit(12) + F.month(c) - F.lit(1)
    )
    activity = events.select(
        F.col(user_col).alias("_uid"),
        F.date_trunc("month", F.col(ts_col).cast("timestamp")).alias("_month"),
    ).distinct()
    firsts = activity.groupBy("_uid").agg(F.min("_month").alias("_cohort"))
    cells = (
        activity.join(firsts, "_uid")
        .select(
            "_uid",
            "_cohort",
            (month_idx(F.col("_month")) - month_idx(F.col("_cohort"))).alias(
                "_offset"
            ),
        )
    )
    if max_offset is not None:
        cells = cells.filter(F.col("_offset") <= max_offset)
    return (
        cells.groupBy(
            F.col("_cohort").cast("date").alias("cohort_month"),
            F.col("_offset").cast("int").alias("month_offset"),
        )
        .agg(F.count_distinct("_uid").alias("n_active"))
        .orderBy("cohort_month", "month_offset")
    )


def journey_topk(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    k: int = 20,
    max_steps: int = 10,
) -> DataFrame:
    """Top-k session journeys: sessionize (same gap rule as
    ``operators.relational.sessionize``), render each session's first
    ``max_steps`` events as an ordered ``a>b>c`` path, count paths, keep
    the k most common.

    Determinism requires a TOTAL order inside a session — ``ts`` alone
    isn't one when two events share a timestamp, so the sort key is
    (ts, ``id_col``); the equivalent SQL is
    ``string_agg(event ORDER BY ts, id)``. Scale shape: one shuffle on
    the user key covers the session window AND the per-session ordered
    assembly (``collect_list`` + row-local ``array_sort``, bounded by
    ``max_steps``); the path count is a partial-aggregated groupBy and
    the top-k a TakeOrdered — no global sort.
    Output: journey, n_sessions.
    """
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.lit(gap_minutes * 60 * 1_000_000)
    sessions = (
        events.withColumn(
            "_new",
            F.when(
                F.lag(ts_col).over(w).isNull()
                | (
                    micros
                    - F.unix_micros(F.lag(F.col(ts_col).cast("timestamp")).over(w))
                    > gap
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("_sess", F.sum("_new").over(w))
    )
    paths = (
        sessions.groupBy(user_col, "_sess")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("ts"),
                        F.col(id_col).alias("id"),
                        F.col(event_col).alias("ev"),
                    )
                )
            ).alias("_steps")
        )
        .select(
            F.array_join(
                F.slice(F.transform("_steps", lambda s: s["ev"]), 1, max_steps),
                ">",
            ).alias("journey")
        )
    )
    counted = paths.groupBy("journey").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    return counted.orderBy(
        F.col("n_sessions").desc(), F.col("journey").asc()
    ).limit(k)


#: shift applied to epoch micros before zero-padding so the sortable
#: string key stays sign-free across the full int64 timestamp range
_KEY_OFFSET_US = 5_000_000_000_000_000_000


def conversion_attribution(
    events: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    touch_types: list[str],
    lookback_seconds: int = 7 * 86400,
) -> DataFrame:
    """First- AND last-touch attribution: for every conversion event,
    the earliest and latest touch event by the same user within the
    trailing ``lookback_seconds`` — the marketing/growth question
    ("which touchpoint gets credit?") and, in a data pipeline, the
    provenance question ("which crawl seeded this document?").

    One ``rangeBetween`` window over the UNION of touches and
    conversions per user (same single-shuffle shape as
    ``rolling_stats`` — never the naive conversions×touches range
    self-join, which is quadratic in per-user activity): each row sees
    the min/max of a sortable ``zero-padded-epoch|type`` key over
    touch rows in ``[ts − lookback, ts]``, and only conversion rows
    are kept. The string key trick keeps the aggregate a plain min/max
    — portable to any engine (the DuckDB oracle runs the identical
    expression), no min_by/struct-comparison dependence. A touch at
    exactly the conversion timestamp is a RANGE peer and is credited.

    Output: user, conv_ts, first_touch_ts, first_touch_type,
    last_touch_ts, last_touch_type (NULLs when no touch in window).
    """
    if lookback_seconds < 1:
        raise ValueError(
            f"lookback_seconds must be >= 1, got {lookback_seconds}"
        )
    if conversion_type in touch_types:
        raise ValueError("conversion_type must not be a touch type")
    base = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin([conversion_type, *touch_types]))
    # exact integer micros (no double roundtrip), shifted by a constant
    # so PRE-1970 timestamps stay positive — a bare lpad of a negative
    # epoch would embed '-' mid-string and break the lexicographic
    # ordering the min/max key relies on. 5e18 covers years 1678-2262
    # (int64 timestamp range) within 20 digits.
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    shifted = micros + F.lit(_KEY_OFFSET_US)
    touch_key = F.when(
        F.col("etype").isin(list(touch_types)),
        F.concat(
            F.lpad(shifted.cast("string"), 20, "0"),
            F.lit("|"),
            F.col("etype"),
        ),
    )
    w = (
        Window.partitionBy("user")
        .orderBy(micros)
        .rangeBetween(-int(lookback_seconds) * 1_000_000, Window.currentRow)
    )
    tagged = base.withColumn("_first", F.min(touch_key).over(w)).withColumn(
        "_last", F.max(touch_key).over(w)
    )
    def _ts(key: Column) -> Column:
        return F.timestamp_micros(
            F.substring(key, 1, 20).cast("long") - F.lit(_KEY_OFFSET_US)
        )

    def _type(key: Column) -> Column:
        return F.substring(key, 22, 1000)

    return (
        tagged.filter(F.col("etype") == conversion_type)
        .select(
            "user",
            F.col("ts").alias("conv_ts"),
            _ts(F.col("_first")).alias("first_touch_ts"),
            _type(F.col("_first")).alias("first_touch_type"),
            _ts(F.col("_last")).alias("last_touch_ts"),
            _type(F.col("_last")).alias("last_touch_type"),
        )
    )


def next_event_examples(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    item_col: str,
    tiebreak_col: str,
    context_len: int = 5,
    min_context: int = 1,
) -> DataFrame:
    """Sliding-window next-item training examples from an event stream:
    for each event, the user's previous ``context_len`` items (oldest
    first, pipe-joined) paired with the event's item as the label —
    the (context → next) supervision pairs sequence models
    (session-based recommenders, next-action prediction) train on,
    generated at corpus scale without leaving the engine.

    ``tiebreak_col`` (a unique event id) makes the within-user order
    total, so the emitted contexts are identical across reruns,
    partitionings, and engines — the same determinism contract as the
    sampling operators; timestamps alone tie under bursty traffic.
    The context ships as a delimited string rather than an array so
    downstream storage and the differential oracle agree on encoding
    byte-for-byte.

    One shuffle (partition by user); the window is rows-bounded so
    state per user is ``context_len`` items regardless of history
    length. Events with fewer than ``min_context`` predecessors emit
    nothing (cold-start rows carry no signal).

    Output: user, anchor (tiebreak id), label, context, ctx_len.
    """
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1, got {context_len}")
    if not 1 <= min_context <= context_len:
        raise ValueError(
            f"min_context must be in [1, {context_len}], got {min_context}"
        )
    w = (
        Window.partitionBy(F.col(user_col))
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(-context_len, -1)
    )
    ctx = F.collect_list(F.col(item_col)).over(w)
    return (
        df.select(
            F.col(user_col).alias("user"),
            F.col(tiebreak_col).alias("anchor"),
            F.col(item_col).alias("label"),
            F.concat_ws("|", ctx).alias("context"),
            F.size(ctx).cast("bigint").alias("ctx_len"),
        )
        .filter(F.col("ctx_len") >= min_context)
    )


def markov_transitions(
    df: DataFrame,
    *,
    entity_col: str,
    order_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
    min_count: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity state
    sequences: for every ordered pair of consecutive states (src → dst)
    across all entities, the transition count and the row-normalized
    probability P(dst | src).  The classic session-modeling reduction
    (next-page prediction, journey simulation, anomalous-flow
    detection) the reference's per-type event counts
    (``apps/stat_explorer.py``) cannot express.

    Two shuffles, both necessary and both small on the reduce side:
    one partition-by-entity window to sequence each entity's states
    (``lead`` — no self-join, no collect_list materialization), then
    one hash aggregate keyed by (src, dst) whose result is at most
    |states|² rows regardless of input size.  The row normalizer is a
    window over src partitions of the *aggregated* matrix — |states|²
    rows, never the raw events.  At 100 TB the event scan dominates,
    as it should; neither shuffle carries more than the event count,
    and the second is map-side combinable.

    ``tiebreak_col`` (a unique row id) makes the within-entity order
    total — without it, entities with duplicate ``order_col`` values
    yield partition-order-dependent transitions.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    order = [F.col("ord")] + ([F.col("tb")] if tiebreak_col else [])
    w = Window.partitionBy("entity").orderBy(*order)
    seq = df.select(
        F.col(entity_col).alias("entity"),
        F.col(order_col).alias("ord"),
        *([F.col(tiebreak_col).alias("tb")] if tiebreak_col else []),
        F.col(state_col).alias("src"),
    ).filter(F.col("src").isNotNull())
    trans = (
        seq.withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("src")
    return (
        trans.withColumn(
            "prob", F.round(F.col("n") / F.sum("n").over(norm), round_to)
        )
        .filter(F.col("n") >= min_count)
        .select("src", "dst", F.col("n").cast("bigint").alias("n"), "prob")
    )


def survival_curve(
    df: DataFrame,
    *,
    group_col: str,
    duration_col: str,
    event_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival estimator per group: one row per distinct
    event time, carrying the at-risk count, observed events, censored
    exits, and the product-limit survival probability
    ``S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)``.  The standard
    churn/time-to-failure readout (subscription survival, hardware
    lifetime, time-to-conversion) with right-censoring handled
    correctly — censored subjects leave the risk set without counting
    as events, which a naive ``cumulative deaths / total`` curve gets
    wrong.

    Input is one row per subject: ``duration_col`` (time observed) and
    ``event_col`` (1 = event occurred, 0 = right-censored at that
    time).  The running product is computed CLOSED-FORM as
    ``exp(cumsum(ln(1 − d/n)))`` over one ordered window per group —
    no driver loop; a zero factor (d = n, survival hits exactly 0) is
    handled by a running-min flag rather than ``ln(0)``, which Spark
    nulls and other engines −inf.  Two shuffles: one hash aggregate to
    (group, duration) — at most |distinct durations| rows per group —
    then one window over that aggregate.  The subject scan dominates
    at scale; the windowed frame is the aggregated step table, never
    the subjects.

    Rows are emitted at event times only (d > 0), the standard KM step
    points; censored-only times still shrink the risk set.
    """
    agg = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(duration_col).cast("double").alias("t"),
            F.col(event_col).cast("int").alias("ev"),
        )
        .filter(F.col("t").isNotNull() & F.col("ev").isNotNull())
        .groupBy("grp", "t")
        .agg(
            F.sum("ev").alias("d"),
            F.sum(F.lit(1) - F.col("ev")).alias("c"),
        )
    )
    w = Window.partitionBy("grp").orderBy("t")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    full = Window.partitionBy("grp")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    n_risk = F.sum(F.col("d") + F.col("c")).over(full) - F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(prior), F.lit(0)
    )
    stepped = agg.withColumn("n_risk", n_risk).withColumn(
        "factor", F.lit(1.0) - F.col("d") / F.col("n_risk")
    )
    log_term = F.when(F.col("factor") > 0, F.log("factor")).otherwise(F.lit(0.0))
    survival = F.when(
        F.min("factor").over(cum) <= 0, F.lit(0.0)
    ).otherwise(F.exp(F.sum(log_term).over(cum)))
    return (
        stepped.withColumn("survival", F.round(survival, round_to))
        .filter(F.col("d") > 0)
        .select(
            F.col("grp").alias("group"),
            F.col("t").alias("duration"),
            F.col("n_risk").cast("bigint").alias("at_risk"),
            F.col("d").cast("bigint").alias("events"),
            F.col("c").cast("bigint").alias("censored"),
            "survival",
        )
    )


def rfm_segments(
    df: DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    ref_date: str,
    n_tiles: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation: each
    entity scored 1..``n_tiles`` on how recently it was active, how
    often, and how much value it generated — the classic churn-risk /
    VIP / win-back segmentation grid ("555" = best, "111" = gone).

    The per-metric scores come from QUANTILE THRESHOLDS, not NTILE:
    exact ``percentile(metric, i/n)`` over the entity table yields a
    1-row threshold frame (broadcast), and each score is
    ``1 + Σᵢ [metric beats thresholdᵢ]`` — a map-side comparison.
    This is deliberate: a global NTILE window serializes every entity
    through one sort task (the anti-pattern ``ntile_assign``'s
    docstring warns about), while thresholds keep the plan at two
    aggregates + one broadcast regardless of entity count.  Entities
    tied on a threshold all land on the same side — scores are
    deterministic with no tiebreak column needed (bucket sizes wobble
    at ties; boundaries don't).

    Recency is "days since last activity" relative to ``ref_date`` and
    scores INVERTED (smaller = more recent = higher score); frequency
    and monetary score upward.  Output: entity, recency_days,
    frequency, monetary, r_score, f_score, m_score, segment
    (concatenated digits).
    """
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    base = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(entity_col).alias("entity"))
        .agg(
            F.datediff(
                F.lit(ref_date).cast("date"),
                F.max(F.col(ts_col).cast("timestamp")).cast("date"),
            )
            .cast("double")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("double").alias("frequency"),
            F.round(F.sum(F.col(value_col).cast("double")), round_to).alias(
                "monetary"
            ),
        )
    )
    qs = [i / n_tiles for i in range(1, n_tiles)]
    qarr = "array({})".format(", ".join(str(q) for q in qs))
    thresholds = base.agg(
        F.expr(f"percentile(recency_days, {qarr})").alias("_rq"),
        F.expr(f"percentile(frequency, {qarr})").alias("_fq"),
        F.expr(f"percentile(monetary, {qarr})").alias("_mq"),
    )
    scored = base.crossJoin(F.broadcast(thresholds))

    # n_tiles is a plan-time constant: unroll the threshold comparisons
    # into a codegen sum instead of an interpreted higher-order fold.
    def score_up(col: str, th: str):
        terms = [
            F.when(
                F.col(col) > F.element_at(F.col(th), i), F.lit(1)
            ).otherwise(F.lit(0))
            for i in range(1, n_tiles)
        ]
        return (F.lit(1) + sum(terms[1:], terms[0])).cast("int")

    def score_down(col: str, th: str):
        terms = [
            F.when(
                F.col(col) < F.element_at(F.col(th), i), F.lit(1)
            ).otherwise(F.lit(0))
            for i in range(1, n_tiles)
        ]
        return (F.lit(1) + sum(terms[1:], terms[0])).cast("int")

    # A NULL metric (all-NULL value_col, or a timestamp that fails the
    # cast) must score NULL, not fall through the otherwise(0) terms to
    # score 1 — "unknown" and "worst" are different facts. The segment
    # goes NULL with any NULL score (concat_ws would silently skip it
    # and emit a 2-digit segment).
    def guarded(metric: str, score):
        return F.when(F.col(metric).isNotNull(), score)

    return scored.select(
        "entity",
        "recency_days",
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary",
        guarded("recency_days", score_down("recency_days", "_rq")).alias(
            "r_score"
        ),
        guarded("frequency", score_up("frequency", "_fq")).alias("f_score"),
        guarded("monetary", score_up("monetary", "_mq")).alias("m_score"),
    ).withColumn(
        "segment",
        F.when(
            F.col("r_score").isNotNull()
            & F.col("f_score").isNotNull()
            & F.col("m_score").isNotNull(),
            F.concat_ws(
                "",
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        ),
    )


def funnel_timing(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    round_to: int = 4,
) -> DataFrame:
    """Conversion-delay profile for each funnel transition: for users
    whose first occurrences of the funnel steps are in order (the same
    first-touch rule as :func:`funnel`), the seconds between
    consecutive steps — count, mean, median, p90 per transition.  The
    "WHERE does the funnel stall, and for how long" half of the
    question :func:`funnel` answers the "how many" half of.

    Same scale shape as ``funnel``: ONE groupBy(user) computes every
    step's first-occurrence time as conditional mins; the delays are
    row-local arithmetic over that |users|-row frame; a row-local
    ``stack`` unpivots (transition, delay) pairs and one tiny
    aggregate summarizes.  Exact ``percentile`` (not approx) keeps the
    numbers engine-reproducible; it aggregates the per-user delay list
    per transition, at most |users| values each.

    Output per transition i→i+1: step_index (of the destination,
    1-based), step_from, step_to, n_users, avg_seconds, p50_seconds,
    p90_seconds.
    """
    if len(steps) < 2:
        raise ValueError("steps must have at least 2 entries")
    firsts = events.groupBy(user_col).agg(
        *[
            F.min(
                F.when(
                    F.col(event_col) == s, F.col(ts_col).cast("timestamp")
                )
            ).alias(f"_t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # reached_i = first occurrences of steps 0..i strictly increasing
    reached = F.col("_t0").isNotNull()
    delays = []
    for i in range(1, len(steps)):
        reached = reached & (F.col(f"_t{i}") > F.col(f"_t{i-1}"))
        delays.append(
            F.when(
                reached,
                (
                    F.unix_micros(F.col(f"_t{i}"))
                    - F.unix_micros(F.col(f"_t{i-1}"))
                )
                / 1_000_000.0,
            ).alias(f"_d{i}")
        )
    long = firsts.select(*delays).selectExpr(
        "stack({}, {}) AS (_idx, _delay)".format(
            len(steps) - 1,
            ", ".join(f"{i}, _d{i}" for i in range(1, len(steps))),
        )
    ).filter(F.col("_delay").isNotNull())
    agg = long.groupBy("_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("_delay"), round_to).alias("avg_seconds"),
        F.round(F.expr("percentile(_delay, 0.5)"), round_to).alias(
            "p50_seconds"
        ),
        F.round(F.expr("percentile(_delay, 0.9)"), round_to).alias(
            "p90_seconds"
        ),
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    return agg.select(
        F.col("_idx").cast("int").alias("step_index"),
        F.element_at(step_arr, F.col("_idx")).alias("step_from"),
        F.element_at(step_arr, F.col("_idx") + 1).alias("step_to"),
        "n_users",
        "avg_seconds",
        "p50_seconds",
        "p90_seconds",
    )


def covisitation_llr(
    baskets: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Item-item co-visitation scored by the log-likelihood ratio
    (Dunning's G² — the "surprise and coincidence" statistic behind
    the classic Mahout/LLR co-occurrence recommender): raw
    co-occurrence counts overweight popular items, so each pair's
    2×2 contingency table (both / only-a / only-b / neither, over
    baskets) is scored

        G² = 2 · Σ_ij k_ij · ln( k_ij·N / (R_i·C_j) )    (0·ln0 = 0)

    — high G² means a,b co-occur far more than their popularities
    predict.  "Basket" is any co-occurrence scope: an order, a user
    session, a document window.

    Scale shape: each basket's distinct items are collected into ONE
    posting list (group size bounded by basket size — order lines, not
    catalog size) and the C(d, 2) co-occurrence pairs are enumerated
    row-locally from it (guide §2.3/§2.4: one basket-key shuffle
    replaces the two the self-join paid, and the per-item margins and
    the basket total re-aggregate from the same postings frame —
    ``collect_set`` IS the dedup, so the separate distinct shuffle
    disappears too).  ``min_count`` prunes pairs BEFORE the margin
    joins.  Margins (per-item basket counts) join on each side —
    item-cardinality tables, broadcast by AQE while small — and N is
    a broadcast 1-row aggregate; the G² arithmetic is row-local.

    Output: item_a ≺ item_b, n_both, n_a, n_b, n_baskets, llr
    (rounded), llr ≥ 0 guaranteed up to fp rounding.
    """
    from knot_another_pipeline_spark.functions.postings import (
        sorted_pairs_from_postings,
    )

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    posts = (
        baskets.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("item")
        )
        .filter(F.col("b").isNotNull() & F.col("item").isNotNull())
        .groupBy("b")
        .agg(F.collect_set("item").alias("_items"))
    )
    pairs = (
        sorted_pairs_from_postings(
            posts, items_col="_items", a_col="item_a", b_col="item_b"
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_count)
    )
    marg = posts.select(F.explode("_items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).alias("n_item"))
    total = posts.agg(F.count(F.lit(1)).alias("n_baskets"))
    joined = (
        pairs.join(
            marg.select(
                F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
            ),
            "item_a",
        )
        .join(
            marg.select(
                F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
    )
    n = F.col("n_baskets").cast("double")
    k11 = F.col("n_both").cast("double")
    k12 = (F.col("n_a") - F.col("n_both")).cast("double")
    k21 = (F.col("n_b") - F.col("n_both")).cast("double")
    k22 = (
        F.col("n_baskets") - F.col("n_a") - F.col("n_b") + F.col("n_both")
    ).cast("double")

    def term(kij, row, colm):
        return F.when(
            kij > 0, kij * F.log(kij * n / (row * colm))
        ).otherwise(F.lit(0.0))

    ra = F.col("n_a").cast("double")
    rb = (n - ra)
    ca = F.col("n_b").cast("double")
    cb = (n - ca)
    llr = 2.0 * (
        term(k11, ra, ca)
        + term(k12, ra, cb)
        + term(k21, rb, ca)
        + term(k22, rb, cb)
    )
    return joined.select(
        "item_a",
        "item_b",
        F.col("n_both").cast("bigint").alias("n_both"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("n_baskets").cast("bigint").alias("n_baskets"),
        F.round(llr, round_to).alias("llr"),
    )


def audience_overlap(
    df: DataFrame,
    *,
    entity_col: str,
    segment_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise audience overlap matrix — for every pair of segments
    (event types, campaigns, feature flags, cohorts), how many
    entities belong to BOTH, with the containment in each direction
    and the Jaccard — the "are these two audiences the same people"
    readout behind campaign dedup, segment consolidation, and
    cannibalization checks.

    Scale shape: each entity's distinct segments are collected into
    ONE posting list (group size bounded by SEGMENTS-PER-ENTITY — a
    handful, not segment cardinality or corpus size) and the pair
    counts are enumerated row-locally from it — one entity-key shuffle
    instead of the two a self-join pays, and ``collect_set`` IS the
    dedup so the separate distinct shuffle disappears (guide
    §2.3/§2.4; same shape as ``covisitation_llr``).  Per-segment sizes
    re-aggregate from the same postings frame and join back on the
    segment key (segment-cardinality tables, broadcast by AQE).

    Output: segment_a ≺ segment_b, n_both, n_a, n_b,
    containment_a_in_b (= share of A also in B), containment_b_in_a,
    jaccard (rounded).
    """
    from knot_another_pipeline_spark.functions.postings import (
        sorted_pairs_from_postings,
    )

    posts = (
        df.select(
            F.col(entity_col).alias("e"), F.col(segment_col).alias("s")
        )
        .filter(F.col("e").isNotNull() & F.col("s").isNotNull())
        .groupBy("e")
        .agg(F.collect_set("s").alias("_segs"))
    )
    pairs = (
        sorted_pairs_from_postings(
            posts, items_col="_segs", a_col="segment_a", b_col="segment_b"
        )
        .groupBy("segment_a", "segment_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sizes = posts.select(F.explode("_segs").alias("s")).groupBy("s").agg(
        F.count(F.lit(1)).alias("n_seg")
    )
    out = pairs.join(
        sizes.select(F.col("s").alias("segment_a"), F.col("n_seg").alias("n_a")),
        "segment_a",
    ).join(
        sizes.select(F.col("s").alias("segment_b"), F.col("n_seg").alias("n_b")),
        "segment_b",
    )
    both = F.col("n_both").cast("double")
    return out.select(
        "segment_a",
        "segment_b",
        F.col("n_both").cast("bigint").alias("n_both"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(both / F.col("n_a"), round_to).alias("containment_a_in_b"),
        F.round(both / F.col("n_b"), round_to).alias("containment_b_in_a"),
        F.round(
            both / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
            round_to,
        ).alias("jaccard"),
    )


def cumulative_users(
    df: DataFrame,
    *,
    ts_col: str,
    user_col: str,
) -> DataFrame:
    """Daily audience-accumulation curve: per calendar day, how many
    users appeared for the FIRST time and how many distinct users have
    ever been seen up to (and including) that day.

    The naive phrasing — ``COUNT(DISTINCT user) OVER (ORDER BY day)``
    — is both unsupported (distinct window aggregates) and, replayed
    as a per-day semi-join, quadratic in days.  The scalable identity:
    a user contributes to the cumulative count from their first-seen
    day forward, so

    1. ONE user-key aggregate ``user → min(day)`` (map-side partials —
       the only shuffle that sees event rows);
    2. ONE day-key aggregate to new-user counts;
    3. a running sum over the day table — bounded by the number of
       DISTINCT DAYS, not rows, so the single-partition window is over
       a few thousand rows at any corpus size (a century of days <
       40k rows; the 100 TB of events never pass through it).

    Rows with a NULL timestamp or user are excluded (the oracle applies
    the identical predicate).

    Output per day: day, n_new, cum_users, ordered by day.
    """
    first_seen = (
        df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).cast("date").alias("_d"),
        )
        .groupBy("_u")
        .agg(F.min("_d").alias("day"))
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        F.col("n_new").cast("bigint").alias("n_new"),
        F.sum("n_new").over(w).cast("bigint").alias("cum_users"),
    ).orderBy("day")


def window_funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int = 86_400,
) -> DataFrame:
    """Time-constrained ordered funnel (the ClickHouse ``windowFunnel``
    semantics, absent from ``funnel``'s unconditioned first-touch
    reduction): a user's level is the longest chain step₁ → step₂ → …
    with non-decreasing timestamps t₁ ≤ t₂ ≤ … ≤ tₖ that fits inside
    ``window_seconds`` of the chain's FIRST event (tₖ ≤ t₁ +
    window). Out-of-order or stale completions don't count — the
    "activated within a day of signing up" readout.

    Distributed shape: ONE hash aggregate per user collects the user's
    step events as a sorted array (row-local sort — never a per-user
    window shuffle), then a row-local linear DP over the array via
    ``F.aggregate``: the accumulator keeps, per level l, the MAXIMUM
    start time of any valid chain of length l (a later start dominates
    — it leaves the most window room for deeper levels), so one pass
    computes the exact maximum level. Per-user state is
    ``len(steps)`` longs; the scan dominates, as it should at 100 TB.
    Timestamps compare at whole-second resolution (``unix_timestamp``).

    Output: one row per user holding at least one step event —
    user column, funnel_level (0 when the user never fired step₁).
    """
    if len(steps) < 2:
        raise ValueError(f"need at least 2 steps, got {steps!r}")
    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = events.filter(F.col(type_col).isin(*steps)).select(
        F.col(user_col).alias("user"),
        F.struct(
            F.unix_timestamp(F.col(ts_col)).cast("bigint").alias("t"),
            F.array_position(step_arr, F.col(type_col))
            .cast("int")
            .alias("l"),
        ).alias("e"),
    )
    per_user = ev.groupBy("user").agg(
        F.array_sort(F.collect_list("e")).alias("evs")
    )

    def _merge(acc, x):
        # element_at is 1-based and rejects index 0, so the lookback
        # index is clamped; the `l > 1` conjunct makes the clamped
        # branch unreachable when l == 1.
        prev = F.element_at(acc, F.greatest(x["l"] - 1, F.lit(1)))
        return F.transform(
            acc,
            lambda s, i: F.when(
                (i == 0) & (x["l"] == 1), F.greatest(s, x["t"])
            )
            .when(
                (i + 1 == x["l"])
                & (x["l"] > 1)
                & prev.isNotNull()
                & (x["t"] <= prev + F.lit(int(window_seconds))),
                F.greatest(s, prev),
            )
            .otherwise(s),
        )

    starts = F.aggregate(
        F.col("evs"),
        F.array_repeat(F.lit(None).cast("bigint"), k),
        _merge,
    )
    # levels fill as a prefix (S[l] only ever copies from S[l-1]), so
    # the reached level is the count of non-null slots
    return per_user.select(
        F.col("user").alias(user_col),
        F.size(F.filter(starts, lambda s: s.isNotNull()))
        .cast("int")
        .alias("funnel_level"),
    )


def nelson_aalen(
    df: DataFrame,
    *,
    group_col: str,
    duration_col: str,
    event_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator per group — the
    additive sibling of :func:`survival_curve`'s product-limit KM:
    ``H(t) = Σ_{t_i ≤ t} d_i / n_i`` with variance
    ``Var(t) = Σ d_i / n_i²``.  Hazard is the natural scale for
    COMPARING risk over time (a straight H(t) means constant hazard, a
    bend means the rate changed) and is better behaved than KM in
    small risk sets; ``exp(−H)`` is the Fleming–Harrington survival
    estimate.

    Same input contract and scale shape as :func:`survival_curve`
    (one row per subject, 1 = event / 0 = censored): one hash
    aggregate to (group, duration) step rows, then cumulative-sum
    windows over the aggregated step table — the subject scan is the
    only pass over row volume.

    Output per (group, event time): group, duration, at_risk, events,
    censored, cum_hazard, hazard_se (√Var), fh_survival (exp(−H)).
    Rows are emitted at event times only (d > 0); censored-only times
    still shrink the risk set.
    """
    agg = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(duration_col).cast("double").alias("t"),
            F.col(event_col).cast("int").alias("ev"),
        )
        .filter(F.col("t").isNotNull() & F.col("ev").isNotNull())
        .groupBy("grp", "t")
        .agg(
            F.sum("ev").alias("d"),
            F.sum(F.lit(1) - F.col("ev")).alias("c"),
        )
    )
    w = Window.partitionBy("grp").orderBy("t")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    full = Window.partitionBy("grp")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    n_risk = F.sum(F.col("d") + F.col("c")).over(full) - F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(prior), F.lit(0)
    )
    stepped = agg.withColumn("n_risk", n_risk)
    dn = F.col("d").cast("double") / F.col("n_risk")
    haz = F.sum(dn).over(cum)
    var = F.sum(dn / F.col("n_risk")).over(cum)
    return (
        stepped.withColumn("cum_hazard", haz)
        .withColumn("hazard_se", F.sqrt(var))
        .filter(F.col("d") > 0)
        .select(
            F.col("grp").alias("group"),
            F.col("t").alias("duration"),
            F.col("n_risk").cast("bigint").alias("at_risk"),
            F.col("d").cast("bigint").alias("events"),
            F.col("c").cast("bigint").alias("censored"),
            F.round("cum_hazard", round_to).alias("cum_hazard"),
            F.round("hazard_se", round_to).alias("hazard_se"),
            F.round(F.exp(-F.col("cum_hazard")), round_to).alias(
                "fh_survival"
            ),
        )
    )


def log_rank_test(
    df: DataFrame,
    *,
    group_col: str,
    duration_col: str,
    event_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-group log-rank test — "are these two survival curves the
    same curve?", the standard significance companion to
    :func:`survival_curve`: at every distinct event time t, group g's
    observed deaths d_gt are compared to the hypergeometric
    expectation e_gt = d_t·n_gt/n_t, with variance

        v_t = d_t·(n_1t/n_t)·(1 − n_1t/n_t)·(n_t − d_t)/(n_t − 1),

    and χ² = (Σ(d_1t − e_1t))² / Σv_t on 1 df (p via the shared
    Wilson–Hilferty approximation).  Exactly two groups must be
    present — more raises, fewer yields NULL stats.

    Scale shape: one hash aggregate to (group, duration) step rows
    (the only pass over subjects), a pivot to per-time two-group rows
    via a (duration) aggregate, cumulative risk sets from suffix
    windows over the step table, then ONE 1-row reduction.  The
    windowed frames only ever see the aggregated step table.

    Output: one row per group — group, n_subjects, observed, expected,
    plus the shared chi2, df, p_value (identical on both rows, the
    2-row readout convention of ``mcnemar_readout``-family tests).
    """
    from knot_another_pipeline_spark.operators.quality import (
        normal_sf_two_sided,
    )

    s = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(duration_col).cast("double").alias("t"),
        F.col(event_col).cast("int").alias("ev"),
    ).filter(
        F.col("grp").isNotNull()
        & F.col("t").isNotNull()
        & F.col("ev").isNotNull()
    )
    n_groups = s.select("grp").distinct().count()
    if n_groups > 2:
        raise ValueError(
            f"log_rank_test is two-group only, got {n_groups} groups"
        )
    steps = s.groupBy("grp", "t").agg(
        F.sum("ev").cast("double").alias("_d"),
        F.count(F.lit(1)).cast("double").alias("_x"),
    )
    # Densify to the full (time × group) grid BEFORE the risk-set
    # window: a group with no subject ending exactly at t has no step
    # row there, and without the grid its at-risk count would read 0
    # at another group's event time.  The grid is 2×|distinct t| rows.
    allt = steps.select("t").distinct()
    grps = steps.select("grp").distinct()
    grid = allt.crossJoin(F.broadcast(grps))  # <=2 rows broadcast side
    dense = grid.join(steps, ["grp", "t"], "left").select(
        "grp",
        "t",
        F.coalesce("_d", F.lit(0.0)).alias("_d"),
        F.coalesce("_x", F.lit(0.0)).alias("_x"),
    )
    # per-group risk set at t: subjects with duration >= t
    wg = Window.partitionBy("grp").orderBy("t")
    suffix = wg.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    at_risk = dense.withColumn("_n", F.sum("_x").over(suffix))
    # two-group pivot per time (grp order: lexicographic MIN is group 1)
    g1_row = grps.agg(F.min("grp").alias("_g1"))
    pivoted = (
        at_risk.crossJoin(F.broadcast(g1_row))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("grp") == F.col("_g1"), F.col("_d"))
                  .otherwise(0.0)).alias("_d1"),
            F.sum(F.when(F.col("grp") == F.col("_g1"), F.col("_n"))
                  .otherwise(0.0)).alias("_n1"),
            F.sum("_d").alias("_dt"),
            F.sum("_n").alias("_nt"),
        )
        .filter(F.col("_dt") > 0)
    )
    d1, n1 = F.col("_d1"), F.col("_n1")
    dt, nt = F.col("_dt"), F.col("_nt")
    e1 = dt * n1 / nt
    v = F.when(
        nt > 1,
        dt * (n1 / nt) * (1.0 - n1 / nt) * (nt - dt) / (nt - 1.0),
    ).otherwise(F.lit(0.0))
    total = pivoted.agg(
        F.sum(d1).alias("_o1"),
        F.sum(e1).alias("_e1"),
        F.sum(dt).alias("_ot"),
        F.sum(v).alias("_v"),
    )
    chi2 = F.when(
        F.col("_v") > 0,
        (F.col("_o1") - F.col("_e1"))
        * (F.col("_o1") - F.col("_e1"))
        / F.col("_v"),
    )
    # chi2 on 1 df: p = 2·(1−Φ(√chi2)) — exact, no WH needed at df=1
    p = normal_sf_two_sided(F.sqrt(chi2))
    summary = total.select(
        F.col("_o1").alias("_obs1"),
        F.col("_e1").alias("_exp1"),
        F.col("_ot").alias("_obst"),
        F.round(chi2, round_to).alias("chi2"),
        F.lit(1).cast("bigint").alias("df"),
        F.round(p, round_to).alias("p_value"),
    )
    per_group = s.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
        F.min("grp").alias("_self"),
    )
    first = per_group.select(F.min("grp").alias("_g1"))
    out = (
        per_group.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(first))
        .select(
            F.col("grp").alias("group"),
            "n_subjects",
            F.round(
                F.when(F.col("grp") == F.col("_g1"), F.col("_obs1"))
                .otherwise(F.col("_obst") - F.col("_obs1")),
                round_to,
            ).alias("observed"),
            F.round(
                F.when(F.col("grp") == F.col("_g1"), F.col("_exp1"))
                .otherwise(F.col("_obst") - F.col("_exp1")),
                round_to,
            ).alias("expected"),
            "chi2",
            "df",
            "p_value",
        )
        .orderBy("group")
    )
    return out


def dau_mau(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_to: int = 6,
) -> DataFrame:
    """Monthly DAU/MAU stickiness — the product-analytics engagement
    ratio ("what fraction of the monthly audience shows up on an
    average day?").  The reference's event analysis stops at daily
    volume counts (``apps/stat_explorer.py``); this is the standard
    ratio those dashboards put next to them.

    Definitions (deterministic, engine-portable):

    - ``dau_avg`` averages daily distinct users over the month's
      ACTIVE days (days with >= 1 event) — averaging over calendar
      days would make the ratio depend on month length and on whether
      the data covers partial months;
    - ``mau`` is the month's distinct users; ``stickiness`` =
      dau_avg / mau.

    Scale shape: both sides reduce (day, user) / (month, user)
    distinct pairs — two hash aggregates over the same scan, joined on
    the handful of month rows.  No windows, no per-user state; the
    events scan dominates, as it should at 100 TB.

    Output: month (date), n_days, dau_avg, mau, stickiness.
    """
    base = events.select(
        F.col(user_col).alias("_uid"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).filter(F.col("_uid").isNotNull() & F.col("_ts").isNotNull())
    day_users = base.select(
        F.date_trunc("month", F.col("_ts")).cast("date").alias("_month"),
        F.col("_ts").cast("date").alias("_day"),
        "_uid",
    ).distinct()
    daily = day_users.groupBy("_month", "_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("_dau")
    )
    per_month = daily.groupBy("_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.avg("_dau").alias("_dau_avg"),
    )
    mau = (
        day_users.select("_month", "_uid")
        .distinct()
        .groupBy("_month")
        .agg(F.count(F.lit(1)).cast("bigint").alias("mau"))
    )
    return (
        per_month.join(mau, "_month")
        .select(
            F.col("_month").alias("month"),
            "n_days",
            F.round("_dau_avg", round_to).alias("dau_avg"),
            "mau",
            F.round(F.col("_dau_avg") / F.col("mau"), round_to).alias(
                "stickiness"
            ),
        )
        .orderBy("month")
    )


def growth_accounting(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_to: int = 6,
) -> DataFrame:
    """Monthly growth accounting (the MAU ledger): every month's active
    users decompose EXACTLY into ``new`` (first month ever),
    ``retained`` (also active the previous calendar month), and
    ``resurrected`` (active some earlier month, but not the previous
    one); ``churned`` counts the previous month's actives who did not
    return this month.  The two identities every growth report is
    built on — ``mau = new + retained + resurrected`` and
    ``mau − mau_prev = new + resurrected − churned`` — hold row by
    row, and ``quick_ratio`` = (new + resurrected) / churned (NULL
    when nothing churned).

    Scale shape: ONE shuffle by user builds the distinct (user, month)
    activity table with a per-user lag (previous active month) and
    running first month — the same user-partitioned window family as
    :func:`cohort_retention`; classification is then row-local and the
    month rollup is a tiny aggregate.  Churn needs no second pass:
    ``churned(m) = mau(m−1) − retained(m)`` by definition, read from
    the month table's own lag.  Month arithmetic is integer
    ``year*12 + month`` (engine-portable, no month-length floats).

    Output per month: month, mau, n_new, n_retained, n_resurrected,
    n_churned, quick_ratio.
    """
    midx = lambda c: F.year(c) * F.lit(12) + F.month(c) - F.lit(1)  # noqa: E731
    activity = (
        events.select(
            F.col(user_col).alias("_uid"),
            F.date_trunc("month", F.col(ts_col).cast("timestamp"))
            .cast("date")
            .alias("_month"),
        )
        .filter(F.col("_uid").isNotNull() & F.col("_month").isNotNull())
        .distinct()
        .withColumn("_mi", midx(F.col("_month")))
    )
    w = Window.partitionBy("_uid").orderBy("_mi")
    tagged = activity.select(
        "_uid",
        "_month",
        "_mi",
        F.lag("_mi").over(w).alias("_prev_mi"),
    )
    monthly = tagged.groupBy("_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("mau"),
        F.sum(F.when(F.col("_prev_mi").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(
            F.when(F.col("_prev_mi") == F.col("_mi") - 1, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("_prev_mi").isNotNull()
                & (F.col("_prev_mi") < F.col("_mi") - 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    wm = Window.orderBy(F.col("_month").asc())
    # The month table is tiny (one row per calendar month), so the
    # unpartitioned lag window is a driver-sized frame, not a funnel.
    out = monthly.withColumn("_mau_prev", F.lag("mau").over(wm)).withColumn(
        "n_churned",
        (F.coalesce(F.col("_mau_prev"), F.lit(0)) - F.col("n_retained"))
        .cast("bigint"),
    )
    return out.select(
        F.col("_month").alias("month"),
        "mau",
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_churned",
        F.round(
            F.when(
                F.col("n_churned") > 0,
                (F.col("n_new") + F.col("n_resurrected")).cast("double")
                / F.col("n_churned"),
            ),
            round_to,
        ).alias("quick_ratio"),
    ).orderBy("month")


def activity_streaks(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user consecutive-day activity streaks — the classic
    gaps-and-islands reduction (longest streak, streak count) behind
    habit/engagement scoring and "N-day streak" product features.

    The island key is the textbook rank trick: over each user's
    DISTINCT active days in date order, ``day − row_number`` days is
    constant exactly within a run of consecutive dates — one
    user-partitioned window plus two hash aggregates, no self-join,
    no per-user iteration.  Everything shuffles once on user_id; the
    output is one row per user.

    Output: user, n_active_days, n_streaks, longest_streak,
    current span NOT included (no "as of" clock — deterministic
    replay needs no wall time).
    """
    days = (
        events.select(
            F.col(user_col).alias("user"),
            F.col(ts_col).cast("timestamp").cast("date").alias("_day"),
        )
        .filter(F.col("user").isNotNull() & F.col("_day").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("user").orderBy("_day")
    islands = days.withColumn(
        "_grp", F.date_sub(F.col("_day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user", "_grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("_len")
    )
    return (
        streaks.groupBy("user")
        .agg(
            F.sum("_len").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.max("_len").cast("bigint").alias("longest_streak"),
        )
        .orderBy("user")
    )
