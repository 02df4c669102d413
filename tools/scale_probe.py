#!/usr/bin/env python
"""Measured scaling evidence: run flagship catalog queries against
structure-preserving replications of the driver-generated sf0.1 tables
at 1x / 2x / 4x rows and record wall time per factor.

Replication shifts entity ids and (for events) timestamps by a year per
copy, so every copy is a disjoint population in a disjoint time range:
per-entity structure, group sizes, join selectivity, and co-location
semantics are preserved while row count scales by k — the honest way to
ask "does the plan's cost grow linearly in rows on fixed cores?"
(replicating rows verbatim would instead multiply group sizes and
explode pair joins quadratically, measuring the data change, not the
plan). The inputs remain the driver's own fixtures — this probe never
invents data, it tiles it.

Probed queries (one per major family, all shuffle-bearing):
- ais_hourly      — the reference rollup (events -> hourly grid cells)
- pairs_monthly   — the flagship co-movement self-join chain
- exact_dedup     — fingerprint group dedup over documents
- bm25_search     — inverted-postings retrieval scoring
- hll_distinct    — sketch-merge distinct counting
- minhash_pairs / dedup_components / canonical_docs / prefix_jaccard —
  the near-dup paths (canonical_docs is the LSH path's full composition
  through components and argmax; prefix_jaccard is the EXACT
  set-similarity join), probed on a WORD-SALTED replica (every token
  prefixed with the copy tag, so cross-copy Jaccard is 0 and near-dup
  clusters stay per-copy — id-shift alone would make every copy a
  near-duplicate of every other and grow the true pair count
  quadratically, measuring the data, not the plan).
  exact_dedup and bm25_search stay on the UNSALTED replica: salting
  would divorce bm25's fixed query terms from 15/16ths of the corpus.
- fuzzy_match — the FastSS deletion-neighborhood join over customer
  names, probed on a NAME-SALTED customer replica (copy tag ``iiii_``
  prefixed to every name; pairwise salt distance is 4 > max_distance=1,
  so cross-copy matches stay impossible and the true pair count scales
  linearly in copies).

Output: SCALE_PROBE_r{N}.json with per-factor seconds, row counts, and
the log-log slope between the smallest and largest factor (1.0 = exactly
linear; < 1 = better than linear thanks to fixed overheads amortizing).

Usage: python tools/scale_probe.py [--factors 1,2,4] [--out FILE]
(both ``--flag value`` and ``--flag=value`` forms are accepted)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/knap_scale_probe"

OPS = [
    "ais_hourly",
    "pairs_monthly",
    "exact_dedup",
    "bm25_search",
    "hll_distinct",
    # heavy_hitters on the UNSALTED documents replica: copies repeat the
    # same text, so the hitter set is constant while N and every count
    # scale by k — output rows fixed, work linear, the plan is what's
    # measured.
    "heavy_hitters",
    # periodogram on the year-shifted events replica: the hourly series
    # grows k-fold in looks while the candidate-period list stays fixed,
    # so the trig aggregate's row volume scales by k with constant
    # output (one row per series x candidate).
    "periodogram",
    # layout_pruning on the shifted events replica: three global_ranks
    # + group stats over k-fold rows, output fixed at 3 layout rows —
    # the probe measures the range-shuffle + prefix-sum rank path.
    "layout_pruning",
    # ljung_box / hurst_exponent on the shifted events replica: the
    # event_type series set is FIXED (copies share types), so each
    # series grows k-fold in length while output stays one row per
    # series — the honest stress of the per-series window contract
    # (ljung_box funnels each series through one partition; hurst's
    # block windows re-spread on (series, scale, block)).
    "ljung_box",
    "hurst_exponent",
    # delong_auc on the shifted events replica: 7 fixed weekday groups,
    # rows per group grow k-fold, output fixed — measures the two rank
    # windows + placement aggregate.
    "delong_auc",
    # energy_drift on the shifted events replica: the pooled-sort
    # window sees k-fold rows (the fixed 2024-01-16 split means the
    # year-shifted copies all land on the "current" side, so n_base
    # stays fixed while n_cur grows — the pass cost is what scales,
    # and that is the thing probed).
    "energy_drift",
    # round-10 series diagnostics on the shifted events replica: the
    # event_type series set is FIXED while each series grows k-fold in
    # length (copies are disjoint years appended in time), so the
    # stacked cumulative windows (page_hinkley), lag+OLS aggregate
    # (dickey_fuller), trig-sum crossJoin (spectral_entropy), exact
    # median + lag window (runs_test), and MA/phase windows
    # (seasonal_strength) all see k-fold partition lengths with output
    # fixed at one row per series.
    "page_hinkley",
    "dickey_fuller",
    "spectral_entropy",
    "runs_test",
    "seasonal_strength",
    # round-10 rank/permutation/survival probes, same replica: user ids
    # shift per copy so subject counts scale by k with per-subject
    # structure preserved (wilcoxon pairs, log_rank/nelson_aalen risk
    # sets, friedman cell sizes — blocks stay 30 buckets/fam, cells
    # grow k-fold inside); permutation_diff's 100-seed crossJoin sees
    # exactly 100k-fold hash evaluations with a fixed 1-row output.
    "wilcoxon_pairs",
    "friedman_rank",
    "permutation_diff",
    "nelson_aalen",
    "log_rank",
    # anderson_darling's pooled per-family rank window sees k-fold rows
    # per event type (the mann_whitney contract under stress);
    # krippendorff/l_diversity/tost/mantel are narrowing aggregates over
    # k-fold rows with fixed outputs.
    "anderson_darling",
    "krippendorff_alpha",
    "l_diversity",
    "tost_equivalence",
    "mantel_haenszel",
    # control_chart: the rule windows see k-fold series length, output
    # one row per fixed event type.  heaps_law on the UNSALTED docs
    # replica: copies repeat the same text, so vocab and beta are
    # constant while the tokenize/explode volume scales by k — the
    # probe measures the postings plan, not vocabulary growth.
    "control_chart",
    "heaps_law",
    # rouge_bigram pairs doc_id with doc_id+1, so id-shifted copies
    # keep every pair within its copy; token_jsd's per-source shares
    # are copy-invariant (sources repeat) while the token volume
    # scales by k.  distribution_overlap / cliffs_delta run on the
    # shifted events replica: per-type class shares are preserved,
    # the binning/midrank passes see k-fold rows, output fixed.
    "rouge_bigram",
    "token_jsd",
    "distribution_overlap",
    "cliffs_delta",
    # round-11 product-analytics ledgers on the shifted events replica:
    # copies are disjoint users in disjoint years, so months, users,
    # and streak islands all scale linearly in k with per-month /
    # per-user structure preserved — dau_mau/growth_accounting measure
    # the distinct-pair aggregates + per-user lag, activity_streaks the
    # gaps-and-islands window.  hill_tail_index: event-type groups are
    # fixed, rows grow k-fold, the top-51 rank window is what's
    # probed (output one row per type).  peak_detection: each series
    # grows k-fold in length (disjoint years appended), peaks scale
    # ~linearly, the lag/lead window pass is the cost.
    "dau_mau",
    "growth_accounting",
    "activity_streaks",
    "hill_tail_index",
    "peak_detection",
    # gumbel_maxima: the (series, month) block-maxima table grows
    # k-fold in blocks (disjoint years) at fixed series count — the
    # probe measures the two narrowing aggregates.  engle_granger:
    # the view/click daily pair series grows k-fold in length; the
    # OLS moments, residual lag window, and ADF aggregate all see
    # k-fold rows with a fixed 1-row output.
    "gumbel_maxima",
    "engle_granger",
]
OPS_SALTED = [
    "minhash_pairs",
    "dedup_components",
    "canonical_docs",
    "fuzzy_match",
    "prefix_jaccard",
    # substring_dedup on the SALTED replica for the same reason as the
    # near-dup probes: unsalted copies make every gram of every copy-2+
    # document removable, so output (and the true answer) would grow
    # with copy count² effects at the gram-key grain; salting keeps
    # cross-copy grams distinct, so the true span set scales exactly
    # linearly in copies and the probe measures the PLAN.
    "substring_dedup",
    # lsh_tuning on the SALTED replica: the fixed-pct hash-sample grows
    # k-fold but cross-copy shingle overlap is 0, so the exact-Jaccard
    # pair table (and the true pair set) scales linearly in copies —
    # the probe measures the sample-join + broadcast-grid plan.
    "lsh_tuning",
]
# TPC-H fact-join shapes, probed on an ORDERKEY-SHIFTED replica of
# lineitem+orders (dims copied verbatim): per-order structure and every
# dimension selectivity are preserved while the fact row count scales
# by k — the group-by-orderkey sizes stay constant (Q3) and the
# nation×year groups grow k-fold (Q9), exactly the 100 TB behavior.
# Dates are NOT shifted: shifting would move copies across the probe
# queries' date windows and change filter selectivity per copy.
OPS_TPCH = [
    "shipping_priority",
    "product_profit",
    # mood_median on the orderkey-shifted replica: orders rows
    # duplicate k-fold with identical prices/dates, so per-year
    # medians and class shares are constant while the median
    # percentile aggregate and the 2xk table scan k-fold rows.
    "mood_median",
    # tail_dependence / abc_classes on the same replica: quantiles and
    # per-part revenue shares are copy-invariant, row volume scales by
    # k (abc output stays one row per part — parts are not shifted).
    "tail_dependence",
    "abc_classes",
    # round-11 on the orderkey-shifted replica (dims verbatim, per-
    # customer/part/supplier volumes scale k-fold with shares
    # invariant): theil_index / lorenz_curve measure the spend
    # aggregate + rank path at k-fold spend mass (output fixed);
    # eb_shrinkage the two-level moment fit (one row per part);
    # rank_biased_overlap the two leaderboard rank windows (ranks are
    # copy-invariant, rbo constant); herfindahl_index the nested
    # share aggregates (one row per nation).
    "theil_index",
    "lorenz_curve",
    "eb_shrinkage",
    "rank_biased_overlap",
    "herfindahl_index",
    # h_index: per-supplier line counts grow k-fold (orderkey-shifted
    # copies share suppliers), so the rank window sees k-fold rows per
    # supplier; h itself grows with depth — output stays one row per
    # supplier and the window pass is the probed cost.
    "h_index",
]
# Iterative/graph shapes, probed on a BOTH-KEYS-SHIFTED lineitem replica
# (l_orderkey AND l_partkey shifted per copy): each copy is a DISJOINT
# order<->part graph, so node count, walk count, and per-root reach all
# scale exactly linearly in k.  The orderkey-only TPC-H replica would
# instead fuse the copies through shared part nodes — part degrees grow
# k-fold and the true 2-hop reach grows k^2, measuring the data, not
# the plan (same argument as the word-salted near-dup replicas).
OPS_GRAPH = [
    "pagerank",
    "reach_census",
    "deterministic_walks",
    # assortativity on the disjoint-copies graph: per-copy degree
    # distributions are preserved exactly, edges scale by k, output is
    # one row — measures the two degree aggregates + edge join.
    "assortativity",
    # harmonic_centrality on the disjoint-copies graph: roots and every
    # bounded-hop frontier scale linearly in k (copies never fuse), so
    # the three frontier joins carry k-fold rows with per-root reach
    # constant — the same argument as reach_census.
    "harmonic_centrality",
]
OPS_ALL = OPS + OPS_SALTED + OPS_TPCH + OPS_GRAPH


def build_replica(spark, k: int) -> str:
    """Write k structure-preserving copies of events + documents."""
    import pyspark.sql.functions as F

    from knot_another_pipeline_spark.sources.tables import load_table

    out = os.path.join(WORK, f"k{k}")
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    ev = load_table(spark, SF_DIR, "events")
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(i * 10**12)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i * 366} DAYS")).alias("ts"),
            (F.col("user_id") + F.lit(i * 10**7)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(k)
    ]
    evk = copies[0]
    for c in copies[1:]:
        evk = evk.unionByName(c)
    evk.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    docs = load_table(spark, SF_DIR, "documents")
    dcopies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        for i in range(k)
    ]
    dk = dcopies[0]
    for c in dcopies[1:]:
        dk = dk.unionByName(c)
    dk.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    # word-salted variant for the near-dup probes: prefix every token
    # with the copy tag so cross-copy Jaccard is 0
    out_s = os.path.join(WORK, f"k{k}s")
    if os.path.exists(out_s):
        shutil.rmtree(out_s)
    os.makedirs(out_s)
    scopies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"c{i}_$1").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(k)
    ]
    sk = scopies[0]
    for c in scopies[1:]:
        sk = sk.unionByName(c)
    sk.write.mode("overwrite").parquet(os.path.join(out_s, "documents.parquet"))

    # name-salted customer replica for fuzzy_match: the "iiii_" prefix
    # puts every cross-copy name pair at edit distance >= 4, far above
    # the probe's max_distance=1, so matches stay strictly per-copy.
    cust = load_table(spark, SF_DIR, "customer")
    ccopies = [
        cust.select(
            (F.col("c_custkey") + F.lit(i * 10**9)).alias("c_custkey"),
            F.concat(F.lit(str(i) * 4 + "_"), F.col("c_name")).alias("c_name"),
            "c_mktsegment",
        )
        for i in range(k)
    ]
    ck = ccopies[0]
    for c in ccopies[1:]:
        ck = ck.unionByName(c)
    ck.write.mode("overwrite").parquet(os.path.join(out_s, "customer.parquet"))

    # orderkey-shifted TPC-H fact replica (see OPS_TPCH note above)
    out_t = os.path.join(WORK, f"k{k}t")
    if os.path.exists(out_t):
        shutil.rmtree(out_t)
    os.makedirs(out_t)
    for t in ("customer", "supplier", "nation", "region", "part"):
        shutil.copy(
            os.path.join(SF_DIR, f"{t}.parquet"),
            os.path.join(out_t, f"{t}.parquet"),
        )
    li = load_table(spark, SF_DIR, "lineitem")
    lcopies = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 10**9)).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        for i in range(k)
    ]
    lk = lcopies[0]
    for c in lcopies[1:]:
        lk = lk.unionByName(c)
    lk.write.mode("overwrite").parquet(os.path.join(out_t, "lineitem.parquet"))
    od = load_table(spark, SF_DIR, "orders")
    ocopies = [
        od.select(
            (F.col("o_orderkey") + F.lit(i * 10**9)).alias("o_orderkey"),
            *[c for c in od.columns if c != "o_orderkey"],
        )
        for i in range(k)
    ]
    ok = ocopies[0]
    for c in ocopies[1:]:
        ok = ok.unionByName(c)
    ok.write.mode("overwrite").parquet(os.path.join(out_t, "orders.parquet"))

    # both-keys-shifted graph replica: disjoint order<->part copies
    # (see OPS_GRAPH note above)
    out_g = os.path.join(WORK, f"k{k}g")
    if os.path.exists(out_g):
        shutil.rmtree(out_g)
    os.makedirs(out_g)
    gcopies = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 10**9)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * 10**9)).alias("l_partkey"),
            *[
                c
                for c in li.columns
                if c not in ("l_orderkey", "l_partkey")
            ],
        )
        for i in range(k)
    ]
    gk = gcopies[0]
    for c in gcopies[1:]:
        gk = gk.unionByName(c)
    gk.write.mode("overwrite").parquet(os.path.join(out_g, "lineitem.parquet"))
    return out


def main() -> None:
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from knot_another_pipeline_spark.catalog_queries import QUERIES
    from knot_another_pipeline_spark.session import get_spark

    # argparse accepts both "--factors 1,2,4" and "--factors=1,2,4" and
    # errors on unrecognized argv (the old hand-parser silently ignored
    # the space-separated form and ran with defaults).
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--factors", default="1,2,4")
    parser.add_argument(
        "--samples",
        type=int,
        default=3,
        # min-of-2 on a fresh JVM rides the heap-growth/JIT slope (the
        # r8 probe recorded 57.5s for a query whose warm floor was 27s);
        # 3+ samples with the full list published keeps the min honest.
    )
    parser.add_argument(
        "--out", default=os.path.join(REPO, "SCALE_PROBE.json")
    )
    parser.add_argument(
        "--ops",
        default="",
        help="comma-separated subset of probed ops (diagnostics: re-run "
        "one op on a quiet box without paying for the whole matrix)",
    )
    cli = parser.parse_args()
    factors = [int(x) for x in cli.factors.split(",")]
    global OPS, OPS_SALTED, OPS_TPCH, OPS_GRAPH, OPS_ALL
    if cli.ops:
        wanted = set(cli.ops.split(","))
        unknown = wanted - set(OPS_ALL)
        if unknown:
            raise SystemExit(f"unknown probe ops: {sorted(unknown)}")
        OPS = [o for o in OPS if o in wanted]
        OPS_SALTED = [o for o in OPS_SALTED if o in wanted]
        OPS_TPCH = [o for o in OPS_TPCH if o in wanted]
        OPS_GRAPH = [o for o in OPS_GRAPH if o in wanted]
        OPS_ALL = OPS + OPS_SALTED + OPS_TPCH + OPS_GRAPH
    out_path = cli.out
    spark = get_spark()
    results: dict[str, dict] = {
        op: {"sec": {}, "samples": {}, "rows": {}} for op in OPS_ALL
    }
    row_counts = {}
    # untimed warmup at the smallest factor so k=1 doesn't also pay
    # first-use JIT/codegen costs the larger factors get for free
    warm = build_replica(spark, min(factors))
    warm_s = os.path.join(WORK, f"k{min(factors)}s")
    warm_t = os.path.join(WORK, f"k{min(factors)}t")
    warm_g = os.path.join(WORK, f"k{min(factors)}g")
    for op in OPS:
        QUERIES[op](spark, warm).count()
    for op in OPS_SALTED:
        QUERIES[op](spark, warm_s).count()
    for op in OPS_TPCH:
        QUERIES[op](spark, warm_t).count()
    for op in OPS_GRAPH:
        QUERIES[op](spark, warm_g).count()
    for k in factors:
        d = build_replica(spark, k)
        row_counts[str(k)] = {
            "events": spark.read.parquet(os.path.join(d, "events.parquet")).count(),
            "documents": spark.read.parquet(
                os.path.join(d, "documents.parquet")
            ).count(),
        }
        row_counts[str(k)]["lineitem"] = spark.read.parquet(
            os.path.join(WORK, f"k{k}t", "lineitem.parquet")
        ).count()
        ds = os.path.join(WORK, f"k{k}s")
        dt = os.path.join(WORK, f"k{k}t")
        dg = os.path.join(WORK, f"k{k}g")
        for op in OPS_ALL:
            src_dir = (
                ds
                if op in OPS_SALTED
                else dt
                if op in OPS_TPCH
                else dg
                if op in OPS_GRAPH
                else d
            )
            # One UNTIMED warmup per (op, factor): the smallest-factor
            # warmup above does not JIT/grow the heap for the large
            # factors' working sets, and the heavy queries need several
            # runs before min-of-N stops measuring the JVM ramp
            # (pairs_monthly at 16x: cold 45s -> warm floor ~17s; the
            # r9 artifacts disagreed by 2x purely on warm state).
            # Nothing is cached across runs — every sample re-executes
            # the full plan.
            QUERIES[op](spark, src_dir).count()
            samples = []
            for _ in range(cli.samples):
                t0 = time.perf_counter()
                n = QUERIES[op](spark, src_dir).count()
                samples.append(round(time.perf_counter() - t0, 3))
            results[op]["sec"][str(k)] = min(samples)
            results[op]["samples"][str(k)] = samples
            results[op]["rows"][str(k)] = n
            print(
                f"# k={k} {op}: {min(samples)}s ({n} rows)", file=sys.stderr
            )
    import math

    lo, hi = str(min(factors)), str(max(factors))
    for op in OPS_ALL:
        t1, tk = results[op]["sec"][lo], results[op]["sec"][hi]
        # a single-factor run has no span to fit a slope over
        results[op]["loglog_slope"] = (
            round(math.log(tk / t1) / math.log(max(factors) / min(factors)), 3)
            if max(factors) > min(factors)
            else 0.0
        )
        # Per-SEGMENT slopes (VERDICT r8 task #2): the whole-range fit
        # can mask a superlinear tail — quote every consecutive-factor
        # exponent, in input-factor and in output-rows terms, so a
        # throughput collapse on the last segment is visible directly.
        segs = {}
        ordered = sorted(factors)
        for a, b in zip(ordered, ordered[1:]):
            ta, tb = results[op]["sec"][str(a)], results[op]["sec"][str(b)]
            ra, rb = results[op]["rows"][str(a)], results[op]["rows"][str(b)]
            if ta <= 0 or tb <= 0:
                continue
            seg = {"time_ratio": round(tb / ta, 3)}
            seg["input_exponent"] = round(
                math.log(tb / ta) / math.log(b / a), 3
            )
            if ra and rb and rb != ra:
                seg["rows_ratio"] = round(rb / ra, 3)
                seg["output_exponent"] = round(
                    math.log(tb / ta) / math.log(rb / ra), 3
                )
            segs[f"{a}->{b}"] = seg
        results[op]["segments"] = segs
    doc = {
        "sf_base": SF_DIR,
        "factors": factors,
        "input_rows": row_counts,
        "ops": results,
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh)
    print(json.dumps({op: results[op]["loglog_slope"] for op in OPS_ALL}))


if __name__ == "__main__":
    main()
