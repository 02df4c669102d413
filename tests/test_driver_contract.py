"""Driver-contract invariants (VERDICT r6 tasks #3 and #7).

Two failure classes the driver gate has actually produced are pinned
here so they cannot recur:

1. Round 5's only red rows came from catalog queries projecting ARRAY
   columns — the driver's value canonicalizer hashes scalar cells only.
   ``test_all_outputs_scalar_only`` instantiates every catalog query at
   sf0.001 and walks its schema: any Array/Map/Struct column fails.

2. The driver's correctness window has emitted exactly the first 50
   ``queries()`` keys every round, so rotation order IS the coverage
   lever.  ``test_round8_window_is_pinned_queue`` asserts the first 50
   ordered keys are exactly the documented round-8 queue (the 35
   never-gated keys oldest-first, then the 15 round-8 additions) and
   that none of them already has a driver CORRECTNESS row.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest
from pyspark.sql import types as T

from knot_another_pipeline_spark.catalog_queries import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tools import plan_shapes

with open(
    os.path.join(os.path.dirname(plan_shapes.__file__), "plan_shapes.json")
) as _fh:
    _PLAN_LEDGER = json.load(_fh)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_COMPLEX = (T.ArrayType, T.MapType, T.StructType)

# The round-8 driver window: the 22 r6-deferred keys, the 13 round-7
# additions, then the 15 round-8 additions — 50 exactly (VERDICT r7
# task #1: never-gated backlog first, new keys capped at 15).
_ROUND8_WINDOW = [
    "zipf_fit", "source_terms", "oov_rate", "join_cardinality",
    "dbscan_grid", "quantile_normalize", "proportion_test",
    "reweight_to_target", "audience_overlap", "cluster_purity",
    "seasonal_naive_error", "profile_drift", "fano_burstiness",
    "embedding_drift", "rank_movers", "binned_mutual_info",
    "dedup_pr_curve", "tfidf_cosine_pairs", "wasserstein_drift",
    "poisson_rate_ci", "track_length", "community_quality",
    "classification_report", "conformal_threshold", "bradley_terry",
    "class_weights", "boilerplate_lines", "segment_dedup",
    "knn_label_noise", "dim_truncation", "pareto_front", "group_fairness",
    "cumulative_users", "blocking_quality", "shard_moves",
    "order_priority", "customer_distribution", "small_qty_revenue",
    "big_order_customers", "disjunctive_revenue", "waiting_suppliers",
    "idle_customers", "mann_whitney", "kendall_profiles", "silhouette",
    "regression_report", "brier_decomposition", "signal_gaps",
    "od_matrix", "track_sinuosity",
]


def _gated_keys() -> set[str]:
    import glob

    out: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        out.update(json.load(open(path)))
    return out


def test_round8_window_is_pinned_queue():
    mod = _entry_module()
    ordered = mod._ordered_keys()
    assert len(ordered) == len(set(ordered)), "duplicate keys in queue"
    assert set(ordered) == set(QUERIES), "queue does not cover the catalog"
    assert ordered[:50] == _ROUND8_WINDOW
    already = set(ordered[:50]) & _gated_keys()
    assert not already, f"window wastes slots on gated keys: {sorted(already)}"


def test_queue_drains_never_gated_first():
    """Every never-gated key must sort ahead of every already-gated key."""
    mod = _entry_module()
    ordered = mod._ordered_keys()
    gated = _gated_keys() & set(ordered)
    never = [k for k in ordered if k not in gated]
    cutoff = max(ordered.index(k) for k in never)
    early_gated = [k for k in ordered[:cutoff] if k in gated]
    assert not early_gated, (
        f"gated keys queued ahead of never-gated ones: {early_gated[:5]}"
    )


def test_every_query_has_oracle_or_documented_exemption():
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert not missing, f"queries without a DuckDB oracle: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_all_outputs_scalar_only(name, spark):
    """No catalog query may project Array/Map/Struct columns — the
    driver's value canonicalizer hashes scalar cells only (the round-5
    red-row class).  Same pass also pins the plan-shape invariant: no
    initial physical plan may contain a CartesianProduct (a broadcast
    1-row crossJoin plans as BroadcastNestedLoopJoin and is fine; a
    bare CartesianProduct is always an unbounded all-pairs bug at
    scale).  Audited clean across the whole catalog in round 7, and the
    exchange counts are pinned against tools/plan_shapes.json below."""
    df = QUERIES[name](spark, SF_SMOKE)
    bad = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"{name} projects non-scalar columns {bad}; the driver gate "
        "cannot hash these — canonicalize to string/number first"
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "CartesianProduct" not in plan, (
        f"{name} plans a CartesianProduct — an all-pairs join escaped "
        "its blocking/banding/broadcast strategy"
    )
    shape = plan_shapes.plan_shape(df)
    recorded = _PLAN_LEDGER.get(name)
    assert recorded is not None, (
        f"{name} has no entry in tools/plan_shapes.json — run "
        "`python tools/plan_shapes.py --write`"
    )
    assert shape == recorded, (
        f"{name} plan shape drifted: ledger={recorded} now={shape}. "
        "A shuffle-count INCREASE is a scale regression; a decrease is "
        "an improvement — either way regenerate the ledger deliberately "
        "(`python tools/plan_shapes.py --write`)"
    )


def test_scale_probe_tool_smoke(spark, tmp_path, monkeypatch):
    """The scaling-probe tool runs end-to-end on the smallest fixtures
    and emits per-factor seconds, row counts, and slopes for every op."""
    import sys

    from tools import scale_probe

    monkeypatch.setattr(scale_probe, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(scale_probe, "WORK", str(tmp_path / "probe"))
    out = tmp_path / "probe.json"
    monkeypatch.setattr(
        sys, "argv", ["scale_probe.py", "--factors=1,2", f"--out={out}"]
    )
    scale_probe.main()
    doc = json.loads(out.read_text())
    assert doc["factors"] == [1, 2]
    assert set(doc["ops"]) == set(scale_probe.OPS_ALL)
    for op, r in doc["ops"].items():
        assert set(r["sec"]) == {"1", "2"}, op
        assert isinstance(r["loglog_slope"], float), op
    assert doc["input_rows"]["2"]["events"] == 2 * doc["input_rows"]["1"]["events"]
