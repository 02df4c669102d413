"""Round-9 late additions, batch e: graph structure readouts —
degree assortativity (Newman's edge-end degree correlation) and
directed reciprocity — against closed-form graphs and a random-graph
brute force.
"""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest

from knot_another_pipeline_spark.operators.graph import (
    degree_assortativity,
    reciprocity,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


# ---------------------------------------------------------------------------
# degree_assortativity


def test_star_graph_is_perfectly_disassortative(spark):
    out = degree_assortativity(
        _edges_df(spark, [("hub", f"leaf{i}") for i in range(6)])
    ).collect()[0]
    # every symmetrized edge pairs degree 6 with degree 1 -> r = -1
    assert out["n_edges"] == 12
    assert out["assortativity"] == pytest.approx(-1.0, abs=1e-9)


def test_cycle_graph_has_null_assortativity(spark):
    n = 8
    cyc = [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)]
    out = degree_assortativity(_edges_df(spark, cyc)).collect()[0]
    # all degrees equal -> zero variance -> undefined, not 0.0
    assert out["assortativity"] is None
    assert out["n_edges"] == 2 * n


def _brute_assortativity(pairs, directed):
    ends = list(pairs)
    if not directed:
        ends = ends + [(d, s) for s, d in ends]
        deg = defaultdict(int)
        for s, _ in ends:
            deg[s] += 1
        xy = [(deg[s], deg[d]) for s, d in ends]
    else:
        outd, ind = defaultdict(int), defaultdict(int)
        for s, d in ends:
            outd[s] += 1
            ind[d] += 1
        xy = [(outd[s], ind[d]) for s, d in ends]
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx = sum(x * x for x, _ in xy)
    syy = sum(y * y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    vx, vy = sxx - sx * sx / n, syy - sy * sy / n
    if vx <= 0 or vy <= 0:
        return None
    return (sxy - sx * sy / n) / math.sqrt(vx * vy)


@pytest.mark.parametrize("directed", [False, True])
def test_assortativity_matches_bruteforce_random_graph(spark, directed):
    rng = random.Random(23)
    pairs = [
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}") for _ in range(300)
    ]
    pairs = [(s, d) for s, d in pairs if s != d]
    out = degree_assortativity(
        _edges_df(spark, pairs), directed=directed
    ).collect()[0]
    expect = _brute_assortativity(pairs, directed)
    assert out["assortativity"] == pytest.approx(expect, abs=1e-5)
    assert out["n_edges"] == (len(pairs) if directed else 2 * len(pairs))


def test_assortativity_drops_null_endpoints(spark):
    pairs = [("a", "b"), ("a", None), (None, "b"), ("b", "c")]
    out = degree_assortativity(
        spark.createDataFrame(pairs, "src string, dst string")
    ).collect()[0]
    assert out["n_edges"] == 4  # 2 real edges, symmetrized


# ---------------------------------------------------------------------------
# reciprocity


def test_reciprocity_counts_mutual_pairs(spark):
    pairs = [
        ("a", "b"), ("b", "a"),          # mutual
        ("a", "c"),                       # one-way
        ("c", "d"), ("d", "c"),          # mutual
        ("d", "e"),
    ]
    out = reciprocity(_edges_df(spark, pairs)).collect()[0]
    assert out["n_edges"] == 6
    assert out["n_reciprocal"] == 4
    assert out["reciprocity"] == pytest.approx(4 / 6, abs=1e-6)


def test_reciprocity_dedups_and_drops_loops(spark):
    pairs = [("a", "b")] * 5 + [("b", "a")] + [("a", "a")] * 3 + [("c", "d")]
    out = reciprocity(_edges_df(spark, pairs)).collect()[0]
    # distinct non-loop edges: (a,b), (b,a), (c,d)
    assert out["n_edges"] == 3
    assert out["n_reciprocal"] == 2
    assert out["reciprocity"] == pytest.approx(2 / 3, abs=1e-6)


def test_reciprocity_empty_graph_is_null(spark):
    out = reciprocity(
        _edges_df(spark, [("a", "a")])  # loops only -> empty after filter
    ).collect()[0]
    assert out["n_edges"] == 0 and out["n_reciprocal"] == 0
    assert out["reciprocity"] is None


def test_reciprocity_matches_bruteforce_random_graph(spark):
    rng = random.Random(29)
    pairs = {
        (f"n{rng.randrange(15)}", f"n{rng.randrange(15)}") for _ in range(120)
    }
    pairs = {(s, d) for s, d in pairs if s != d}
    out = reciprocity(_edges_df(spark, sorted(pairs))).collect()[0]
    mutual = sum(1 for s, d in pairs if (d, s) in pairs)
    assert out["n_edges"] == len(pairs)
    assert out["n_reciprocal"] == mutual
    assert out["reciprocity"] == pytest.approx(mutual / len(pairs), abs=1e-6)
