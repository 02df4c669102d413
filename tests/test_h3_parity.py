"""True-H3 UDF-path parity tests (U1).

The image has no h3-py, so the engine normally runs the ``grid_cell``
fallback. These tests inject a deterministic *stub* ``h3`` module
(importable from disk, shipped to Spark workers via ``addPyFile``) so the
real pandas-UDF code path in ``functions/geo.py`` and
``plans/sql_gold.py`` executes end-to-end, and assert the reference
output contract: 15 lowercase hex chars per cell
(``/root/reference/docs/data_contracts.md:88``; UDF declared at
``/root/reference/sql/gold/create_uid_hourly_h3.sql:24-26``, applied at
``:61``), with downstream pairs produced from the UDF-built hourly table.
"""

from __future__ import annotations

import re
import sys
import warnings

import pytest
from pyspark.sql import functions as F

from tests.test_ais_pipeline import _ais_fixture

# Deterministic fake encoder: quantizes to a ~0.1 deg grid (so co-located
# fixture vessels share cells) and emits <res-hex><14 sha-hex> = 15 chars,
# the same shape as a real res-7 H3 address.
_STUB_SRC = '''
import hashlib


def latlng_to_cell(lat, lng, res):
    qlat = int((float(lat) + 90.0) / 0.1)
    qlng = int((float(lng) + 180.0) / 0.1)
    key = ("%d:%d:%d" % (qlat, qlng, int(res))).encode()
    return format(int(res), "x") + hashlib.sha256(key).hexdigest()[:14]
'''

_CELL_RE = re.compile(r"^[0-9a-f]{15}$")


@pytest.fixture()
def h3_stub(spark, tmp_path):
    """Install an importable stub ``h3`` on driver + workers; clean up."""
    stub = tmp_path / "h3.py"
    stub.write_text(_STUB_SRC)
    saved_path = list(sys.path)  # addPyFile also mutates driver sys.path
    spark.sparkContext.addPyFile(str(stub))
    sys.path.insert(0, str(tmp_path))
    sys.modules.pop("h3", None)
    try:
        yield
    finally:
        sys.path[:] = saved_path
        sys.modules.pop("h3", None)


def test_h3_module_detected(h3_stub):
    from knot_another_pipeline_spark.functions import geo

    assert geo.h3_module() is not None


def test_h3_cell_udf_path_end_to_end(spark, h3_stub):
    """build_uid_hourly_h3 through the pandas-UDF encoder, then pairs."""
    from knot_another_pipeline_spark.operators.pairs import co_movement_pairs
    from knot_another_pipeline_spark.operators.rollup import build_uid_hourly_h3

    hourly = build_uid_hourly_h3(_ais_fixture(spark)).cache()
    try:
        rows = hourly.collect()
        assert rows
        for r in rows:
            assert _CELL_RE.fullmatch(r["h3_index"]), r["h3_index"]
        # co-located fixture vessels A/B land in the same stub-H3 cells,
        # so the downstream pair join still finds them
        pairs = co_movement_pairs(
            hourly.select(
                F.col("mmsi").alias("uid"),
                F.col("hour_ts").alias("window_ts"),
                F.col("h3_index").alias("cell"),
            )
        )
        ab = {
            (r["uid_a"], r["uid_b"], str(r["day_date"])): r for r in pairs.collect()
        }
        for day in ("2025-01-01", "2025-01-02"):
            r = ab[("A", "B", day)]
            assert r["hT"] == 6 and r["gto"] == pytest.approx(1.0)
    finally:
        hourly.unpersist()


def test_sql_surface_uses_h3_udf(spark, h3_stub):
    """register_sql_functions takes the pandas-UDF branch; SQL and
    DataFrame paths emit bit-identical stub-H3 addresses."""
    from knot_another_pipeline_spark.operators.rollup import build_uid_hourly_h3
    from knot_another_pipeline_spark.plans.sql_gold import run_gold_sql

    _ais_fixture(spark).createOrReplaceTempView("silver_h3_test")
    sql_hourly = run_gold_sql(spark, "silver_h3_test")["uid_hourly"]
    df_hourly = build_uid_hourly_h3(_ais_fixture(spark))
    sql_cells = {
        (r["mmsi"], r["hour_ts"]): r["h3_index"] for r in sql_hourly.collect()
    }
    df_cells = {
        (r["mmsi"], r["hour_ts"]): r["h3_index"] for r in df_hourly.collect()
    }
    assert sql_cells == df_cells
    assert all(_CELL_RE.fullmatch(c) for c in sql_cells.values())


def test_has_h3_is_live_after_late_injection(h3_stub):
    """HAS_H3 is a live probe (PEP 562 module __getattr__), not an
    import-time snapshot: it must flip to True once a vendored/addPyFile
    h3 becomes importable — the late-injection scenario the injectable
    h3_module() exists for."""
    from knot_another_pipeline_spark.functions import geo

    assert geo.HAS_H3 is True


def test_has_h3_false_when_module_missing(monkeypatch):
    from knot_another_pipeline_spark.functions import geo

    monkeypatch.setattr(geo, "h3_module", lambda: None)
    assert geo.HAS_H3 is False
    with pytest.raises(AttributeError):
        geo.NO_SUCH_ATTR


def test_fallback_warns_and_strict_raises(monkeypatch):
    """Without h3-py: one RuntimeWarning on fallback; strict=True raises."""
    from knot_another_pipeline_spark.functions import geo

    monkeypatch.setattr(geo, "h3_module", lambda: None)
    geo._warned_grid_fallback = False
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        geo.h3_cell("latitude", "longitude", 7)
        assert any(
            issubclass(w.category, RuntimeWarning)
            and "falling back" in str(w.message)
            for w in caught
        )
    with pytest.raises(ImportError):
        geo.h3_cell("latitude", "longitude", 7, strict=True)
