"""Spatial discretization — the join-key trick at the heart of the reference.

The reference snaps positions to H3 resolution-7 hexagons so that
"co-located" becomes an *equi-join* on a cell string instead of a distance
predicate (``/root/reference/README.md:130``; used as the join key at
``sql/gold/create_pairs_daily.sql:51``; emitted by a Lambda-hosted scalar
UDF ``lat_lng_to_cell_address(lat, lon, 7)``,
``sql/gold/create_uid_hourly_h3.sql:24-26,61``).

Two implementations, same contract (STRING cell address; equal cells ⇔
same neighborhood):

- :func:`grid_cell` — pure built-in expression discretizer (no UDF, stays in
  whole-stage codegen, SQL-mirrorable for differential testing). This is the
  engine default: at 100 TB the cell encode runs on every row, so keeping it
  JVM-side matters more than hex-shaped cells.
- :func:`h3_cell` — true H3 via an Arrow-batched pandas UDF when ``h3-py``
  is importable (same process-boundary shape as the reference's Lambda, but
  per-batch instead of per-invocation). Falls back to :func:`grid_cell`.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def h3_module():
    """Import and return ``h3`` (h3-py), or ``None`` when unavailable.

    Resolved at *call* time, not import time, so a vendored or
    test-injected module (``sys.path`` insertion + ``sc.addPyFile``)
    is picked up without reloading this package.
    """
    try:  # optional dependency — not in the baked image
        import h3  # type: ignore

        return h3
    except Exception:
        return None


def __getattr__(name: str):
    # ``HAS_H3`` is a live probe, not an import-time snapshot: a vendored
    # or ``sc.addPyFile``-injected h3 that becomes importable after this
    # module loads must flip it to True (module-level ``__getattr__``,
    # PEP 562). Prefer calling ``h3_module()`` directly in new code.
    if name == "HAS_H3":
        return h3_module() is not None
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


_warned_grid_fallback = False

#: Approximate edge length (degrees) per "resolution", chosen so res=7 is
#: ~1.2 km like H3 res-7 (data_contracts.md:88). Each +1 res halves the cell.
_BASE_DEG = 1.4080


def _cell_size_deg(res: int) -> float:
    return _BASE_DEG / (2.0**res)


def grid_cell(lat: Column | str, lon: Column | str, res: int = 7) -> Column:
    """Deterministic lat/lon grid cell address as a 15-hex-char string.

    Matches the reference's output contract ("valid resolution-7 H3 string,
    15 hex chars", ``docs/data_contracts.md:88``) in shape: a fixed-width
    hex string whose equality means spatial co-location at ``res``.
    Built entirely from built-in expressions: floor-divide lat/lon by the
    cell size, pack the two 3-hex-digit-safe integers plus the resolution
    into a single hex literal.
    """
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    size = _cell_size_deg(res)
    # offset to non-negative so hex formatting is stable: lat+90 in [0,180],
    # lon+180 in [0,360] → cell indices < 2^20 for res ≤ 11
    lat_i = F.floor((la + F.lit(90.0)) / F.lit(size)).cast("long")
    lon_i = F.floor((lo + F.lit(180.0)) / F.lit(size)).cast("long")
    return F.concat(
        F.lpad(F.lower(F.hex(F.lit(res))), 1, "0"),
        F.lpad(F.lower(F.hex(lat_i)), 7, "0"),
        F.lpad(F.lower(F.hex(lon_i)), 7, "0"),
    )


def h3_cell(
    lat: Column | str, lon: Column | str, res: int = 7, *, strict: bool = False
) -> Column:
    """True H3 cell address when h3-py is available, else :func:`grid_cell`.

    Parity target: the reference Lambda's ``lat_lng_to_cell_address`` —
    both are standard H3, so addresses agree bit-for-bit when h3-py is
    installed. Without h3-py the square-grid fallback still satisfies the
    15-hex-char / equality-means-co-location contract, but its addresses
    will NOT join against reference-produced H3 values — so the fallback
    warns once, and ``strict=True`` raises instead of falling back.
    """
    if h3_module() is None:
        if strict:
            raise ImportError(
                "h3-py is not installed: true-H3 cell addresses are "
                "unavailable (h3_cell(strict=True)). Install h3-py or use "
                "grid_cell() explicitly."
            )
        global _warned_grid_fallback
        if not _warned_grid_fallback:
            warnings.warn(
                "h3-py not installed — h3_cell() is falling back to the "
                "square grid_cell() encoding. Cell addresses satisfy the "
                "same 15-hex-char contract but will NOT join against "
                "reference-produced H3 res-%d values." % res,
                RuntimeWarning,
                stacklevel=2,
            )
            _warned_grid_fallback = True
        return grid_cell(lat, lon, res)

    import pandas as pd  # local import: only on the UDF path
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _encode(lat_s, lon_s):
        import h3 as _h3  # worker-side import (addPyFile/vendored safe)

        out = []
        for la, lo in zip(lat_s, lon_s):
            if la is None or lo is None or pd.isna(la) or pd.isna(lo):
                out.append(None)
            else:
                out.append(_h3.latlng_to_cell(float(la), float(lo), res))
        return pd.Series(out)

    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    return _encode(la, lo)


def valid_coords(lat: Column | str, lon: Column | str) -> Column:
    """``lat BETWEEN -90 AND 90 AND lon BETWEEN -180 AND 180``
    (``create_uid_hourly_h3.sql:53-54``)."""
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    return la.between(-90.0, 90.0) & lo.between(-180.0, 180.0)


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters between two coordinate pairs
    (haversine on a spherical earth, R = 6 371 000 m) — pure codegen
    trig, shared by every distance consumer (``radius_pairs``,
    ``speed_filter``, and their DuckDB oracles, which spell the
    identical formula) so the engine has exactly ONE distance
    definition to keep oracle-bit-identical."""
    la1, la2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    return (
        F.lit(2.0 * 6371000.0)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(dlat / 2), 2)
                + F.cos(la1) * F.cos(la2) * F.pow(F.sin(dlon / 2), 2)
            )
        )
    )


def point_in_polygon(
    lat: Column | str, lon: Column | str, polygon: Column | str
) -> Column:
    """Ray-casting (crossing-number) point-in-polygon test, pure
    higher-order-function expressions — no UDF, no geo library.

    ``polygon`` is an ``array<struct<lon:double, lat:double>>`` ring;
    open (last ≠ first) — the closing edge is implied. An eastward ray
    from the point is tested against every edge: odd crossings ⇒
    inside. The arithmetic is four IEEE ops per edge spelled
    identically in the DuckDB oracle, so containment decisions are
    engine-bit-identical. Points exactly ON an edge are
    algorithm-ambiguous (standard for crossing-number); polygons that
    cross the antimeridian must be split by the caller at ±180° first
    (same band discipline as ``radius_pairs``).
    """
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    poly = F.col(polygon) if isinstance(polygon, str) else polygon
    n = F.size(poly)

    def crosses(i: Column) -> Column:
        p1 = F.element_at(poly, i + 1)
        p2 = F.element_at(
            poly, F.when(i == n - 1, F.lit(1)).otherwise(i + 2)
        )
        y1, y2 = p1["lat"], p2["lat"]
        x1, x2 = p1["lon"], p2["lon"]
        straddles = (y1 > la) != (y2 > la)
        # (y2 - y1) is nonzero whenever the edge straddles the ray
        xing = lo < (x2 - x1) * (la - y1) / (y2 - y1) + x1
        return straddles & xing

    idx = F.sequence(F.lit(0), n - 1)
    return F.size(F.filter(idx, crosses)) % 2 == 1
