"""Deterministic hashing: bucket ids, fingerprints, 64-bit content hashes.

The reference's silver layer is hash-bucketed by vessel id with
``int(sha256(str(mmsi)).hexdigest()[:16], 16) % num_buckets``
(``/root/reference/pipelines/ais_pipeline.py:517-518,532-535``), a layout
contract consumers rely on (``docs/data_contracts.md:44`` — stable across
runs). :func:`stable_bucket` reproduces it bit-exactly with built-in
expressions (sha2 → first 16 hex chars → unsigned 64-bit decimal via conv →
pmod), no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def stable_bucket(col: Column | str, num_buckets: int = 96) -> Column:
    """Bit-exact port of the reference ``_stable_hash``: sha256 of the
    string value, first 64 bits as an unsigned int, mod ``num_buckets``.

    ``conv(hex, 16, 10)`` yields an unsigned decimal *string* (up to
    2^64-1); going through decimal(20,0) avoids signed-long overflow before
    the modulo.
    """
    h16 = F.substring(F.sha2(_c(col).cast("string"), 256), 1, 16)
    as_dec = F.conv(h16, 16, 10).cast("decimal(20,0)")
    return F.pmod(as_dec, F.lit(num_buckets)).cast("int")


def hash64(col: Column | str, seed: int | Column = 0) -> Column:
    """Deterministic signed 60-bit hash of a string (+optional seed),
    built from md5 so it is reproducible in any engine with md5()
    (our DuckDB differential oracle included). 15 hex chars = 60 bits,
    always fits a signed BIGINT."""
    seed_c = F.lit(seed) if isinstance(seed, int) else seed
    payload = F.concat(seed_c.cast("string"), F.lit(":"), _c(col).cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def hash_hex(col: Column | str, seed: int | Column = 0, width: int = 15) -> Column:
    """Fixed-width lowercase hex hash string of ``seed:value``.

    Because the width is fixed, *lexicographic* order equals numeric
    order — so ``min(hash_hex(...))`` is a valid min-hash in any engine
    with md5(), no base conversion needed (DuckDB oracle parity)."""
    seed_c = F.lit(seed) if isinstance(seed, int) else seed
    payload = F.concat(seed_c.cast("string"), F.lit(":"), _c(col).cast("string"))
    return F.substring(F.md5(payload), 1, width)


def content_fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace/punct-normalized lowercase
    text. Equal fingerprints ⇔ textually-identical-after-normalization
    documents (exact-dedup key)."""
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(_c(col)), r"[^\p{L}\p{N}\s]", " "),
            r"\s+",
            " ",
        )
    )
    return F.md5(normalized)


def _spread_bits_21(col: Column) -> Column:
    """Spread the low 21 bits of a nonnegative long so consecutive bits
    land 3 apart (the classic magic-mask dilation) — building block for
    Morton/Z-order keys. Pure bitwise codegen, no UDF."""
    x = col.bitwiseAND(F.lit(0x1FFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 32))).bitwiseAND(F.lit(0x1F00000000FFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 16))).bitwiseAND(F.lit(0x1F0000FF0000FF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x100F00F00F00F00F))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x10C30C30C30C30C3))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x1249249249249249))
    return x


def morton_key(
    a: Column | str, b: Column | str, c: Column | str | None = None
) -> Column:
    """Z-order (Morton) key interleaving the low 21 bits of two or three
    nonnegative integer columns — sort/partition data by this key and
    every dimension clusters simultaneously, so min/max row-group stats
    prune scans on ANY of them (the data-layout trick behind
    Delta/Iceberg ``ZORDER BY``, here as a plain expression usable with
    ``compact_parquet(sort_cols=['zkey'])``). Three dimensions is the
    spatio-temporal sweet spot: cell-x, cell-y, time-bucket.

    The bit dilation places consecutive bits 3 apart, so the same
    spread serves both arities (the 2-D key is the 3-D key with the
    third plane zero — ordering is identical to a dense 2-D interleave,
    only the key values are sparser). Inputs outside [0, 2^21) wrap via
    bit masking — rank- or bucket-normalize first (e.g.
    ``F.floor(rank/width)``) for monotone dimensions. Bit-exact in any
    engine with shifts/and/or.
    """

    def _long(x: Column | str) -> Column:
        return _c(x).cast("long") if isinstance(x, str) else x.cast("long")

    key = _spread_bits_21(_long(a)).bitwiseOR(
        F.shiftleft(_spread_bits_21(_long(b)), 1)
    )
    if c is not None:
        key = key.bitwiseOR(F.shiftleft(_spread_bits_21(_long(c)), 2))
    return key


def hilbert_key(
    df,
    *,
    x_col: str,
    y_col: str,
    out_col: str = "hkey",
    order: int = 16,
):
    """Hilbert-curve clustering key over two nonnegative integer
    dimensions — the stronger-locality alternative to
    :func:`morton_key` for ``compact_parquet(sort_cols=[...])``
    layouts: consecutive keys are ALWAYS grid-adjacent (no Z-order
    jumps across the quadrant seam), so a range of keys covers a
    tighter spatial blob and min/max row-group pruning discards more
    of the file for box queries on either dimension.

    The classic per-bit walk (``order`` rounds of quadrant selection
    + rotate/flip) is inherently sequential in the rotated (x, y)
    state, so it cannot be one closed-form expression; instead each
    round is a chained PROJECTION over integer CASE/shift arithmetic
    — still pure whole-stage-codegen (no UDF, no shuffle, no state),
    linear in ``order`` because each select materializes the round's
    (x, y, d) columns rather than inlining them exponentially.
    A DuckDB oracle replays the identical rounds as chained CTEs.

    Inputs wrap into ``[0, 2^order)`` via masking (same contract as
    ``morton_key`` — rank/bucket-normalize monotone dimensions
    first).  The key fits a signed long for ``order`` ≤ 31.

    Returns ``df`` plus ``out_col``; input order of columns is
    preserved, temp columns dropped.
    """
    if not (1 <= order <= 31):
        raise ValueError(f"order must be in [1, 31], got {order}")
    mask = (1 << order) - 1
    cur = df.select(
        "*",
        _c(x_col).cast("long").bitwiseAND(F.lit(mask)).alias("_hx"),
        _c(y_col).cast("long").bitwiseAND(F.lit(mask)).alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    keep = [c for c in cur.columns if c not in ("_hx", "_hy", "_hd")]
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("_hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), i).bitwiseAND(F.lit(1))
        quad = (
            F.when((rx == 1) & (ry == 1), 2)
            .when(rx == 1, 3)
            .when(ry == 1, 1)
            .otherwise(0)
        ).cast("long")
        x_flip = F.when(
            rx == 1, F.lit(s - 1) - F.col("_hx")
        ).otherwise(F.col("_hx"))
        y_flip = F.when(
            rx == 1, F.lit(s - 1) - F.col("_hy")
        ).otherwise(F.col("_hy"))
        cur = cur.select(
            *keep,
            F.when(ry == 0, y_flip).otherwise(F.col("_hx")).alias("_hx"),
            F.when(ry == 0, x_flip).otherwise(F.col("_hy")).alias("_hy"),
            (F.col("_hd") + F.lit(s * s) * quad).alias("_hd"),
        )
    return cur.select(*keep, F.col("_hd").alias(out_col))
