"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline extension (BASELINE.json north star). The design
treats image/audio/video as ``binary`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
stages so each Python worker touches a whole batch, and the physical plan
keeps the binary column out of shuffles (metadata-only projections
downstream).

The actual codec libraries are not in this container, so the decode is a
clearly-marked deterministic fake (:func:`fake_decode_meta`) behind the
same Spark-side plumbing — schema, partitioning, UDF signature, and batch
shape are real and tested. A real deployment swaps ``_decode_payload``
for PIL/ffmpeg and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Decoded-metadata schema — stable contract for downstream operators.
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("fmt", StringType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
    ]
)


def _decode_payload(payload: bytes) -> dict:
    """Deterministic FAKE decode (no codec libs in this container).

    Derives pseudo-metadata from the payload bytes: real code would call
    PIL.Image.open / av.open here. Deterministic md5-based fields keep the
    whole stage differential-testable.
    """
    if payload is None:
        return {"n_bytes": None, "width": None, "height": None, "n_frames": None, "fmt": None}
    text = payload.decode("utf-8", errors="replace")
    digest = hashlib.md5(payload).hexdigest()
    n = len(text)
    return {
        "n_bytes": len(payload),
        "width": 64 + (n % 193),
        "height": 64 + (int(digest[:4], 16) % 193),
        "n_frames": 1 + (n % 7),
        "fmt": digest[:1],
    }


def decode_media_meta(df: DataFrame, *, id_col: str, payload_col: str) -> DataFrame:
    """Extract typed metadata from a binary media column via mapInPandas.

    The iterator-of-batches signature means constant memory per worker
    regardless of partition size — the 100 TB shape: payload bytes never
    leave the scan stage; only the small metadata rows shuffle.
    """
    id_name, payload_name = id_col, payload_col

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            metas = [_decode_payload(p) for p in pdf[payload_name]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "fmt": [m["fmt"] for m in metas],
                }
            )
            yield out

    return df.mapInPandas(batches, DECODE_SCHEMA)


#: Frame-sampling output schema: one row per kept frame.
FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), True),
        StructField("frame_md5", StringType(), True),
    ]
)


def sample_frames(
    df: DataFrame, *, id_col: str, payload_col: str, stride: int = 1
) -> DataFrame:
    """Video → sampled frames: binary payload in, one row per kept frame
    out (every ``stride``-th of the container's frames).

    Row-count-changing (1 → n_frames/stride), so this is the UDTF shape:
    mapInPandas emitting more rows than it consumes, with the binary
    frame column materialized only here — downstream consumers that want
    metadata alone prune it at the scan of this stage's output. A real
    deployment replaces the fake frame synthesis with ``av``/ffmpeg
    decode; the Spark plumbing (schema, batch iteration, stride
    semantics) is identical.

    FAKE frame content: ``md5(payload || '-' || frame_idx)`` digest bytes
    (deterministic, differential-testable); frame count comes from
    :func:`_decode_payload`'s ``n_frames``.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    id_name, payload_name = id_col, payload_col

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, frames, digests = [], [], [], []
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                if payload is None:
                    continue
                n_frames = _decode_payload(payload)["n_frames"]
                for i in range(0, n_frames, stride):
                    d = hashlib.md5(payload + b"-" + str(i).encode()).digest()
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(d)
                    digests.append(d.hex())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.mapInPandas(batches, FRAMES_SCHEMA)


#: Feature-extraction output schema: fixed-dim embedding per document.
FEATURES_DIM = 8
FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def extract_features(
    df: DataFrame, *, id_col: str, payload_col: str
) -> DataFrame:
    """Binary payload → fixed-dimension feature vector (``array<double>``)
    — the media half of the embedding pipeline; output plugs directly
    into the similarity operators (knn/ivf/lsh over an embedding column).

    FAKE featurizer: dimension *i* is the i-th 16-bit slice of
    ``md5(payload)`` scaled to [0, 1] — a stand-in for a CLIP/ResNet
    forward pass. Real code swaps the per-batch loop for a model call;
    the Arrow batch boundary (whole pandas batch per worker invocation)
    is exactly where batched GPU inference slots in.
    """
    id_name, payload_name = id_col, payload_col

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            vecs = []
            for payload in pdf[payload_name]:
                if payload is None:
                    vecs.append(None)
                    continue
                digest = hashlib.md5(payload).hexdigest()
                vecs.append(
                    [
                        int(digest[4 * i : 4 * i + 4], 16) / 65535.0
                        for i in range(FEATURES_DIM)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "features": pd.Series(vecs, dtype="object"),
                }
            )

    return df.mapInPandas(batches, FEATURES_SCHEMA)


#: Resize output schema: payload replaced by the resized rendition.
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def resize_media(
    df: DataFrame, *, id_col: str, payload_col: str, width: int, height: int
) -> DataFrame:
    """Image resize: binary in, binary rendition out, capped at
    ``width*height`` bytes.

    FAKE resample: truncate the payload to the target byte budget (a real
    deployment calls PIL ``Image.resize`` here). The plumbing mirrors the
    thumbnailing stage of a training-data pipeline: payload-in/payload-out
    through Arrow so renditions of a 100 TB corpus stream batch-at-a-time
    per worker with constant memory.
    """
    if width < 1 or height < 1:
        raise ValueError(f"target dims must be positive, got {width}x{height}")
    id_name, payload_name = id_col, payload_col
    budget = width * height

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            outs = [
                None if p is None else bytes(p[:budget])
                for p in pdf[payload_name]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "payload": pd.Series(outs, dtype="object"),
                    "n_bytes": pd.Series(
                        [None if o is None else len(o) for o in outs],
                        dtype="Int64",
                    ),
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


#: Audio-chunk output schema: one row per (possibly overlapping) window.
CHUNKS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", LongType(), False),
        StructField("start_byte", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("chunk", BinaryType(), True),
        StructField("chunk_md5", StringType(), True),
    ]
)


def chunk_audio(
    df: DataFrame,
    *,
    id_col: str,
    payload_col: str,
    chunk_bytes: int = 64,
    hop_bytes: int = 48,
) -> DataFrame:
    """Audio → fixed-size overlapping windows: binary payload in, one row
    per ``chunk_bytes`` window advanced by ``hop_bytes`` out (the
    speech-pipeline framing step — e.g. 30 s windows with 10 s overlap).

    Unlike the decode stages the slicing here IS the real operation (PCM
    framing is byte arithmetic); only the upstream codec decode is the
    stubbed part of this container's pipeline. Same UDTF shape as
    :func:`sample_frames`: row-expanding iterator mapInPandas, binary
    windows materialized only in this stage's output, constant memory per
    worker. A doc shorter than one hop still yields its single partial
    chunk; empty/NULL payloads yield nothing.
    """
    if chunk_bytes < 1 or hop_bytes < 1:
        raise ValueError(
            f"chunk_bytes and hop_bytes must be >= 1, got "
            f"{chunk_bytes}/{hop_bytes}"
        )
    id_name, payload_name = id_col, payload_col

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, starts, sizes, chunks, digests = [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                if payload is None or len(payload) == 0:
                    continue
                k = 0
                while k * hop_bytes < len(payload):
                    start = k * hop_bytes
                    window = bytes(payload[start : start + chunk_bytes])
                    ids.append(int(doc_id))
                    idxs.append(k)
                    starts.append(start)
                    sizes.append(len(window))
                    chunks.append(window)
                    digests.append(hashlib.md5(window).hexdigest())
                    k += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "start_byte": pd.Series(starts, dtype="int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "chunk": pd.Series(chunks, dtype="object"),
                    "chunk_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.mapInPandas(batches, CHUNKS_SCHEMA)


def _phash_schema(id_col: str) -> StructType:
    """64-bit aHash output schema: id (caller's name) + hex + halves."""
    return StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("phash", StringType(), True),
            StructField("phash_hi", LongType(), True),
            StructField("phash_lo", LongType(), True),
        ]
    )


def _fake_pixels(payload: bytes) -> list[int]:
    """Deterministic FAKE 8x8 grayscale thumbnail (no codec libs in this
    container): pixel block ``b`` is the md5 of ``payload || ':' || b``,
    two hex chars per pixel. Real code decodes + downsamples the image
    here; everything after (the aHash math) is the real algorithm."""
    pixels: list[int] = []
    for b in range(4):
        digest = hashlib.md5(payload + f":{b}".encode()).hexdigest()
        pixels.extend(int(digest[2 * j : 2 * j + 2], 16) for j in range(16))
    return pixels


def phash_media(
    df: DataFrame, *, id_col: str, payload_col: str
) -> DataFrame:
    """Perceptual hash (average-hash variant) per media payload: decode
    to an 8x8 grayscale thumbnail, threshold each pixel against the
    image mean, pack the 64 bits into a hash whose Hamming distance
    approximates visual similarity — the standard near-duplicate key
    for image corpora (re-encodes, small crops and brightness shifts
    move few bits, so dup detection joins on hash bands instead of
    comparing pixels).

    The thresholding is exact integer arithmetic (``pixel*64 > sum``)
    — no float mean, so the bit pattern reproduces bit-for-bit in any
    engine (the DuckDB oracle re-derives it in SQL). The hash ships as
    a 16-hex-char string plus two bigint halves: 32-bit halves stay
    positive in a signed 64-bit engine, so banding and XOR bit-count
    need no unsigned type anywhere.

    Scale shape: Arrow-batched iterator mapInPandas, payload bytes
    never leave the stage — only the 3 small hash columns shuffle.
    NULL payloads yield NULL hashes (kept, so row counts are stable).
    The id column keeps the caller's name in the output.
    """
    id_name, payload_name = id_col, payload_col

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            hashes, his, los = [], [], []
            for payload in pdf[payload_name]:
                if payload is None:
                    hashes.append(None)
                    his.append(None)
                    los.append(None)
                    continue
                px = _fake_pixels(payload)
                total = sum(px)
                bits = 0
                for p in px:
                    bits = (bits << 1) | (1 if p * 64 > total else 0)
                hx = f"{bits:016x}"
                hashes.append(hx)
                his.append(int(hx[:8], 16))
                los.append(int(hx[8:], 16))
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name].astype("int64"),
                    "phash": pd.Series(hashes, dtype="object"),
                    "phash_hi": pd.Series(his, dtype="Int64"),
                    "phash_lo": pd.Series(los, dtype="Int64"),
                }
            )

    return df.mapInPandas(batches, _phash_schema(id_name))


def phash_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Near-duplicate image pairs from :func:`phash_media` output:
    candidates share at least one of ``bands`` equal hex slices of the
    hash; exact Hamming distance then verifies candidates via
    ``bit_count(xor)`` codegen.

    Recall guarantee is pigeonhole: a pair within Hamming ``h`` must
    share a band only when ``h <= bands − 1`` (``h`` differing bits
    can ruin at most ``h`` bands). The defaults (4 bands, distance 3)
    keep that guarantee; asking for a larger ``max_hamming`` than the
    band count can honor raises unless ``allow_partial_recall=True``
    explicitly accepts probabilistic recall (damage spread across
    every band hides a pair). Raise ``bands`` (2/4/8/16 — the 16-hex
    hash must split evenly) for a wider guaranteed radius; narrower
    bands trade blocking power (16-bit bands ≈ N/65536 candidates per
    bucket, 4-bit bands ≈ N/16) for radius, the SimHash dial.

    Scale shape: the self-join is an equi-join on (band, value) —
    never all-pairs — and the hash table is ``bands`` rows per image
    at ~8 bytes of key, so a billion-image corpus bands into a join
    the shuffle can hash-partition evenly (md5-derived band values
    are uniform). Duplicate candidates from multi-band agreement
    collapse with one distinct on (id_a, id_b) before scoring.

    Output: id_a < id_b, hamming (bits differing, <= max_hamming).
    """
    if not 0 <= max_hamming <= 64:
        raise ValueError(f"max_hamming must be in [0, 64], got {max_hamming}")
    if bands not in (2, 4, 8, 16):
        raise ValueError(f"bands must be one of 2/4/8/16, got {bands}")
    if max_hamming > bands - 1 and not allow_partial_recall:
        raise ValueError(
            f"{bands} bands guarantee recall only up to Hamming "
            f"{bands - 1}; got max_hamming={max_hamming}. Raise bands, "
            "lower max_hamming, or pass allow_partial_recall=True to "
            "accept missed pairs whose damage touches every band."
        )
    from pyspark.sql import functions as F

    width = 16 // bands
    s = signatures.select(
        F.col(id_col).alias("id"), "phash", "phash_hi", "phash_lo"
    ).filter(F.col("phash").isNotNull())
    banded = s.select(
        "id",
        "phash_hi",
        "phash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring(
                            "phash", width * b + 1, width
                        ).alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "phash_hi", "phash_lo", "bk.band", "bk.val")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.phash_hi").alias("hi_a"),
            F.col("a.phash_lo").alias("lo_a"),
            F.col("b.phash_hi").alias("hi_b"),
            F.col("b.phash_lo").alias("lo_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    ) + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    return (
        cands.withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
