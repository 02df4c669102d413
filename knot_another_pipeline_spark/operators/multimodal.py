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
    BinaryType,
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
