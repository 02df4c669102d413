"""knot_another_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference lakehouse ``redhairedcelt/knot-another-pipeline``
(a medallion bronze→silver→gold pipeline for AIS vessel traffic whose
analytics ran on Amazon Athena), re-expressed as composable DataFrame
transformations on Apache Spark:

- ``session``     — SparkSession factory (UTC, AQE, dynamic partition overwrite)
- ``functions``   — scalar expression library (timestamp normalizer, geo cells,
                    stable hashing, text metrics, vector math)
- ``operators``   — relational/analytic operators (windowed rollup, co-movement
                    pairs, track export, dedup family, similarity search,
                    text analysis, data-quality checks)
- ``sources``     — ingestion (CSV/zip/zstd → partitioned silver parquet) and
                    table IO helpers
- ``plans``       — gold-layer refresh orchestration (replace/append, DQ)
- ``streaming``   — Structured Streaming variants of the batch operators

Everything is public-API PySpark; the hot path is built-in column expressions
(whole-stage-codegen'd JVM execution), with Arrow-batched pandas UDFs only
where semantics genuinely require Python (optional H3 encoding, multimodal
decode plumbing).
"""

__version__ = "0.1.0"

from knot_another_pipeline_spark.session import get_spark, tune_session  # noqa: F401
