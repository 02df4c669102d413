from knot_another_pipeline_spark.streaming.rollup_stream import (  # noqa: F401
    streaming_windowed_rollup,
)
