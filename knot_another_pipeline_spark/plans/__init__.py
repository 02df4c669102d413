from knot_another_pipeline_spark.plans.gold_refresh import refresh_gold  # noqa: F401
