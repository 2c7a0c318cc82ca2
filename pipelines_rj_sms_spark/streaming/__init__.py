from pipelines_rj_sms_spark.streaming import incremental  # noqa: F401
