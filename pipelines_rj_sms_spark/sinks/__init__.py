from pipelines_rj_sms_spark.sinks import jdbc_upsert, lakehouse  # noqa: F401
