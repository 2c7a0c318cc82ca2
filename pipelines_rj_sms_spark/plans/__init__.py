from pipelines_rj_sms_spark.plans import runner  # noqa: F401
