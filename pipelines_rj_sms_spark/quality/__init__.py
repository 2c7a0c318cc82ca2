from pipelines_rj_sms_spark.quality import checks  # noqa: F401
