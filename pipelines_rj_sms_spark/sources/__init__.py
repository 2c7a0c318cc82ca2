from pipelines_rj_sms_spark.sources import api, files, jdbc  # noqa: F401
