from pipelines_rj_sms_spark.functions import cleaning, dates, keys, jsonops, text  # noqa: F401
