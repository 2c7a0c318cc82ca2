"""pipelines_rj_sms_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the data-processing capabilities of the
reference ETL codebase (prefeitura-rio/pipelines_rj_sms, surveyed in
SURVEY.md) as an idiomatic Spark engine:

    sources -> conform -> transform (DataFrame/SQL) -> quality -> sinks

plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) that a 100 TB lakehouse needs.

Everything here is built on the public Apache Spark DataFrame/SQL API.
"""

from pipelines_rj_sms_spark.session import get_spark, ENGINE_DEFAULTS

__all__ = ["get_spark", "ENGINE_DEFAULTS"]
__version__ = "0.1.0"
