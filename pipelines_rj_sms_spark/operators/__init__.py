from pipelines_rj_sms_spark.operators import (  # noqa: F401
    conform,
    dedup,
    joins,
    multimodal,
    similarity,
    sketches,
    windows,
    zorder,
)
