"""File-listing sources — metadata scans + latest-file-per-key (S11/S12).

The reference lists GCS blobs by prefix/suffix and filters on the blob
`updated` window (pipelines/utils/tasks.py:1212-1245 — S11), and picks the
most recent file per (cnes, date) parsed out of the filename
(pipelines/datalake/migrate/gcs_to_cloudsql/tasks.py:15-63,
gal_gcs/tasks.py:19-40, prontuario_gcs/tasks.py:378-414 — S12).

Spark-side this is the `binaryFile` reader: its schema is
(path, modificationTime, length, content) and the reader prunes the
`content` column when unselected, so a metadata-only listing never reads
file bodies — the listing of a million objects is a driver+catalog
operation, not a data scan. Latest-per-key is the W1 window (row_number
over parsed key ordered by parsed date desc).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def list_files(spark: SparkSession, path_glob: str,
               suffix: str | None = None,
               updated_after: datetime | None = None,
               updated_before: datetime | None = None) -> DataFrame:
    """S11: (path, modificationTime, length) listing with time filters.

    `content` is never selected, so the scan is metadata-only.
    """
    df = (
        spark.read.format("binaryFile").load(path_glob)
        .select("path", "modificationTime", "length")
    )
    if suffix:
        df = df.filter(F.col("path").endswith(suffix))
    if updated_after is not None:
        df = df.filter(F.col("modificationTime") > F.lit(updated_after))
    if updated_before is not None:
        df = df.filter(F.col("modificationTime") < F.lit(updated_before))
    return df


def latest_per_key_from_filename(
    files: DataFrame,
    key_pattern: str,
    date_pattern: str,
    date_format: str = "yyyy-MM-dd",
) -> DataFrame:
    """S12/W1: parse (key, date) from each filename, keep the newest file
    per key. Regex groups: ``key_pattern`` / ``date_pattern`` each capture
    group 1 from the path.

    Deterministic: ties on parsed date break by path desc, so re-listing
    the same bucket always selects the same file.
    """
    parsed = (
        files.withColumn("file_key", F.regexp_extract("path", key_pattern, 1))
        .withColumn(
            "file_date",
            F.to_date(F.regexp_extract("path", date_pattern, 1), date_format),
        )
        .filter((F.col("file_key") != "") & F.col("file_date").isNotNull())
    )
    w = Window.partitionBy("file_key").orderBy(
        F.col("file_date").desc(), F.col("path").desc()
    )
    return (
        parsed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
