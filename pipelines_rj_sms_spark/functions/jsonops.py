"""JSON raw-zone semantics (C13/C14 in SURVEY.md §2.8).

The reference's raw zone stores rows as JSON blobs with audit columns
({cnes, data, loaded_at, base_type} — prontuario_gcs/tasks.py:509-545,
extract_gdb/utils.py:167-232 jsonify_dataframe), parsed downstream with
JSON_VALUE (monitoramento_hci/tasks.py:38). Spark-side these are
to_json(struct(*)) / from_json / get_json_object — all JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def jsonify_rows(df: DataFrame, keep: list[str] | None = None,
                 json_col: str = "data") -> DataFrame:
    """Pack all non-kept columns into one JSON string column (C13).

    Single-pass ``to_json(struct(...))`` — the reference does this with a
    pandas row-apply + index join (extract_gdb/utils.py:226-232); here it
    is one narrow projection, no join, no shuffle.
    """
    keep = keep or []
    packed = [c for c in df.columns if c not in keep]
    return df.select(
        *[F.col(c) for c in keep],
        F.to_json(F.struct(*[F.col(c) for c in packed])).alias(json_col),
    )


def json_value(col: Column | str, path: str) -> Column:
    """C14: BigQuery JSON_VALUE equivalent (always a string or null)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def parse_json_blobs(df: DataFrame, json_col: str, schema: StructType | str,
                     prefix: str = "") -> DataFrame:
    """Explode a JSON-blob column into typed top-level columns, optionally
    prefixing nested names (the reference's `paciente_nome` flattening,
    cientificalab_api/tasks.py:100-200).
    """
    parsed = df.withColumn("_parsed", F.from_json(F.col(json_col), schema))
    inner_fields = parsed.schema["_parsed"].dataType.names
    keep = [c for c in df.columns if c != json_col]
    cols = [F.col(c) for c in keep] + [
        F.col(f"_parsed.{f}").alias(f"{prefix}{f}") for f in inner_fields
    ]
    return parsed.select(*cols)


def infer_json_schema(df: DataFrame, json_col: str,
                      sample_rows: int = 1000) -> StructType:
    """Schema inference for a JSON-blob column from a bounded driver
    sample: Spark's own JSON reader merges the sampled blobs' shapes
    (the same machinery `spark.read.json` uses), so heterogeneous
    payloads union into one nullable schema. The sample is
    ``limit(sample_rows)`` — bounded driver work regardless of table
    size; fields absent from the sample parse as null downstream
    (raise the sample for long-tailed payloads, or store the inferred
    schema in the job config once curated — the reference pins its
    payload shapes in config the same way).
    """
    spark = df.sparkSession
    blobs = (df.select(json_col).filter(F.col(json_col).isNotNull())
             .limit(sample_rows))
    sampled = spark.createDataFrame(blobs.collect(), blobs.schema)
    return spark.read.json(
        sampled.rdd.map(lambda r: r[0])).schema


def autoflatten_json(df: DataFrame, json_col: str, prefix: str = "",
                     sample_rows: int = 1000) -> DataFrame:
    """`parse_json_blobs` without a hand-written schema: infer from a
    bounded sample, then flatten — the "just give me the columns"
    ingestion path for semi-structured feeds."""
    schema = infer_json_schema(df, json_col, sample_rows)
    return parse_json_blobs(df, json_col, schema, prefix)
