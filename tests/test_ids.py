"""dense_global_ids: zipWithIndex semantics without the single-partition
window."""

import os

import pytest
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.cache import release
from pipelines_rj_sms_spark.operators.ids import dense_global_ids

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


def test_ids_match_global_row_number(spark):
    from pipelines_rj_sms_spark.session import read_parquet_normalized
    orders = read_parquet_normalized(
        spark, os.path.join(SF_DIR, "orders.parquet")
    ).select("o_orderkey")
    out = dense_global_ids(orders, ["o_orderkey"], num_partitions=8)
    got = {r["o_orderkey"]: r["row_id"] for r in out.collect()}
    keys = sorted(got)
    assert [got[k] for k in keys] == list(range(len(keys)))
    release(out)


def test_ids_dense_and_unique_on_skewed_partitions(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(997)], ["k"])
    out = dense_global_ids(df, ["k"], num_partitions=13)
    ids = [r["row_id"] for r in out.orderBy("k").collect()]
    assert ids == list(range(997))
    release(out)


def test_ids_plan_has_no_single_partition_window(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    out = dense_global_ids(df, ["k"], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scale cliff this operator avoids: a global-order window
    # (Exchange SinglePartition feeding a Window)
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan
    release(out)
