"""Distributed prefix-sum / index / shift helpers must agree exactly
with the single-partition window forms they replace (operators/ids.py:
the rank/ECDF scale-cliff fix, VERDICT r6 #2)."""
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.cache import release
from pipelines_rj_sms_spark.operators.ids import (global_cumsum,
                                                  global_shift,
                                                  with_global_index)


@pytest.fixture()
def support(spark):
    # collapsed distinct-value support with two count columns,
    # deliberately unsorted and skewed
    rows = [(v * 7 % 101, v % 5 + 1, (v * 3) % 4) for v in range(101)]
    return spark.createDataFrame(rows, "v long, ca long, cb long")


def test_global_cumsum_matches_window(spark, support):
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    exp = {r["v"]: (r["a"], r["b"]) for r in support.select(
        "v", F.sum("ca").over(w).alias("a"),
        F.sum("cb").over(w).alias("b")).collect()}
    out = global_cumsum(support.repartition(8), ["v"], ["ca", "cb"])
    got = {r["v"]: (r["_cum_ca"], r["_cum_cb"]) for r in out.collect()}
    release(out)
    assert got == exp


def test_with_global_index_matches_row_number(spark, support):
    exp = {r["v"]: r["i"] for r in support.select(
        "v", F.row_number().over(Window.orderBy("v")).alias("i"))
        .collect()}
    out = with_global_index(support.repartition(8), ["v"])
    got = {r["v"]: r["_gidx"] for r in out.collect()}
    release(out)
    assert got == exp


def test_global_shift_lead_and_lag(spark, support):
    wo = Window.orderBy("v")
    exp = {r["v"]: (r["ld"], r["lg"]) for r in support.select(
        "v", F.lead("ca").over(wo).alias("ld"),
        F.lag("ca").over(wo).alias("lg")).collect()}
    led = global_shift(support.repartition(8), ["v"], ["ca"], offset=1)
    lag = global_shift(support.repartition(8), ["v"], ["ca"], offset=-1)
    got_ld = {r["v"]: r["_lead_ca"] for r in led.collect()}
    got_lg = {r["v"]: r["_lag_ca"] for r in lag.collect()}
    release(led)
    release(lag)
    assert got_ld == {k: v[0] for k, v in exp.items()}
    assert got_lg == {k: v[1] for k, v in exp.items()}


def test_global_cumsum_plan_has_no_singlepartition(spark, support):
    out = global_cumsum(support.repartition(8), ["v"], ["ca"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    release(out)
    assert "SinglePartition" not in plan


def test_global_running_last_matches_window(spark):
    from pipelines_rj_sms_spark.operators.ids import global_running_last
    rows = [(i, None if i % 3 else f"v{i}") for i in range(57)]
    df = spark.createDataFrame(rows, "k long, x string").repartition(7)
    w = (Window.orderBy("k")
         .rowsBetween(Window.unboundedPreceding, 0))
    exp = {r["k"]: r["y"] for r in df.select(
        "k", F.last("x", ignorenulls=True).over(w).alias("y")).collect()}
    out = global_running_last(df, ["k"], "x", "y")
    got = {r["k"]: r["y"] for r in out.collect()}
    release(out)
    assert got == exp


def test_operators_plan_no_singlepartition(spark):
    """The converted rank/ECDF operators must not plan a
    SinglePartition exchange on a many-distinct-value input
    (VERDICT r6 #2 'Done' criterion)."""
    from pipelines_rj_sms_spark.operators.classify import binary_auc
    from pipelines_rj_sms_spark.quality.stats import (ks_two_sample,
                                                      mann_whitney_u)

    df = spark.range(20000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        (F.col("id") * 37 % 19997).cast("double").alias("v"),
        (F.col("id") % 3 == 0).cast("int").alias("y"))
    # a global one-row aggregate legitimately ends SinglePartition
    # (after map-side partial agg it moves K partial rows); the
    # scale-killer is a Window or Sort CONSUMING a SinglePartition
    # exchange — the whole input funnels through one task. Walk the
    # indent tree: the consumer of an exchange is the nearest
    # preceding line with smaller indent.
    def single_partition_window_consumers(plan):
        lines = plan.splitlines()
        bad = []
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            ind = len(ln) - len(ln.lstrip())
            for j in range(i - 1, -1, -1):
                pind = len(lines[j]) - len(lines[j].lstrip())
                if pind < ind and lines[j].strip():
                    parent = lines[j].lstrip(" +-:*")
                    # "Sort [" only — SortAggregate(key=[]) is the
                    # legitimate one-row global agg
                    if parent.startswith(("Window ", "Sort [",
                                          "WindowGroupLimit")):
                        bad.append(parent[:80])
                    break
        return bad

    for out in (ks_two_sample(df, "g", "v", "a", "b"),
                mann_whitney_u(df, "g", "v", "a", "b"),
                binary_auc(df, "v", "y")):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert not single_partition_window_consumers(plan), plan[:2000]
