"""canonical_per_cluster: best-copy-per-cluster selection semantics."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.dedup import canonical_per_cluster


def test_canonical_picks_highest_score_then_lowest_id(spark):
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        ["node", "component"])
    scored = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (5, 0.7), (6, 0.7)],
        ["doc_id", "quality"])
    out = canonical_per_cluster(comp, scored, "doc_id", "quality")
    got = {r["component"]: (r["doc_id"], r["quality"])
           for r in out.collect()}
    assert got == {
        1: (2, 0.9),   # 2 beats 3 on id at equal score, beats 1 on score
        4: (4, 0.5),   # singleton survives
        5: (5, 0.7),   # tie -> lowest id
    }


def test_canonical_constant_score_degrades_to_min_id(spark):
    comp = spark.createDataFrame(
        [(7, 7), (9, 7), (8, 7)], ["node", "component"])
    scored = comp.select(F.col("node").alias("doc_id"),
                         F.lit(1.0).alias("q"))
    out = canonical_per_cluster(comp, scored, "doc_id", "q")
    assert [(r["component"], r["doc_id"]) for r in out.collect()] == [(7, 7)]


def test_canonical_plan_single_window_no_python(spark):
    comp = spark.createDataFrame([(1, 1), (2, 1)], ["node", "component"])
    scored = spark.createDataFrame([(1, 0.1), (2, 0.2)], ["doc_id", "q"])
    plan = canonical_per_cluster(comp, scored, "doc_id", "q") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # the rank()=1 filter is pushed below the sort as a group-limit, so
    # each partition keeps only its winner before the full window sort
    assert "WindowGroupLimit" in plan

