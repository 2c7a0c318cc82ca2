"""Snapshot diffing (operators/diff.py)."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.diff import changed_rows, snapshot_diff


def _snaps(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged
         (2, "B", 20.0),          # changed
         (3, "c", None),          # unchanged (null-safe)
         (5, "e", 50.0)],         # inserted; 4 deleted
        "k int, s string, v double")
    return old, new


def test_snapshot_diff_classification(spark):
    old, new = _snaps(spark)
    got = {r["k"]: r["change"]
           for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "deleted", 5: "inserted"}


def test_null_vs_empty_string_differ(spark):
    old = spark.createDataFrame([(1, None)], "k int, s string")
    new = spark.createDataFrame([(1, "")], "k int, s string")
    assert snapshot_diff(old, new, ["k"]).collect()[0]["change"] == "changed"


def test_changed_rows_payload(spark):
    old, new = _snaps(spark)
    got = {(r["k"], r["s"]) for r in changed_rows(old, new, ["k"]).collect()}
    assert got == {(2, "B"), (5, "e")}
    only_changed = changed_rows(old, new, ["k"], include_inserts=False)
    assert [r["k"] for r in only_changed.collect()] == [2]


def test_diff_shuffles_hashes_not_bodies(spark):
    old, new = _snaps(spark)
    plan = snapshot_diff(old, new, ["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # the join's inputs project to (key, hash) before any exchange
    assert "xxhash64" in plan and "SortMergeJoin" in plan or "Join" in plan
