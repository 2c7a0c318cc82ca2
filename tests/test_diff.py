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


def test_apply_changes_upsert_delete_roundtrip(spark):
    from pipelines_rj_sms_spark.operators.diff import apply_changes
    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"])
    changes = spark.createDataFrame(
        [(2, "b2", 21, "U", 5), (3, "c", 30, "D", 5),
         (4, "d", 40, "I", 5),
         # key 5: inserted then deleted later -> absent
         (5, "e", 50, "I", 1), (5, "e", 50, "D", 2),
         # key 1: two updates, last wins
         (1, "a1", 11, "U", 1), (1, "a2", 12, "U", 2)],
        ["k", "name", "v", "op", "ts"])
    out = {r["k"]: (r["name"], r["v"])
           for r in apply_changes(snap, changes, ["k"],
                                  order_col="ts").collect()}
    assert out == {1: ("a2", 12), 2: ("b2", 21), 4: ("d", 40)}


def test_apply_changes_same_ts_delete_wins(spark):
    from pipelines_rj_sms_spark.operators.diff import apply_changes
    snap = spark.createDataFrame([(1, 1)], ["k", "v"])
    changes = spark.createDataFrame(
        [(1, 9, "U", 7), (1, 9, "D", 7)], ["k", "v", "op", "ts"])
    assert apply_changes(snap, changes, ["k"]).count() == 0


def test_apply_changes_diff_inverse(spark):
    """snapshot_diff(old, new) fed back through apply_changes
    reconstructs new exactly."""
    from pipelines_rj_sms_spark.operators.diff import (
        apply_changes, snapshot_diff)
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "val"])
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], ["k", "val"])
    d = snapshot_diff(old, new, ["k"], compare_cols=["val"]) \
        .filter("change <> 'unchanged'")
    # diff emits change inserted/deleted/changed; translate to ops
    from pyspark.sql import functions as F
    changes = (d.join(new, ["k"], "left")
               .select("k",
                       F.coalesce("val", F.lit("")).alias("val"),
                       F.when(F.col("change") == "deleted",
                              F.lit("D")).otherwise(F.lit("U"))
                       .alias("op"),
                       F.lit(1).alias("ts")))
    got = {(r["k"], r["val"])
           for r in apply_changes(old, changes, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (4, "d")}
