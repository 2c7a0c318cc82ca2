"""Snapshot-versioned tables: time travel, rollback, conflict, vacuum."""

import pytest


def _df(spark, vals):
    return spark.createDataFrame([(v, f"r{v}") for v in vals],
                                 ["id", "s"])


def test_snapshot_append_and_time_travel(spark, tmp_path):
    from pipelines_rj_sms_spark.sinks import snapshots as sn
    p = str(tmp_path / "t")
    v1 = sn.snapshot_write(_df(spark, [1, 2]), p)
    v2 = sn.snapshot_write(_df(spark, [3]), p, mode="append")
    assert (v1, v2) == (1, 2)
    assert sorted(r["id"] for r in
                  sn.snapshot_read(spark, p).collect()) == [1, 2, 3]
    # AS OF v1: the append is invisible
    assert sorted(r["id"] for r in
                  sn.snapshot_read(spark, p, version=1).collect()) == [1, 2]


def test_snapshot_overwrite_and_rollback(spark, tmp_path):
    from pipelines_rj_sms_spark.sinks import snapshots as sn
    p = str(tmp_path / "t")
    sn.snapshot_write(_df(spark, [1, 2]), p)
    sn.snapshot_write(_df(spark, [9]), p, mode="overwrite")
    assert [r["id"] for r in sn.snapshot_read(spark, p).collect()] == [9]
    v3 = sn.snapshot_rollback(p, to_version=1)
    assert v3 == 3
    assert sorted(r["id"] for r in
                  sn.snapshot_read(spark, p).collect()) == [1, 2]
    hist = {r["version"]: r for r in
            sn.snapshot_history(spark, p).collect()}
    assert hist[3]["action"] == "rollback:1"
    assert hist[2]["action"] == "overwrite"


def test_snapshot_conflict_detected(spark, tmp_path):
    from pipelines_rj_sms_spark.sinks import snapshots as sn
    p = str(tmp_path / "t")
    sn.snapshot_write(_df(spark, [1]), p)
    # two writers that both decided on version 2: publish is
    # create-exclusive, the second loses with a clean conflict
    man = {"version": 2, "parent": 1, "action": "append",
           "files": [], "schema": "struct<id:bigint,s:string>"}
    sn._publish(p, man)
    with pytest.raises(sn.SnapshotConflictError):
        sn._publish(p, dict(man))


def test_snapshot_expire_vacuums_unreferenced_commits(spark, tmp_path):
    import os
    from pipelines_rj_sms_spark.sinks import snapshots as sn
    p = str(tmp_path / "t")
    sn.snapshot_write(_df(spark, [1]), p)                 # v1
    sn.snapshot_write(_df(spark, [2]), p, mode="overwrite")  # v2
    sn.snapshot_write(_df(spark, [3]), p, mode="append")     # v3
    out = sn.expire_snapshots(p, keep_last=2)
    assert out["dropped_versions"] == [1]
    # v1's commit dir is referenced by nothing live -> deleted
    assert len(out["deleted_dirs"]) == 1
    assert out["deleted_dirs"][0].startswith("commit-00001")
    # survivors still read fine, including time travel to v2
    assert sorted(r["id"] for r in
                  sn.snapshot_read(spark, p).collect()) == [2, 3]
    assert [r["id"] for r in
            sn.snapshot_read(spark, p, version=2).collect()] == [2]
    assert not os.path.exists(sn._manifest_path(p, 1))


def test_snapshot_reader_ignores_unpublished_commit_dirs(spark, tmp_path):
    """A data directory without a published manifest is invisible —
    the half-written-commit guarantee."""
    from pipelines_rj_sms_spark.sinks import snapshots as sn
    p = str(tmp_path / "t")
    sn.snapshot_write(_df(spark, [1]), p)
    # writer crashed after writing files, before publishing:
    _df(spark, [99]).write.parquet(f"{p}/data/commit-00002-dead")
    assert [r["id"] for r in sn.snapshot_read(spark, p).collect()] == [1]
