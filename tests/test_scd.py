"""SCD2 history compression (operators/scd.py)."""

import datetime as dt

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.scd import compress_history, state_at


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _log(spark):
    rows = [
        # key 1: A A B A  -> three runs
        (1, _ts(1), "A", 1),
        (1, _ts(2), "A", 2),
        (1, _ts(3), "B", 3),
        (1, _ts(4), "A", 4),
        # key 2: single observation
        (2, _ts(5), "X", 5),
        # key 3: null state handling — null,null,C -> two runs
        (3, _ts(1), None, 6),
        (3, _ts(2), None, 7),
        (3, _ts(3), "C", 8),
    ]
    return spark.createDataFrame(
        rows, "k bigint, ts timestamp, state string, obs_id bigint")


def test_compress_history_runs(spark):
    out = compress_history(_log(spark), "k", "ts", "state", "obs_id")
    got = {(r.k, r.state, r.valid_from, r.valid_to, r.n_obs, r.is_current)
           for r in out.collect()}
    assert got == {
        (1, "A", _ts(1), _ts(3), 2, False),
        (1, "B", _ts(3), _ts(4), 1, False),
        (1, "A", _ts(4), None, 1, True),
        (2, "X", _ts(5), None, 1, True),
        (3, None, _ts(1), _ts(3), 2, False),
        (3, "C", _ts(3), None, 1, True),
    }


def test_compress_history_multi_state_and_point_lookup(spark):
    df = _log(spark).withColumn("extra", F.lit("z"))
    out = compress_history(df, "k", "ts", ["state", "extra"], "obs_id")
    assert out.filter("k = 1").count() == 3  # extra constant: same runs

    hist = compress_history(_log(spark), "k", "ts", "state", "obs_id")
    at = state_at(hist, _ts(3, 30))
    got = {(r.k, r.state) for r in at.collect()}
    # at 03:30 key1 is in its B run, key3 in C, key2 not yet born
    assert got == {(1, "B"), (3, "C")}


def test_compress_history_single_exchange(spark):
    out = compress_history(_log(spark), "k", "ts", "state", "obs_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
