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


def test_merge_history_equals_full_recompute(spark):
    """Incremental merge of a later batch must equal compressing the
    whole log at once — including run merges across the boundary."""
    import random
    rng = random.Random(3)
    log = []
    for k in range(12):
        t = 0
        for i in range(rng.randint(1, 20)):
            t += rng.randint(1, 3)
            log.append((k, dt.datetime(2024, 1, 1) + dt.timedelta(hours=t),
                        rng.choice("AB"), len(log)))
    log.sort(key=lambda r: r[1])
    cut = int(len(log) * 0.7)
    head = [r for i, r in enumerate(log) if i < cut]
    tail = [r for i, r in enumerate(log) if i >= cut]
    # keep the append-only contract per key: move any tail row that
    # predates its key's head max into head
    head_max = {}
    for r in head:
        head_max[r[0]] = max(head_max.get(r[0], r[1]), r[1])
    really_tail = [r for r in tail if r[1] >= head_max.get(r[0], r[1])]
    head += [r for r in tail if r not in really_tail]

    schema = "k bigint, ts timestamp, state string, obs_id bigint"
    full = spark.createDataFrame(head + really_tail, schema)
    hist = compress_history(
        spark.createDataFrame(head, schema), "k", "ts", "state", "obs_id")
    from pipelines_rj_sms_spark.operators.scd import merge_history
    merged = merge_history(
        hist, spark.createDataFrame(really_tail, schema),
        "k", "ts", "state", "obs_id")
    want = {tuple(r) for r in compress_history(
        full, "k", "ts", "state", "obs_id").collect()}
    got = {tuple(r) for r in merged.collect()}
    assert got == want


def test_merge_history_untouched_keys_pass_through(spark):
    hist = compress_history(_log(spark), "k", "ts", "state", "obs_id")
    batch = spark.createDataFrame(
        [(1, _ts(9), "Z", 99)],
        "k bigint, ts timestamp, state string, obs_id bigint")
    from pipelines_rj_sms_spark.operators.scd import merge_history
    out = merge_history(hist, batch, "k", "ts", "state", "obs_id")
    got = {(r.k, r.state, r.valid_from, r.valid_to, r.n_obs)
           for r in out.collect()}
    # key 1 gains a Z run and its old tail closes; keys 2/3 unchanged
    assert (1, "Z", _ts(9), None, 1) in got
    assert (1, "A", _ts(4), _ts(9), 1) in got
    assert (2, "X", _ts(5), None, 1) in got
    assert (3, "C", _ts(3), None, 1) in got
