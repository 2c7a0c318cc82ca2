"""Tests: salted join equivalence + bucketed tables remove the exchange."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.skew import (
    read_bucketed,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    # heavy key 'hot' (90% of probe rows) + unique build keys
    probe = spark.createDataFrame(
        [(("hot" if i % 10 else f"k{i}"), i) for i in range(1000)], "k string, v long"
    )
    build = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"B{i}") for i in range(0, 1000, 10)],
        "k string, label string",
    )
    plain = probe.join(build, "k", "inner")
    salted = salted_join(probe, build, "k", salt=4)
    assert salted.count() == plain.count()
    a = {(r["k"], r["v"], r["label"]) for r in plain.collect()}
    b = {(r["k"], r["v"], r["label"]) for r in salted.collect()}
    assert a == b
    # left join keeps unmatched probe rows exactly once
    probe2 = probe.union(spark.createDataFrame([("nomatch", -1)], "k string, v long"))
    left = salted_join(probe2, build, "k", salt=4, how="left")
    assert left.filter("k = 'nomatch'").count() == 1


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    for t in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a crashed prior run can leave the managed location behind after
        # the catalog entry is gone — remove it or saveAsTable refuses
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    orders = spark.range(1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("flag"))
    items = spark.range(5000).select(
        (F.col("id") % 1000).alias("o_key"), F.col("id").alias("item"))
    write_bucketed(orders, "bkt_orders", "o_key", n_buckets=8)
    write_bucketed(items, "bkt_lineitem", "o_key", n_buckets=8)

    # merge hint: at toy scale the dim fits a broadcast, which planned
    # BroadcastHashJoin with "Bucketed: false (disabled by query
    # planner)" — making the old no-Exchange assert VACUOUS (a
    # broadcast join never has a hashpartitioning exchange). At 100 TB
    # (two fact tables) SMJ is what the planner picks on its own; the
    # hint pins that case so the assert exercises the bucketed path.
    joined = read_bucketed(spark, "bkt_orders").hint("merge").join(
        read_bucketed(spark, "bkt_lineitem").hint("merge"), "o_key")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # both sides bucketed on the key with equal bucket counts:
    # the join needs no shuffle exchange — and no sort either
    # (buckets are written pre-sorted)
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert joined.count() == 5000

    # same-key aggregation also rides the bucket layout shuffle-free
    agg = read_bucketed(spark, "bkt_lineitem").groupBy("o_key").count()
    assert "Exchange" not in (
        agg._jdf.queryExecution().executedPlan().toString())

    # correctness: identical to the plain (shuffled) join
    plain = orders.join(items, "o_key")
    assert (sorted(map(tuple, joined.collect()))
            == sorted(map(tuple, plain.collect())))

    # mismatched bucket counts can't co-locate — Spark falls back to
    # shuffling a side, and results stay right
    spark.sql("DROP TABLE IF EXISTS bkt_o4")
    loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    import shutil as _sh
    _sh.rmtree(f"{loc}/bkt_o4", ignore_errors=True)
    write_bucketed(orders, "bkt_o4", "o_key", n_buckets=4)
    mixed = read_bucketed(spark, "bkt_orders").join(
        read_bucketed(spark, "bkt_o4"), "o_key")
    assert mixed.count() == 1000


def test_key_skew_report_finds_hot_key(spark):
    from pyspark.sql import functions as F

    from pipelines_rj_sms_spark.operators.skew import key_skew_report
    df = spark.range(1000).select(
        F.when(F.col("id") < 600, F.lit(7))
        .otherwise(F.col("id")).alias("k"))
    rows = key_skew_report(df, ["k"], top_n=3).collect()
    top = rows[0]
    assert top["k"] == 7 and top["cnt"] == 600 and top["rank"] == 1
    assert abs(top["share"] - 0.6) < 1e-9
    assert top["x_mean"] > 100        # 600 rows vs ~2.5 mean group size
    assert rows[1]["cnt"] == 1 and rows[1]["cum_share"] > 0.6


def test_key_skew_report_plan_uses_take_ordered(spark):
    from pyspark.sql import functions as F

    from pipelines_rj_sms_spark.operators.skew import key_skew_report
    df = spark.range(1000).select((F.col("id") % 50).alias("k"))
    plan = key_skew_report(df, ["k"], top_n=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
