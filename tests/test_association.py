from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.analytics import association_rules


def _baskets(spark):
    rows = [
        (1, "bread"), (1, "butter"), (1, "milk"),
        (2, "bread"), (2, "butter"),
        (3, "bread"), (3, "milk"),
        (4, "beer"),
        (5, "bread"), (5, "butter"), (5, "beer"),
    ]
    return spark.createDataFrame(rows, ["basket", "item"])


def test_association_rules_hand_computed(spark):
    out = association_rules(_baskets(spark), "basket", "item",
                            min_pair_count=2)
    got = {(r["item_a"], r["item_b"]): r.asDict() for r in out.collect()}
    bb = got[("bread", "butter")]
    # bread+butter in baskets 1,2,5 of 5 total; bread in 4, butter in 3
    assert bb["pair_count"] == 3
    assert abs(bb["support"] - 3 / 5) < 1e-9
    assert abs(bb["conf_a_to_b"] - 3 / 4) < 1e-9
    assert abs(bb["conf_b_to_a"] - 3 / 3) < 1e-9
    assert abs(bb["lift"] - (3 * 5) / (4 * 3)) < 1e-9
    # below min_pair_count: bread+beer co-occur once only
    assert ("beer", "bread") not in got


def test_association_rules_duplicate_lines_count_once(spark):
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = association_rules(df, "basket", "item", min_pair_count=1)
    r = out.collect()
    assert len(r) == 1 and r[0]["pair_count"] == 2


def test_association_rules_basket_cap_drops_from_denominators(spark):
    small = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    jumbo = [(9, f"i{k}") for k in range(20)] + [(9, "a"), (9, "b")]
    df = spark.createDataFrame(small + jumbo, ["basket", "item"])
    out = association_rules(df, "basket", "item", min_pair_count=1,
                            max_items_per_basket=10)
    got = {(r["item_a"], r["item_b"]): r.asDict() for r in out.collect()}
    ab = got[("a", "b")]
    # jumbo basket excluded everywhere: 2 pairs over 2 baskets
    assert ab["pair_count"] == 2
    assert abs(ab["support"] - 1.0) < 1e-9
    assert abs(ab["lift"] - 2 * 2 / (2 * 2)) < 1e-9


def test_association_rules_no_cartesian_in_plan(spark):
    plan = association_rules(
        _baskets(spark), "basket", "item"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan
