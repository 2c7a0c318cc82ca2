from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.geo import geohash, geohash_sql_expr


def test_geohash_known_values(spark):
    # canonical published examples
    df = spark.createDataFrame(
        [(57.64911, 10.40744), (-22.9068, -43.1729)], ["lat", "lon"])
    out = [r["gh"] for r in df.select(
        geohash("lat", "lon", 9).alias("gh")).orderBy("gh").collect()]
    assert "u4pruydqq" in out          # Wikipedia's geohash example
    assert any(g.startswith("75cm") for g in out)  # Rio de Janeiro


def test_geohash_prefix_nesting(spark):
    df = spark.createDataFrame([(48.8583, 2.2945)], ["lat", "lon"])
    row = df.select(
        geohash("lat", "lon", 4).alias("g4"),
        geohash("lat", "lon", 8).alias("g8")).collect()[0]
    assert row["g8"].startswith(row["g4"])


def test_geohash_no_python_udf_in_plan(spark):
    df = spark.createDataFrame([(1.0, 2.0)], ["lat", "lon"])
    plan = df.select(geohash("lat", "lon", 6).alias("g")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_geohash_spark_duckdb_parity(spark):
    import duckdb
    rows = [(i, -23.0 + (i * 37 % 1000) / 1000.0 * 0.4,
             -43.5 + (i * 61 % 1000) / 1000.0 * 0.4)
            for i in range(1, 200)]
    df = spark.createDataFrame(rows, ["k", "lat", "lon"])
    got = {r["k"]: r["g"] for r in df.select(
        "k", geohash("lat", "lon", 7).alias("g")).collect()}
    expr = geohash_sql_expr("lat", "lon", 7)
    duck = duckdb.sql(
        "SELECT k, " + expr + " AS g FROM (SELECT unnest(range(1, 200)) "
        "AS k, -23.0 + (k * 37 % 1000) / 1000.0 * 0.4 AS lat, "
        "-43.5 + (k * 61 % 1000) / 1000.0 * 0.4 AS lon)").fetchall()
    assert {k: g for k, g in duck} == got
