"""JDBC read path e2e against embedded Derby (ships in Spark's jars).

Round-1 gap: S1-S5 readers were plan-construction-tested only. Derby's
embedded driver gives a real JDBC endpoint inside the test JVM — the
write seeds a table through Spark's JDBC sink, then read_table /
read_window exercise the partitioned scan and the pushed-down BETWEEN
against a live connection (reference: relational_db/tasks.py:13-35,
smsrio_mysql/tasks.py:17-52).
"""

from datetime import datetime

import pytest

from pipelines_rj_sms_spark.sources.jdbc import (
    JdbcSource,
    read_table,
    read_window,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db_dir};create=true"
    rows = [
        (i, f"name_{i}", datetime(2024, 1, 1 + i % 28, i % 24, 0, 0))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, name string, ts timestamp")
    (df.write.format("jdbc")
     .option("url", url).option("driver", DRIVER)
     .option("dbtable", "people").mode("overwrite").save())
    return url


def test_read_table_full_scan(spark, derby):
    src = JdbcSource(url=derby, table="people", driver=DRIVER)
    df = read_table(spark, src)
    assert df.count() == 200
    assert set(c.lower() for c in df.columns) == {"id", "name", "ts"}


def test_read_table_partitioned_scan(spark, derby):
    src = JdbcSource(url=derby, table="people", driver=DRIVER,
                     partition_column="id", num_partitions=4)
    df = read_table(spark, src, lower=0, upper=199)
    # the partitioned reader issues numPartitions range queries
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
    assert df.agg({"id": "min"}).collect()[0][0] == 0


def test_read_window_pushes_between(spark, derby):
    src = JdbcSource(url=derby, table="people", driver=DRIVER)
    # Spark's JDBC writer creates quoted lowercase identifiers; the
    # caller supplies the dialect-correct column spelling
    df = read_window(spark, src, '"ts"',
                     datetime(2024, 1, 1), datetime(2024, 1, 7, 23, 59, 59))
    got = df.count()
    expected = sum(1 for i in range(200)
                   if datetime(2024, 1, 1 + i % 28, i % 24, 0, 0)
                   <= datetime(2024, 1, 7, 23, 59, 59))
    assert got == expected > 0
    # the BETWEEN lives in the source query (scan relation), not a
    # Spark-side Filter operator node
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert " Filter (" not in plan
    assert "JDBCRelation" in plan
