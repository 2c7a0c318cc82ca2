"""SQL-surface registration: SQL UDFs stay expression-level and agree
with the Column-API implementations; the HTML UDTF lateral-joins."""

import pytest

from pipelines_rj_sms_spark.registry import register_sql_functions, register_udtfs


@pytest.fixture(scope="module")
def registered(spark):
    register_sql_functions(spark)
    register_udtfs(spark)
    return spark


def test_sql_functions_agree_with_column_api(registered):
    spark = registered
    row = spark.sql("""
        SELECT clean_text('  Ação MÉDICA  ') AS ct,
               parse_decimal_comma('1.234,56') AS dec,
               parse_decimal_comma('abc') AS bad,
               safe_to_date('2024-01-02 10:00:00') AS d1,
               parse_date_multi('15/02/2024') AS d2,
               age_years(DATE '2000-03-10', DATE '2024-03-09') AS age1,
               age_years(DATE '2000-03-10', DATE '2024-03-10') AS age2,
               token_count('  a b   c ') AS ntok,
               non_blank('   ') AS nb,
               surrogate_key3('1', NULL, 'x') AS sk,
               cpf_valid('529.982.247-25') AS cpf_ok,
               cpf_valid('52998224724') AS cpf_bad,
               cpf_valid('11111111111') AS cpf_same,
               cpf_valid('01234567890') AS cpf_seq
    """).first()
    assert row["ct"] == "acao medica"
    assert row["dec"] == 1234.56 and row["bad"] is None
    assert str(row["d1"]) == "2024-01-02" and str(row["d2"]) == "2024-02-15"
    assert row["age1"] == 23 and row["age2"] == 24  # birthday boundary
    assert row["ntok"] == 3
    assert row["nb"] is False
    assert len(row["sk"]) == 32
    assert row["cpf_ok"] is True
    assert row["cpf_bad"] is False and row["cpf_same"] is False
    assert row["cpf_seq"] is False


def test_sql_functions_match_engine_columns(registered):
    # same inputs through SQL UDF and Column API must agree exactly
    from pyspark.sql import functions as F

    from pipelines_rj_sms_spark.functions.keys import cpf_is_valid

    spark = registered
    df = spark.createDataFrame(
        [(str(10**10 + i * 7919),) for i in range(200)], "cpf string")
    df.createOrReplaceTempView("cpfs")
    via_sql = {r["cpf"]: r["ok"] for r in
               spark.sql("SELECT cpf, cpf_valid(cpf) AS ok FROM cpfs").collect()}
    via_col = {r["cpf"]: r["ok"] for r in
               df.select("cpf", cpf_is_valid("cpf").alias("ok")).collect()}
    assert via_sql == via_col


def test_html_sections_udtf_lateral(registered):
    spark = registered
    spark.createDataFrame(
        [(1, "<p>intro</p><h1>T</h1><p>body</p>")], "id long, html string"
    ).createOrReplaceTempView("pages")
    rows = spark.sql("""
        SELECT p.id, s.title, s.body
        FROM pages p, LATERAL html_sections(p.html) AS s
    """).collect()
    assert [(r["title"], r["body"]) for r in rows] == [("", "intro"), ("T", "body")]


def test_sql_udf_stays_expression_level(registered):
    # the plan for a SQL-UDF filter must NOT contain a Python eval node
    spark = registered
    df = spark.range(100).selectExpr("CAST(id AS STRING) AS s")
    df.createOrReplaceTempView("nums")
    plan = spark.sql(
        "SELECT * FROM nums WHERE non_blank(s)"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

def test_sql_rolling_fingerprint_matches_column_api(registered):
    from pipelines_rj_sms_spark.functions.text import rolling_fingerprint

    spark = registered
    df = spark.createDataFrame(
        [("the quick brown fox",), ("",), ("one",)], ["text"])
    df.createOrReplaceTempView("rf_docs")
    via_sql = [r[0] for r in
               spark.sql("SELECT rolling_fingerprint(text) FROM rf_docs").collect()]
    via_col = [r[0] for r in
               df.select(rolling_fingerprint("text")).collect()]
    assert via_sql == via_col


def test_sql_hash_split_bucket_matches_column_api(registered):
    from pipelines_rj_sms_spark.functions.sampling import hash_split

    spark = registered
    df = spark.range(200).selectExpr("CAST(id AS STRING) AS k")
    df.createOrReplaceTempView("hs_keys")
    via_sql = {r["k"]: r["b"] for r in spark.sql(
        "SELECT k, hash_split_bucket(k, 's') AS b FROM hs_keys").collect()}
    via_col = {r["k"]: ("train" if via_sql[r["k"]] < 80 else "test") == r["split"]
               for r in hash_split(df, ["k"], salt="s").collect()}
    assert all(via_col.values())


def test_sql_scrub_pii_matches_column_api(spark):
    from pipelines_rj_sms_spark.functions.privacy import scrub_pii
    from pipelines_rj_sms_spark.registry import register_sql_functions

    register_sql_functions(spark)
    df = spark.createDataFrame(
        [("CPF 123.456.789-01 tel (21) 99876-5432 a@b.com",)], ["t"])
    df.createOrReplaceTempView("_pii_t")
    via_sql = spark.sql("SELECT scrub_pii(t) AS s FROM _pii_t").collect()[0].s
    via_col = df.select(scrub_pii("t").alias("s")).collect()[0].s
    assert via_sql == via_col == "CPF [CPF] tel [TEL] [EMAIL]"


def test_autoflatten_json_infers_merged_schema(spark):
    """Heterogeneous payloads union into one nullable schema; typed
    columns come out without any hand-written schema."""
    from pipelines_rj_sms_spark.functions.jsonops import (
        autoflatten_json, infer_json_schema)
    df = spark.createDataFrame(
        [(1, '{"a": 1, "b": "x"}'),
         (2, '{"a": 2, "c": 3.5}'),
         (3, None)],
        "id int, payload string")
    schema = infer_json_schema(df, "payload")
    assert {f.name for f in schema.fields} == {"a", "b", "c"}
    out = {r["id"]: (r["p_a"], r["p_b"], r["p_c"])
           for r in autoflatten_json(df, "payload", "p_").collect()}
    assert out[1] == (1, "x", None)
    assert out[2] == (2, None, 3.5)
    assert out[3] == (None, None, None)
