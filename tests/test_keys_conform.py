import uuid

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.keys import (
    cpf_is_valid,
    operator_key,
    surrogate_key,
    uuid5_key,
)
from pipelines_rj_sms_spark.operators.conform import (
    add_audit_columns,
    conform,
    ensure_columns,
    non_blank,
    safe_cast_columns,
    stringify,
    with_date_partitions,
)


def test_cpf_validation(spark):
    # 52998224725 / 11144477735 are classic valid check-digit CPFs;
    # 01234567890 is the reference's known-bad literal (validation.py:20)
    df = spark.createDataFrame(
        [("52998224725",), ("111.444.777-35",), ("01234567890",),
         ("11111111111",), ("123",), (None,)],
        ["cpf"],
    )
    out = [r["ok"] for r in df.select(cpf_is_valid("cpf").alias("ok")).collect()]
    assert out == [True, True, False, False, False, None]


def test_surrogate_key_stable(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, None)], ["x", "y"])
    out = [r["sk"] for r in df.select(surrogate_key("x", "y").alias("sk")).collect()]
    assert out[0] == out[1]
    assert out[0] != out[2]
    assert all(len(s) == 32 for s in out)


def test_operator_key_sorted():
    assert operator_key(b="2", a="1") == "a=1.b=2"


def test_uuid5_parity(spark):
    df = spark.createDataFrame([("AP32|2024-01-01",)], ["k"])
    out = df.select(uuid5_key()(F.col("k")).alias("u")).first()["u"]
    assert out == str(uuid.uuid5(uuid.NAMESPACE_DNS, "AP32|2024-01-01"))


def test_stringify_and_audit(spark):
    df = spark.createDataFrame([(1, 2.5)], ["a", "b"])
    out = conform(df, source="test")
    assert dict(out.dtypes)["a"] == "string"
    assert "_loaded_at" in out.columns and "_source" in out.columns


def test_ensure_columns(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    out = ensure_columns(df, {"a": "bigint", "b": "string"}, fill=None)
    assert out.columns == ["a", "b"]
    assert out.first()["b"] is None


def test_with_date_partitions(spark):
    df = spark.createDataFrame([("2024-03-05 10:00:00",)], ["ts"]).select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    row = with_date_partitions(df, "ts").first()
    assert (row["ano_particao"], row["mes_particao"], str(row["data_particao"])) == (
        2024, 3, "2024-03-05",
    )


def test_safe_cast_columns(spark):
    df = spark.createDataFrame([("12", "x")], ["a", "b"])
    out = safe_cast_columns(df, {"a": "int", "b": "int"}).first()
    assert out["a"] == 12 and out["b"] is None


def test_non_blank(spark):
    df = spark.createDataFrame([("  ",), ("x",), (None,)], ["v"])
    assert df.filter(non_blank("v")).count() == 1


def test_cns_is_valid(spark):
    """Definitive CNS numbers built by the public check-digit recipe
    pass; perturbations, bad first digits, and short inputs fail."""
    from pipelines_rj_sms_spark.functions.keys import cns_is_valid

    def make(pis11):
        s = sum(int(pis11[i]) * (15 - i) for i in range(11))
        dv = 11 - (s % 11)
        if dv == 11:
            dv = 0
        if dv == 10:
            s2 = s + 2
            dv = 11 - (s2 % 11)
            return pis11 + "001" + str(dv)
        return pis11 + "000" + str(dv)

    good = [make(p) for p in ["12345678901", "20394857612", "29283746502"]]
    bad = [good[0][:14] + str((int(good[0][14]) + 1) % 10),  # flip dv
           "3" + good[1][1:],                                # bad first digit
           "123", "", good[2] + "9"]
    df = spark.createDataFrame([(s,) for s in good + bad], ["cns"])
    got = [r["ok"] for r in
           df.select(cns_is_valid("cns").alias("ok")).collect()]
    assert got == [True] * 3 + [False] * 5
