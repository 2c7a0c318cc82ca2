from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.cleaning import (
    clean_column_name,
    clean_column_names,
    dedupe_column_names,
    parse_decimal_comma,
    scrub_control_chars,
    strip_accents,
)


def test_clean_column_name_reference_semantics():
    # accent strip + lower + non-alnum -> _ (ref utils/data_cleaning.py:11-47)
    assert clean_column_name("Município") == "municipio"
    assert clean_column_name("Data de Atualização") == "data_de_atualizacao"
    assert clean_column_name("CNES!!") == "cnes"
    assert clean_column_name("1a_coluna") == "_1a_coluna"
    assert clean_column_name("ação/reação") == "acao_reacao"
    assert clean_column_name("") == "col"
    # idempotent
    for name in ["Município", "1a_coluna", "a b c"]:
        once = clean_column_name(name)
        assert clean_column_name(once) == once


def test_dedupe_column_names():
    assert dedupe_column_names(["a", "b", "a", "a"]) == ["a", "b", "a_1", "a_2"]


def test_clean_column_names_df(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["Município", "MUNICÍPIO!", "ok"])
    assert clean_column_names(df).columns == ["municipio", "municipio_1", "ok"]


def test_strip_accents_values(spark):
    df = spark.createDataFrame([("São Gonçalo ÀÉÎÕÜ ç",)], ["s"])
    out = df.select(strip_accents("s").alias("s")).first()["s"]
    assert out == "Sao Goncalo AEIOU c"


def test_scrub_control_chars(spark):
    df = spark.createDataFrame([("a\x00b​c d",)], ["s"])
    out = df.select(scrub_control_chars("s").alias("s")).first()["s"]
    assert out == "abc d"


def test_parse_decimal_comma(spark):
    df = spark.createDataFrame([("1.234,56",), ("10,5",), ("abc",)], ["v"])
    out = [r["v"] for r in df.select(parse_decimal_comma("v").alias("v")).collect()]
    assert out[0] == 1234.56
    assert out[1] == 10.5
    assert out[2] is None
