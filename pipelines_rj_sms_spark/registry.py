"""SQL-surface registration — use the engine from pure ``spark.sql``.

Two mechanisms (§2.12 "SQL registration"):

- **SQL UDFs** (Spark 4 ``CREATE OR REPLACE TEMPORARY FUNCTION ...
  RETURN <expr>``): each scalar engine function re-stated as a SQL
  expression body. These are analyzed inline by Catalyst — they cost the
  same as the Column-API versions (codegen, pushdown-friendly), unlike
  ``spark.udf.register`` which would demote them to Python UDFs.
- **Python UDTF** for the HTML section splitter (one row in, N section
  rows out) — the genuinely table-valued case.

After ``register_sql_functions(spark)``::

    SELECT doc_id FROM docs WHERE cpf_valid(cpf)
    SELECT clean_text(nome), quality_score(text) FROM docs
    SELECT s.* FROM docs, LATERAL html_sections(html) AS s
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_ACCENTED = "áàâãäåéèêëíìîïóòôõöúùûüçñýÁÀÂÃÄÅÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
_PLAIN = "aaaaaaeeeeiiiiooooouuuucnyAAAAAAEEEEIIIIOOOOOUUUUCNY"

_CPF_SAME = ", ".join(f"'{str(d) * 11}'" for d in range(10))


def _cpf_body() -> str:
    d = "regexp_replace(cpf, '[^0-9]', '')"

    def wsum(n: int) -> str:
        return " + ".join(
            f"try_cast(substring({d}, {i + 1}, 1) AS INT) * {n + 1 - i}"
            for i in range(n)
        )

    def dv(n: int) -> str:
        return (f"(CASE WHEN ({wsum(n)}) % 11 < 2 THEN 0 "
                f"ELSE 11 - (({wsum(n)}) % 11) END)")

    return f"""
      CASE WHEN cpf IS NULL THEN false
           WHEN length({d}) != 11 THEN false
           WHEN {d} IN ({_CPF_SAME}, '01234567890') THEN false
           ELSE {dv(9)} = try_cast(substring({d}, 10, 1) AS INT)
                AND {dv(10)} = try_cast(substring({d}, 11, 1) AS INT)
      END
    """


_SQL_FUNCTIONS: dict[str, str] = {
    "strip_accents_br": (
        "(s STRING) RETURNS STRING RETURN "
        f"translate(s, '{_ACCENTED}', '{_PLAIN}')"
    ),
    "clean_text": (
        "(s STRING) RETURNS STRING RETURN "
        f"trim(lower(translate(regexp_replace(replace(s, ' ', ' '), "
        r"'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F​-‏‪-‮﻿]', '')"
        f", '{_ACCENTED}', '{_PLAIN}')))"
    ),
    "scrub_pii": (
        "(s STRING) RETURNS STRING RETURN "
        r"regexp_replace(regexp_replace(regexp_replace(regexp_replace(s, "
        r"'[0-9]{3}\\.[0-9]{3}\\.[0-9]{3}-[0-9]{2}', '[CPF]'), "
        r"'[0-9]{3} [0-9]{4} [0-9]{4} [0-9]{4}', '[CNS]'), "
        r"'(?:\\(?[0-9]{2}\\)? ?)?[0-9]{4,5}-[0-9]{4}', '[TEL]'), "
        r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]')"
    ),
    "parse_decimal_comma": (
        "(s STRING) RETURNS DOUBLE RETURN "
        r"try_cast(regexp_replace(regexp_replace(s, '\\.', ''), ',', '.') AS DOUBLE)"
    ),
    "safe_to_date": (
        "(s STRING) RETURNS DATE RETURN "
        "coalesce(try_cast(s AS DATE), CAST(try_cast(s AS TIMESTAMP) AS DATE))"
    ),
    "parse_date_multi": (
        "(s STRING) RETURNS DATE RETURN coalesce("
        "CAST(try_to_timestamp(s, 'yyyy-MM-dd') AS DATE), "
        "CAST(try_to_timestamp(s, 'dd/MM/yyyy') AS DATE), "
        "CAST(try_to_timestamp(s) AS DATE))"
    ),
    "age_years": (
        "(birth DATE, as_of DATE) RETURNS INT RETURN "
        "year(as_of) - year(birth) - CASE WHEN (month(as_of) < month(birth)) "
        "OR (month(as_of) = month(birth) AND day(as_of) < day(birth)) "
        "THEN 1 ELSE 0 END"
    ),
    "token_count": (
        "(s STRING) RETURNS INT RETURN "
        r"size(filter(split(lower(s), '\\s+'), x -> x != ''))"
    ),
    "non_blank": (
        "(s STRING) RETURNS BOOLEAN RETURN trim(coalesce(s, '')) != ''"
    ),
    "surrogate_key3": (
        "(a STRING, b STRING, c STRING) RETURNS STRING RETURN "
        "md5(concat_ws('|', coalesce(a, ''), coalesce(b, ''), coalesce(c, '')))"
    ),
    "rolling_fingerprint": (
        "(s STRING) RETURNS BIGINT RETURN "
        r"aggregate(filter(split(lower(s), '\\s+'), x -> x != ''), "
        "CAST(0 AS BIGINT), "
        "(acc, x) -> (acc * 31 + pmod(xxhash64(x), 1000000007)) % 1000000007)"
    ),
    "hash_split_bucket": (
        "(key STRING, salt STRING) RETURNS BIGINT RETURN "
        "abs(xxhash64(coalesce(salt, ''), coalesce(key, ''))) % 100"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create the temporary SQL functions; returns registered names."""
    names = []
    for name, body in _SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
        names.append(name)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cpf_valid(cpf STRING) "
        f"RETURNS BOOLEAN RETURN {_cpf_body()}"
    )
    names.append("cpf_valid")
    return names


def register_udtfs(spark: SparkSession) -> list[str]:
    """Register the HTML section splitter as a Python UDTF (lateral-join
    table function: one document row -> N (title, body) rows)."""
    from pyspark.sql.functions import udtf

    from pipelines_rj_sms_spark.functions.html import split_sections

    @udtf(returnType="title: string, body: string")
    class HtmlSections:
        def eval(self, html: str):  # noqa: D401 — UDTF contract
            for sec in split_sections(html):
                yield sec["title"], sec["body"]

    spark.udtf.register("html_sections", HtmlSections)
    return ["html_sections"]
