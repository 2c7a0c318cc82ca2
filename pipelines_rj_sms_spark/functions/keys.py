"""Surrogate keys + Brazilian-document validation.

Parity targets:
- deterministic surrogate keys (UUID5 of pipe-joined natural key):
  pipelines/datalake/extract_load/cientificalab_api/tasks.py:131-188 (C15)
- operator_key concat: pipelines/utils/progress.py:22-38 (C16)
- CPF check-digit validation: pipelines/utils/validation.py:10-23 (C12)

The md5/sha2 surrogate keys are pure expressions. Exact-UUID5 parity needs
Python's uuid5 (namespace hashing) — provided as a vectorized pandas UDF,
used only when byte-level parity with the reference keys matters.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def surrogate_key(*cols: Column | str, sep: str = "|") -> Column:
    """md5 of pipe-joined natural key — the engine's default stable key.

    JVM-side, codegen'd; null components become '' (concat_ws skips nulls,
    so we coalesce explicitly to keep null != absent distinct).
    """
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.md5(F.concat_ws(sep, *parts))


def operator_key(**kwargs: str) -> str:
    """C16: sorted kwargs joined by '.' — resumable fan-out identity."""
    return ".".join(f"{k}={kwargs[k]}" for k in sorted(kwargs))


def uuid5_key():
    """Exact UUID5 (DNS namespace) of an already-joined natural key string.

    Returned as a factory (pandas_udf registration needs a live session,
    so the decorator can't run at import time).
    """

    @pandas_udf("string")
    def _uuid5(joined: pd.Series) -> pd.Series:
        ns = uuid.NAMESPACE_DNS
        return joined.map(lambda s: str(uuid.uuid5(ns, s)) if s is not None else None)

    return _uuid5


def cpf_is_valid(col: Column | str) -> Column:
    """C12: CPF check-digit validation as a pure Column expression.

    A CPF is 11 digits; digit 10 = mod-11 check over digits 1-9 with
    weights 10..2, digit 11 = mod-11 over digits 1-10 with weights 11..2;
    all-same-digit numbers are invalid. Expression-only (no UDF) so it
    runs inside codegen over billions of rows.
    """
    c = F.col(col) if isinstance(col, str) else col
    d = F.regexp_replace(c.cast("string"), r"[^0-9]", "")

    def digit(s: Column, n_digits: int) -> Column:
        # weighted sum of the first n_digits chars, weights n_digits+1 .. 2
        # (try_cast: out-of-range substrings on short inputs yield null,
        # which the ok_len guard then resolves to false — ANSI-safe)
        total = None
        for i in range(n_digits):
            term = F.substring(s, i + 1, 1).try_cast("int") * F.lit(n_digits + 1 - i)
            total = term if total is None else total + term
        rem = total % 11
        return F.when(rem < 2, F.lit(0)).otherwise(F.lit(11) - rem)

    # all-same-digit numbers pass the check-digit math but are fakes, and
    # 01234567890 is the classic sequential fake that also happens to be
    # check-digit-valid (the reference's validate_docbr blacklists both)
    blacklisted = d.rlike(r"^(\d)\1{10}$") | (d == "01234567890")
    ok_len = F.length(d) == 11
    dv1 = digit(d, 9) == F.substring(d, 10, 1).try_cast("int")
    dv2 = digit(d, 10) == F.substring(d, 11, 1).try_cast("int")
    return ok_len & ~blacklisted & dv1 & dv2


def cns_is_valid(col: Column | str) -> Column:
    """CNS (Cartão Nacional de Saúde) validation as a pure Column
    expression — the companion to cpf_is_valid for this domain (the
    reference's patient tables carry `cns` keys everywhere, e.g.
    smsrio tb_cns_provisorios / bq_to_subpav upserts).

    Public algorithm: a CNS is 15 digits whose weighted sum
    Σ digit[i] * (15 - i) is divisible by 11; definitive numbers start
    with 1/2, provisional ones with 7/8/9. Expression-only, so it runs
    inside codegen over billions of rows like the CPF check.
    """
    c = F.col(col) if isinstance(col, str) else col
    d = F.regexp_replace(c.cast("string"), r"[^0-9]", "")
    total = None
    for i in range(15):
        term = F.substring(d, i + 1, 1).try_cast("int") * F.lit(15 - i)
        total = term if total is None else total + term
    ok_len = F.length(d) == 15
    first = F.substring(d, 1, 1)
    ok_first = first.isin("1", "2", "7", "8", "9")
    return ok_len & ok_first & (total % 11 == 0)
