"""Local t2-mimic: run every queries() entry on Spark and its oracle_sql()
on DuckDB at a given sf, compare through *pandas* exactly like the driver
does — row count, column names, per-column pandas dtype kind, and exact
value rendering (no float rounding forgiveness).

Why pandas: the r7/r8 driver reds (doc_{uni,bi}gram_logprob) were invisible
to a fetchall()-based comparison because DuckDB sum(BIGINT) returns HUGEINT,
which pandas materializes as float64 (100.0) while Spark returns int64
(100) — bit-identical values, different pandas rendering, split hash.
Fetching both sides through pandas (sdf.toPandas() / con.execute(...).df())
makes that class of mismatch, plus unhashable array columns (the r8
winnow_fingerprint_sets ERR), visible locally before the driver sees them.

Usage: python tools/verify_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _kind(series) -> str:
    """Collapse a pandas Series to a dtype-kind tag the driver's
    canonicalizer would distinguish: 'i' (integer), 'f' (float),
    'b' (bool), 's' (string), 'M' (timestamp), 'D' (date),
    'dec' (Decimal objects), 'bytes', 'ARRAY' (unhashable — driver ERR),
    '?' (all-null)."""
    import numpy as np

    k = series.dtype.kind
    if k in "iu":
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    if k == "M":
        return "M"
    # object dtype: classify from the first non-null value
    for v in series:
        if v is None:
            continue
        if isinstance(v, float) and math.isnan(v):
            continue
        if isinstance(v, (list, tuple, dict, set, np.ndarray)):
            return "ARRAY"
        if isinstance(v, bool):
            return "b"
        if isinstance(v, (int, np.integer)):
            return "i"
        if isinstance(v, (float, np.floating)):
            return "f"
        if isinstance(v, decimal.Decimal):
            return "dec"
        if isinstance(v, datetime.datetime):
            return "M"
        if isinstance(v, datetime.date):
            return "D"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, str):
            return "s"
        return type(v).__name__
    return "?"


def _cell(v) -> str:
    """Render one pandas cell the way the driver's hash would see it:
    ints and floats render differently (100 vs 100.0), no rounding.

    Driver-proven equivalences (queries green in CORRECTNESS_r08 that
    would otherwise diff here): NULL is one token whether it arrives as
    None, NaN, or NaT; a DATE equals the midnight TIMESTAMP DuckDB's
    .df() turns it into."""
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (list, tuple, set, dict, np.ndarray)):
        # unhashable in the driver's sort_values — flagged via _kind;
        # render deterministically so value diffs still print
        return "ARRAY:" + repr(list(v) if not isinstance(v, dict) else v)
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "∅" if math.isnan(f) else repr(f)
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, datetime.datetime):  # covers pd.Timestamp
        if (v.hour == v.minute == v.second == 0
                and getattr(v, "microsecond", 0) == 0
                and getattr(v, "nanosecond", 0) == 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    try:
        import pandas as pd
        if v is pd.NaT:
            return "∅"
    except Exception:
        pass
    return str(v)


def _canon(df):
    """(sorted col names, {col: kind}, sorted rendered rows)."""
    cols = sorted(df.columns)
    kinds = {c: _kind(df[c]) for c in cols}
    rows = sorted(
        tuple(_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return cols, kinds, rows


# Kind pairs that render identically in pandas and are therefore NOT a
# driver hash risk (e.g. Spark datetime64[ns] vs DuckDB datetime64[us]).
_COMPAT = {("M", "M"), ("D", "D"), ("D", "M")}


def _kinds_compatible(ks: str, kd: str) -> bool:
    if ks == kd:
        return True
    return (ks, kd) in _COMPAT or (kd, ks) in _COMPAT


def run_sweep(spark, sf_dir: str, only: set[str] | None = None,
              verbose: bool = True):
    """Run every queries() entry vs its oracle; return
    (n_pass, n_fail, n_rows_only, failures: list[str]). Reusable from
    pytest with an existing session — the driver's t2 gate in-process.
    """
    import duckdb

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []

    def say(msg: str) -> None:
        if verbose:
            print(msg)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(f"{name}: spark error: {exc}")
            say(f"FAIL  {failures[-1]}")
            n_fail += 1
            continue
        scols, skinds, srows = _canon(spdf)
        arr_cols = [c for c, k in skinds.items() if k == "ARRAY"]
        if name not in oracles:
            if arr_cols:
                failures.append(
                    f"{name}: array-valued column(s) {arr_cols} — the "
                    "driver's pandas canonicalizer cannot sort these")
                say(f"FAIL  {failures[-1]}")
                n_fail += 1
            else:
                say(f"ROWS  {name}: rows={len(srows)} (no oracle)")
                n_rows_only += 1
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append(f"{name}: duckdb error: {exc}")
            say(f"FAIL  {failures[-1]}")
            n_fail += 1
            continue
        dcols, dkinds, drows = _canon(dpdf)
        problems = []
        if arr_cols:
            problems.append(f"array-valued column(s) {arr_cols} break the "
                            "driver's pandas canonicalizer")
        if scols != dcols:
            problems.append(f"cols spark={scols} duck={dcols}")
        else:
            bad = [f"{c}: spark={skinds[c]} duck={dkinds[c]}"
                   for c in scols
                   if not _kinds_compatible(skinds[c], dkinds[c])]
            if bad:
                problems.append("dtype-kind mismatch (driver hash splits "
                                "on pandas rendering): " + "; ".join(bad))
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems and srows != drows:
            diffs = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            failures.append(f"{name}: " + "; ".join(problems))
            say(f"FAIL  {failures[-1]}")
            n_fail += 1
        else:
            say(f"PASS  {name} ({len(srows)} rows)")
            n_pass += 1
    con.close()
    return n_pass, n_fail, n_rows_only, failures


def main() -> None:
    from pipelines_rj_sms_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("verify-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    n_pass, n_fail, n_rows_only, _failures = run_sweep(spark, sf_dir, only)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
