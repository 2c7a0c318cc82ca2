"""Local t2-mimic: run every queries() entry on Spark and its oracle_sql()
on DuckDB at a given sf, compare row count + column names + sorted values.

Usage: python tools/verify_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows; render floats via repr."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(round(v, 9))
        return str(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def run_sweep(spark, sf_dir: str, only: set[str] | None = None,
              verbose: bool = True):
    """Run every queries() entry vs its oracle; return
    (n_pass, n_fail, n_rows_only, failures: list[str]). Reusable from
    pytest with an existing session — the driver's t2 gate in-process.
    """
    import duckdb

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
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
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(f"{name}: spark error: {exc}")
            say(f"FAIL  {failures[-1]}")
            n_fail += 1
            continue
        if name not in oracles:
            say(f"ROWS  {name}: rows={len(srows)} (no oracle)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append(f"{name}: duckdb error: {exc}")
            say(f"FAIL  {failures[-1]}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sn = normalize(srows, scols)
            dn = normalize(drows, dcols)
            if sn != dn:
                diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
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
