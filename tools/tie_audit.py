#!/usr/bin/env python3
"""Audit every oracle query for .5e-6 rounding-tie exposure.

VERDICT r7 #1: the driver's two red queries were caused by exact
rounding ties — rationals that land EXACTLY on a k.5e-6 boundary, which
Spark's shortest-repr HALF_UP round and DuckDB's float-path round can
resolve differently. This tool strips the output-column ``round(x, 6)``
wrappers from each DuckDB oracle, re-runs it at the given SF, and flags
any row whose unrounded double sits within ``EPS`` of a .5 grid
boundary (|frac(x*1e6) - 0.5| < EPS) — the same measurement the r7
verdict used to demonstrate the logprob ties.

Usage: python tools/tie_audit.py /root/testdata/sf0.01 [NAME ...]
"""
from __future__ import annotations

import math
import os
import re
import sys

EPS = 1e-7


def strip_output_rounds(sql: str) -> tuple[str, int]:
    """Replace every ``round(<balanced>, 6)`` whose closing paren is
    followed by whitespace+AS (an output column) with the bare inner
    expression. Returns (new_sql, n_stripped)."""
    out, i, n = [], 0, 0
    low = sql.lower()
    while True:
        j = low.find("round(", i)
        if j < 0:
            out.append(sql[i:])
            break
        # find balanced close
        depth, k = 0, j + 5  # position of '('
        while k < len(sql):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        inner = sql[j + 6:k]
        after = sql[k + 1:]
        m = re.match(r"\s*AS\s", after, re.I)
        m2 = re.search(r",\s*6\s*$", inner)
        if m and m2:
            out.append(sql[i:j])
            out.append("(" + inner[:m2.start()] + ")")
            n += 1
        else:
            out.append(sql[i:k + 1])
        i = k + 1
    return "".join(out), n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import duckdb

    import __spark_entry__ as entry
    oracles = entry.oracle_sql()
    if names:
        oracles = {k: v for k, v in oracles.items() if k in names}
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{p}')")
    flagged, clean, skipped = [], 0, 0
    for name, sql in sorted(oracles.items()):
        stripped, n = strip_output_rounds(sql)
        if n == 0:
            skipped += 1
            continue
        try:
            rel = con.sql(stripped)
            cols = [c for c, t in zip(rel.columns, rel.types)
                    if str(t) in ("DOUBLE", "FLOAT")]
            if not cols:
                skipped += 1
                continue
            rows = rel.fetchall()
        except Exception as exc:  # stripped SQL no longer valid
            print(f"ERR   {name}: {str(exc).splitlines()[0][:100]}")
            continue
        idx = [rel.columns.index(c) for c in cols]
        ties = []
        for r in rows:
            for c, i in zip(cols, idx):
                v = r[i]
                if v is None or not math.isfinite(v):
                    continue
                f = abs(v) * 1e6
                d = abs(f - math.floor(f) - 0.5)
                if d < EPS:
                    ties.append((c, v, d))
        if ties:
            flagged.append((name, n, ties[:5], len(ties)))
        else:
            clean += 1
    for name, n, sample, total in flagged:
        print(f"TIE   {name}: {total} row-values within {EPS} of a "
              f".5e-6 boundary (stripped {n} rounds)")
        for c, v, d in sample:
            print(f"        {c} = {v!r} (dist {d:.2e})")
    print(f"\n{len(flagged)} flagged, {clean} clean, {skipped} skipped "
          f"(no output rounds / no double cols)")


if __name__ == "__main__":
    main()
