"""Capture .explain("formatted") output for named queries into
plans/r12/<query>_<tag>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> [sf_dir] <query> [query ...]
       python tools/capture_plans.py before /root/testdata/sf0.1 part_graph_kcore

Plan shape is SF-independent for these queries (AQE runtime choices
aside); sf defaults to sf0.1 to match the headline bench inputs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = [a for a in sys.argv[1:] if a]
    tag = args[0]
    if args[1].startswith("/"):
        sf_dir, names = args[1], args[2:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args[1:]

    from pipelines_rj_sms_spark.session import get_spark, load_tables
    import __spark_entry__ as entry_mod

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    qs = entry_mod.queries()
    out_dir = "/root/repo/plans/r12"
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
