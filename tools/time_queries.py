"""Min-of-N wall-clock timing of named declared queries at a given SF.

Same methodology as bench.py's headline loop (noop sink, warm view
registration outside the timed region) but for an arbitrary subset —
the before/after micro-bench used during optimization rounds.

Usage: python tools/time_queries.py [sf_dir] [-nN] <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    n = 2
    if args and args[0].startswith("/"):
        sf_dir, args = args[0], args[1:]
    else:
        sf_dir = "/root/testdata/sf0.1"
    if args and args[0].startswith("-n"):
        n, args = int(args[0][2:]), args[1:]
    names = args

    from pipelines_rj_sms_spark.session import get_spark, load_tables
    import __spark_entry__ as entry_mod

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    qs = entry_mod.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        best, runs = float("inf"), []
        for _ in range(n):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            took = time.monotonic() - t0
            runs.append(round(took, 3))
            best = min(best, took)
        out[name] = {"min": round(best, 3), "runs": runs,
                     "loadavg_1m": round(os.getloadavg()[0], 2)}
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
