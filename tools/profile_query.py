"""Per-stage profile of one or more declared queries at a given SF.

Runs each query through the noop sink (guide §1.4), then reads the
completed stages from the Spark UI REST API and prints, per query, the
top stages by wall/executor time plus job and stage counts — the
empirical half of guide §1.1 without leaving the terminal.

Usage: python tools/profile_query.py [sf_dir] <query> [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    if args and args[0].startswith("/"):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args

    from pipelines_rj_sms_spark.session import get_spark, load_tables
    from pipelines_rj_sms_spark.operators.cache import release
    import __spark_entry__ as entry_mod

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    qs = entry_mod.queries()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    for name in names:
        # warm pass (scan cache + codegen), then profiled pass
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        release(df)
        before_ids = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        wall = time.monotonic() - t0
        release(df)
        spark.sparkContext.setJobDescription(None)
        new = [s for s in stages() if s["stageId"] not in before_ids]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_exec = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages, "
              f"executorRunTime {total_exec/1000:.1f}s "
              f"(x{total_exec/1000/max(wall,1e-9):.1f} cores)")
        for s in new[:14]:
            subt = (s.get("submissionTime") or "")[11:23]
            print(f"  stage {s['stageId']:>4} run={s['executorRunTime']/1000:7.2f}s "
                  f"tasks={s['numCompleteTasks']:>3} "
                  f"in={s.get('inputBytes', 0):>10} "
                  f"sh_r={s.get('shuffleReadBytes', 0):>9} "
                  f"sh_w={s.get('shuffleWriteBytes', 0):>9} "
                  f"t={subt} {s['name'].split()[0][:40]}")
    spark.stop()


if __name__ == "__main__":
    main()
