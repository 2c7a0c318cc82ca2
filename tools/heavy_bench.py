"""Heavy-tier scaling bench: the top data-bound queries at ~sf1.

The headline bench (bench.py, sf0.1) cannot demonstrate parallel
scaling — 70/71 queries run at the same wall on 8 cores as on 32
because at that SF wall is driver/planning latency, not data work
(PERF_r12 scaling block). This tool times the ~10 heaviest data-bound
query paths against the Kx heavy dataset (tools/heavy_gen.py) so an
8-vs-32-core ratio measures the ENGINE's parallelism, converting
"scale-safe at 100 TB" from plan arithmetic into a measured curve.

Honors the same driver contract as bench.py: core count from
$SPARK_GRAFT_CPUS (master local[$SPARK_GRAFT_CPUS]), data directory
from $SPARK_GRAFT_HEAVY_DIR (default /root/heavydata/sf1), one JSON
line on stdout. Methodology: per query, one warm pass at sf0.01
(codegen/JIT + scan-cache warmup at toy scale — NOT the measured
data), then ONE timed pass through the noop sink at heavy scale with
every operator-persisted intermediate released afterwards, so each
measurement computes its full pipeline from parquet. Single-pass
because a min-of-2 at this scale would serve persist-heavy pass 2
from cache and hide exactly the data work this tool exists to see.

Usage: python tools/heavy_bench.py [query ...]   (default: all HEAVY)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "supplier_cooccurrence_triangles",
    "part_graph_kcore",
    "part_link_prediction",
    "part_copurchase_communities",
    "pagerank_part_supplier",
    "resolved_document_entities",
    "doc_containment_pairs",
    "doc_kn_trigram_logprob",
    "logreg_quality_scores",
    "kmeans_embedding_clusters",
]


def main() -> None:
    # Cluster-posture reduce parallelism (documented methodology): the
    # heavy tier exists to measure DATA-bound scaling, and AQE can only
    # coalesce the initial partition number down, never split it up —
    # with the local 32 default a ~12 GB exchange lands on 32 reduce
    # tasks sharing one heap (spill, 1.8x slower). 512 is the
    # production posture session.py documents for data-sized
    # exchanges; AQE coalesces small exchanges back to ~core count.
    os.environ.setdefault("SPARK_GRAFT_INITIAL_PARTITIONS", "512")
    from pipelines_rj_sms_spark.session import get_spark, load_tables
    from pipelines_rj_sms_spark.operators.cache import release, release_all
    import __spark_entry__ as entry_mod

    heavy_dir = os.environ.get("SPARK_GRAFT_HEAVY_DIR",
                               "/root/heavydata/sf1")
    if not os.path.isdir(heavy_dir):
        sys.exit(f"heavy dataset missing: {heavy_dir} "
                 f"(run tools/heavy_gen.py first)")
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or HEAVY

    spark = get_spark("heavy-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    warm_dir = "/root/testdata/sf0.01"
    if os.path.isdir(warm_dir):
        for name in names:
            df = qs[name](spark, warm_dir)
            df.write.mode("overwrite").format("noop").save()
            release(df)
        release_all()

    load_tables(spark, heavy_dir)
    timings: dict[str, float] = {}
    query_loadavg: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"heavy:{name}")
        t0 = time.monotonic()
        df = qs[name](spark, heavy_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.monotonic() - t0, 3)
        query_loadavg[name] = round(os.getloadavg()[0], 2)
        release(df)
        release_all()  # cold start for the next query, bounded memory
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "metric": "heavy-tier wall clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0),
        "heavy_dir": heavy_dir,
        "loadavg": list(os.getloadavg()),
        "query_loadavg_1m": query_loadavg,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
