"""Deterministic heavy-tier dataset: K disjoint shifted copies of sf0.1.

The sf0.1 bench cannot see parallelism — 70/71 headline queries run at
the same wall on 8 cores as on 32 because every query is <=2.6 s and
dominated by driver/planning latency (PERF_r12 scaling block). This
tool synthesizes an ~sf1 dataset so the heavy-tier bench
(tools/heavy_bench.py) can measure a real 8-vs-32-core scaling curve.

Construction: each table is the union of K copies of its sf0.1
original with every key column shifted by ``copy * STRIDE`` — the
copies are DISJOINT in every key space (orders, parts, suppliers,
customers, users, docs, vectors), so data volume grows Kx while graph
density, group sizes and join fan-outs stay exactly those of sf0.1.
That is the honest scale-up for a scaling measurement: the work grows
linearly with K and is embarrassingly parallel across copies, so a
failure to speed up with more cores indicts the engine, not the data.

Text and embeddings are additionally perturbed per copy so copies do
not alias each other in content space (which would manufacture
cross-copy near-duplicate clusters no real 10x corpus has):

- documents.text: every whitespace token of copy k>0 gets an
  alphanumeric PREFIX ``q<k>`` (survives any tokenizer unsplit), so
  each copy has its own disjoint vocabulary; within-copy duplicate /
  n-gram structure is preserved verbatim. n_chars is recomputed.
  A prefix, not a suffix: blocking-style operators key on text
  PREFIXES (resolve_entities blocks on substring(text,1,4)), and a
  suffix tag left all K copies in the SAME blocks — the blocked pair
  enumeration then grew K^2, a cross-copy near-duplicate explosion no
  real 10x corpus has (measured: the sf1 scoring stage ran >15 min
  before this fix, ~linear after it).
- embeddings.embedding: copy k adds k/1024 to every component — far
  above float-epsilon, far below inter-cluster distances.

Everything derives from the input bytes plus the constant k — no RNG,
no timestamps — so regeneration is bit-stable and artifacts computed
against the fixture compare across rounds.

Usage: python tools/heavy_gen.py [out_dir] [K]
       (defaults /root/heavydata/sf1 and K=10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 10_000_000  # keeps all shifted ids < 2^31 for K <= 200

# key columns shifted per copy, and output file count per table
_SHIFTS: dict[str, tuple[list[str], int]] = {
    "region": ([], 1),
    "nation": ([], 1),
    "customer": (["c_custkey"], 4),
    "supplier": (["s_suppkey"], 1),
    "part": (["p_partkey"], 2),
    "orders": (["o_orderkey", "o_custkey"], 8),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 48),
    "events": (["event_id", "user_id"], 16),
    "documents": (["doc_id"], 16),
    "embeddings": (["vec_id"], 4),
}


def generate(src_dir: str, out_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F
    from pipelines_rj_sms_spark.session import (
        get_spark, read_parquet_normalized)

    spark = get_spark("heavy-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    for name, (keys, n_files) in _SHIFTS.items():
        base = read_parquet_normalized(
            spark, os.path.join(src_dir, f"{name}.parquet"))
        if not keys:  # tiny dimension tables: single copy
            out = base
        else:
            legs = []
            for k in range(copies):
                leg = base
                for col in keys:
                    leg = leg.withColumn(
                        col, F.col(col) + F.lit(k * STRIDE))
                if name == "documents" and k > 0:
                    leg = leg.withColumn(
                        "text",
                        F.array_join(
                            F.transform(F.split("text", " "),
                                        lambda x: F.concat(
                                            F.lit(f"q{k}"), x)),
                            " ")).withColumn(
                        "n_chars", F.length("text").cast("long"))
                if name == "embeddings" and k > 0:
                    leg = leg.withColumn(
                        "embedding",
                        F.transform("embedding",
                                    lambda x: (x + F.lit(k / 1024.0))
                                    .cast("float")))
                legs.append(leg)
            out = legs[0]
            for leg in legs[1:]:
                out = out.unionByName(leg)
        (out.repartition(n_files)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{name}.parquet")))
        print(f"  {name}: {copies if keys else 1} "
              f"copies -> {n_files} files", flush=True)
    spark.stop()


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/heavydata/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    generate("/root/testdata/sf0.1", out, k)
    print(f"heavy dataset at {out} (K={k})")
