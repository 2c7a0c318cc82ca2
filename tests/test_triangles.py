import itertools
import random

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.cache import release
from pipelines_rj_sms_spark.operators.graph import triangle_counts


def test_triangle_counts_known_graph(spark):
    # K4 on {1,2,3,4} plus a pendant 5-1: K4 has C(4,3)=4 triangles,
    # each K4 node in 3 of them; node 5 in none.
    edges = list(itertools.combinations([1, 2, 3, 4], 2)) + [(5, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = triangle_counts(df, "src", "dst")
    got = {r["node"]: r.asDict() for r in out.collect()}
    release(out)
    assert got[1]["triangles"] == 3 and got[1]["degree"] == 4
    assert got[2]["triangles"] == 3
    assert got[5]["triangles"] == 0 and got[5]["clustering_coeff"] == 0.0
    # node 2: deg 3, 3 triangles -> coeff = 2*3/(3*2) = 1.0
    assert got[2]["clustering_coeff"] == 1.0
    # node 1: deg 4 -> 2*3/(4*3) = 0.5
    assert got[1]["clustering_coeff"] == 0.5


def test_triangle_counts_randomized_vs_bruteforce(spark):
    rng = random.Random(7)
    nodes = list(range(30))
    edges = [(a, b) for a in nodes for b in nodes
             if a < b and rng.random() < 0.2]
    # throw in reversed duplicates and self-loops: must not change counts
    noisy = edges + [(b, a) for (a, b) in edges[:10]] + [(3, 3)]
    df = spark.createDataFrame(noisy, ["src", "dst"])
    out = triangle_counts(df, "src", "dst")
    got = {r["node"]: r["triangles"] for r in out.collect()}
    release(out)

    eset = set(edges)
    expect = {n: 0 for n in set(x for e in edges for x in e)}
    for a, b, c in itertools.combinations(sorted(expect), 3):
        if ((a, b) in eset and (b, c) in eset and (a, c) in eset):
            expect[a] += 1
            expect[b] += 1
            expect[c] += 1
    assert {n: got.get(n, 0) for n in expect} == expect


def test_triangle_counts_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    out = triangle_counts(df, "src", "dst")
    plan = out._jdf.queryExecution().executedPlan().toString()
    release(out)
    assert "CartesianProduct" not in plan
