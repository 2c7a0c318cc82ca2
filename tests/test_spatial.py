"""Grid-bucketed spatial joins (operators/spatial.py)."""

import math
import random

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.spatial import (
    haversine_km,
    nearest_site_join,
)


def _hav(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = (math.sin(dlat) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dlon) ** 2)
    return 2 * r * math.asin(math.sqrt(a))


def test_haversine_matches_reference(spark):
    df = spark.createDataFrame(
        [(-22.9068, -43.1729, -22.9519, -43.2105)],  # centro -> gávea-ish
        ["a", "b", "c", "d"])
    got = df.select(haversine_km(
        F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0]["km"]
    want = _hav(-22.9068, -43.1729, -22.9519, -43.2105)
    assert abs(got - want) < 1e-9 and 6 < got < 8


def test_nearest_site_join_equals_exact(spark):
    """Randomized recall/precision check vs the exact cross-join
    nearest — including pairs that straddle cell boundaries."""
    rng = random.Random(5)
    pts = [(i, -23.0 + rng.random() * 0.3, -43.5 + rng.random() * 0.3)
           for i in range(150)]
    sites = [(j, -23.0 + rng.random() * 0.3, -43.5 + rng.random() * 0.3)
             for j in range(25)]
    p = spark.createDataFrame(pts, ["pid", "lat", "lon"])
    s = spark.createDataFrame(sites, ["sid", "slat", "slon"])
    got = {(r["pid"], r["sid"]) for r in nearest_site_join(
        p, s, "pid", "lat", "lon", "sid", "slat", "slon",
        max_km=4.0, ref_lat_deg=-23.0).collect()}
    want = {}
    for pid, la, lo in pts:
        best = None
        for sid, sla, slo in sites:
            d = _hav(la, lo, sla, slo)
            if d <= 4.0 and (best is None or (d, sid) < best):
                best = (d, sid)
        if best:
            want[pid] = best[1]
    assert got == set(want.items())


def test_nearest_site_join_no_cartesian(spark):
    p = spark.createDataFrame([(1, -23.0, -43.0)], ["pid", "lat", "lon"])
    s = spark.createDataFrame([(1, -23.0, -43.0)], ["sid", "slat", "slon"])
    plan = nearest_site_join(
        p, s, "pid", "lat", "lon", "sid", "slat", "slon", 5.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_grid_density_clusters(spark):
    """Two dense blobs far apart cluster separately; sparse points are
    noise; adjacent dense cells merge into one cluster."""
    from pipelines_rj_sms_spark.operators.spatial import (
        grid_density_clusters)
    rows = []
    # blob A: 12 points in ~one cell; plus 8 in the adjacent cell
    rows += [(i, -23.001 + i * 1e-5, -43.001) for i in range(12)]
    rows += [(100 + i, -23.001 + i * 1e-5, -43.03) for i in range(8)]
    # blob B: far away
    rows += [(200 + i, -22.70 + i * 1e-5, -43.40) for i in range(9)]
    # noise
    rows += [(300, -22.85, -43.2), (301, -22.95, -43.1)]
    df = spark.createDataFrame(rows, ["pid", "lat", "lon"])
    got = {r["pid"]: r["cluster"] for r in grid_density_clusters(
        df, "pid", "lat", "lon", cell_km=3.0, min_pts=5).collect()}
    a = {got[i] for i in range(12)} | {got[100 + i] for i in range(8)}
    b = {got[200 + i] for i in range(9)}
    assert len(a) == 1 and None not in a      # adjacent cells merged
    assert len(b) == 1 and None not in b
    assert a != b                             # far blobs separate
    assert got[300] is None and got[301] is None
