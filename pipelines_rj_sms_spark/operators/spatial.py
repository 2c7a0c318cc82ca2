"""Spatial joins via grid bucketing — nearest-site assignment.

The reference geocodes addresses (C21 enrichment) and the domain's
natural next question is proximity: which clinic/CAPS/UPA is nearest
to each patient address (e.g. its georeferencing of units feeds
exactly such lookups). The naive spelling is a cross join with a
distance filter — O(|points| x |sites|), dead at scale.

This module is the standard grid-bucket decomposition (public
technique, same family as the repo's time-bucket range join and LSH
buckets): choose a cell size >= the search radius, replicate the
SITES side into each cell's 3x3 neighborhood (x9 — bounded, and sites
are the small side), keep points at exactly one cell, and meet in an
equi-join on the cell id. Every within-radius pair provably shares
the 3x3 neighborhood, so recall is exact; the haversine predicate
inside the join condition removes the rest. Distances are
expression-only (codegen), never Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_EARTH_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat_a: Column, lon_a: Column,
                 lat_b: Column, lon_b: Column) -> Column:
    """Great-circle distance in km (haversine, public formula),
    expression-only."""
    rlat_a, rlat_b = F.radians(lat_a), F.radians(lat_b)
    dlat = F.radians(lat_b - lat_a) / 2
    dlon = F.radians(lon_b - lon_a) / 2
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rlat_a) * F.cos(rlat_b) * F.sin(dlon) * F.sin(dlon))
    return 2 * _EARTH_KM * F.asin(F.sqrt(a))


def _cell(lat: Column, lon: Column, cell_deg_lat: float,
          cell_deg_lon: float) -> tuple[Column, Column]:
    return (F.floor(lat / cell_deg_lat).cast("long"),
            F.floor(lon / cell_deg_lon).cast("long"))


def nearest_site_join(points: DataFrame, sites: DataFrame,
                      p_id: str, p_lat: str, p_lon: str,
                      s_id: str, s_lat: str, s_lon: str,
                      max_km: float,
                      ref_lat_deg: float = -23.0) -> DataFrame:
    """For each point, its nearest site within ``max_km`` (euclidean-
    on-sphere via haversine): (point id, site id, distance_km). Points
    with no site in range are absent (semi-join semantics — left-join
    wrap it if you need the misses).

    Cell size is derived from ``max_km`` at ``ref_lat_deg`` latitude
    (longitude degrees shrink with cos(lat); the reference city sits
    near -23°). Pass the POLEWARD edge of your data as ``ref_lat_deg``
    — cells then cover at least ``max_km`` everywhere, keeping the 3x3
    recall guarantee. Sites replicate x9 into their neighborhood; points
    stay single — so the shuffle is 9|sites| + |points|, and the join
    is an equi-join on the cell id with the radius predicate inside
    the condition. Winner per point = min distance, site id tiebreak,
    via one WindowGroupLimit pass.
    """
    deg_lat = max_km / 110.574
    deg_lon = max_km / (111.320 * abs(math.cos(math.radians(ref_lat_deg))))

    px, py = _cell(F.col(p_lat), F.col(p_lon), deg_lat, deg_lon)
    p = points.select(
        F.col(p_id), F.col(p_lat), F.col(p_lon),
        px.alias("_cx"), py.alias("_cy"))

    sx, sy = _cell(F.col(s_lat), F.col(s_lon), deg_lat, deg_lon)
    offsets = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)]))
    s = (sites.select(F.col(s_id), F.col(s_lat), F.col(s_lon),
                      sx.alias("_sx"), sy.alias("_sy"),
                      offsets.alias("_o"))
         .select(s_id, s_lat, s_lon,
                 (F.col("_sx") + F.col("_o.dx")).alias("_cx"),
                 (F.col("_sy") + F.col("_o.dy")).alias("_cy")))

    dist = haversine_km(F.col(p_lat), F.col(p_lon),
                        F.col(s_lat), F.col(s_lon))
    joined = p.join(
        s,
        (p["_cx"] == s["_cx"]) & (p["_cy"] == s["_cy"])
        & (dist <= F.lit(float(max_km))),
        "inner")
    w = Window.partitionBy(p_id).orderBy(
        dist.asc(), F.col(s_id).asc())
    return (joined
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(p_id, s_id, dist.alias("distance_km")))


def grid_density_clusters(points: DataFrame, p_id: str,
                          lat: str, lon: str,
                          cell_km: float, min_pts: int,
                          ref_lat_deg: float = -23.0) -> DataFrame:
    """Grid-density clustering (the scalable DBSCAN approximation,
    public technique): cells with >= ``min_pts`` points are *core*;
    clusters are connected components of 8-adjacent core cells; points
    in core cells get their component's id (encoded cell id of the
    smallest member cell), everyone else is noise (null cluster).

    Resolution is the grid — a cluster's granularity is ``cell_km``,
    which is the trade that removes DBSCAN's per-point neighbor scans:
    the whole operator is one cell-count aggregation, one bounded
    core-cell adjacency equi-join (x8 neighbor offsets on one side),
    min-label propagation over CELLS (a graph orders of magnitude
    smaller than the points), and one broadcast-able map back. Returns
    (p_id, cluster) with deterministic ids.
    """
    from pipelines_rj_sms_spark.operators.dedup import connected_components

    deg_lat = cell_km / 110.574
    deg_lon = cell_km / (111.320 *
                         abs(math.cos(math.radians(ref_lat_deg))))
    cx, cy = _cell(F.col(lat), F.col(lon), deg_lat, deg_lon)
    off = 1 << 20
    cell_id = ((cx + off) * (1 << 21) + (cy + off)).cast("long")
    p = points.select(F.col(p_id), cell_id.alias("_cell"))
    core = (p.groupBy("_cell").agg(F.count("*").alias("_n"))
            .filter(F.col("_n") >= min_pts)
            .select("_cell"))

    w = 1 << 21
    neighbors = F.explode(F.array(*[
        F.lit(dx * w + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)]))
    edges = (core.withColumn("_d", neighbors)
             .select(F.col("_cell").alias("_a"),
                     (F.col("_cell") + F.col("_d")).alias("_b"))
             .join(core.select(F.col("_cell").alias("_b")), "_b")
             .filter(F.col("_a") < F.col("_b")))
    comp = connected_components(edges, "_a", "_b",
                                nodes=core, node_col="_cell")
    return (p.join(comp.select(F.col("node").alias("_cell"),
                               F.col("component").alias("cluster")),
                   "_cell", "left")
            .select(p_id, "cluster"))
