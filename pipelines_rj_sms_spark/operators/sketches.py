"""Mergeable distinct-count sketches — HLL rollups over the lakehouse.

The reference answers "how many distinct patients/users this month?"
by re-scanning raw rows per report window (its monitor queries group
over the full slice each run). At 100 TB that re-scan is the cost
center, and the scalable shape is the hypertable/materialized-rollup
pattern: build a *mergeable* sketch per fine grain (day, type) once,
persist the sketch bytes, and answer any coarser grain (month, total,
ad-hoc key subset) by merging sketches — bytes-in, bytes-out, no raw
re-read ever.

Spark 4 ships Apache DataSketches HLL natively (`hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate`), so the whole path stays
JVM-side expression code — no UDF, full whole-stage codegen, and the
partial aggregation is map-side (each task sketches its partition,
the shuffle moves fixed-size register arrays, not values). A sketch
column is just `binary`, so it parquet-roundtrips through the
lakehouse sinks unchanged.

Merge is register-wise max: associative + commutative + idempotent,
which is what makes the rollup lattice work — daily sketches merge to
monthly, monthly to yearly, and re-merging an already-counted day is
harmless (exactly the reruns-safe posture the reference's idempotent
loads need).

Accuracy: relative standard error ~= 1.04 / sqrt(2**lg_k); the default
lg_k=12 gives ~1.6% RSE at ~2.5 KB per sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_sketches(df: DataFrame, group_cols: list[str], value_col: str,
                   lg_k: int = 12,
                   sketch_col: str = "distinct_sketch") -> DataFrame:
    """One HLL sketch of ``value_col`` per ``group_cols`` grain.

    This is the write-time half of the rollup: run once per ingest
    window at the finest grain you'll ever query (e.g. day x type),
    append to a rollup table via the lakehouse sink. One hash
    aggregation; the shuffle carries ~2.5 KB registers per group.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col),
        F.count("*").alias("row_count"),
    )


def merge_rollup(sketches: DataFrame, group_cols: list[str],
                 sketch_col: str = "distinct_sketch",
                 estimate_col: str = "distinct_estimate") -> DataFrame:
    """Read-time half: collapse fine-grain sketches to ``group_cols``
    (any subset of the build grain) and estimate. Input is the rollup
    table — never the raw events. ``group_cols=[]`` gives the corpus
    total as one row.
    """
    merged = F.hll_union_agg(F.col(sketch_col), F.lit(True))
    agg = [
        F.hll_sketch_estimate(merged).alias(estimate_col),
        F.sum("row_count").alias("row_count"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)


def estimate(col: Column | str) -> Column:
    """Point estimate from a sketch column (for ad-hoc SELECTs over a
    persisted rollup table)."""
    return F.hll_sketch_estimate(F.col(col) if isinstance(col, str) else col)


def distinct_rollup_check(df: DataFrame, group_cols: list[str],
                          value_col: str, fine_col: str,
                          lg_k: int = 12,
                          tolerance: float = 0.05) -> DataFrame:
    """End-to-end rollup with a built-in accuracy audit.

    Builds sketches at (``group_cols`` x ``fine_col``), merges them up
    to ``group_cols``, and emits per group: the exact distinct count
    (computed the expensive way, for the audit), and whether the merged
    estimate landed within ``tolerance`` of it. In production you run
    the exact side never and the sketch side always; here the exact
    column is what lets the DuckDB oracle hash-verify the pipeline
    (the oracle asserts ``within_tolerance = true`` — if the sketch
    path drifts past tolerance the hash goes red).
    """
    fine = build_sketches(df, [*group_cols, fine_col], value_col, lg_k)
    merged = merge_rollup(fine, group_cols)
    exact = df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(value_col)).alias("exact_distinct"))
    rel_err = (F.abs(F.col("distinct_estimate") - F.col("exact_distinct"))
               / F.col("exact_distinct"))
    return (
        merged.join(exact, group_cols)
        .select(
            *group_cols,
            "exact_distinct",
            F.col("row_count").cast("long").alias("row_count"),
            (rel_err <= F.lit(tolerance)).alias("within_tolerance"),
        )
    )


def pairwise_overlap(sketches: DataFrame, key_col: str,
                     sketch_col: str = "distinct_sketch",
                     estimate_col: str = "overlap_estimate") -> DataFrame:
    """Estimated pairwise set intersections between groups, from their
    persisted sketches alone: |A ∩ B| = |A| + |B| − |A ∪ B|, with the
    union as a scalar register merge (``hll_union``) — answering "how
    many users do segments A and B share?" for every pair without ever
    re-scanning raw data.

    Input is one sketch row per group (the rollup table), so the
    self-join runs on the tiny post-aggregation frame — pair count is
    O(groups²), never O(rows). Error compounds across the three
    estimates (≈3× the per-sketch RSE, relative to the UNION size), so
    small intersections between large sets carry proportionally more
    noise — the standard inclusion-exclusion caveat; use theta-style
    set sketches where precise small intersections matter.
    """
    a = sketches.select(F.col(key_col).alias("key_a"),
                        F.col(sketch_col).alias("_sa"))
    b = sketches.select(F.col(key_col).alias("key_b"),
                        F.col(sketch_col).alias("_sb"))
    est_a = F.hll_sketch_estimate(F.col("_sa"))
    est_b = F.hll_sketch_estimate(F.col("_sb"))
    est_union = F.hll_sketch_estimate(
        F.hll_union(F.col("_sa"), F.col("_sb"), True))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b",
                F.greatest(est_a + est_b - est_union, F.lit(0))
                .alias(estimate_col))
    )


# ---------------------------------------------------------------------------
# Theta sketches — mergeable set ALGEBRA (union / intersection / difference)
# ---------------------------------------------------------------------------
# HLL answers only "how many distinct?"; inclusion-exclusion over HLL
# (pairwise_overlap above) compounds error on small intersections. Spark 4
# also ships DataSketches Theta sketches natively (`theta_sketch_agg` /
# `theta_union` / `theta_intersection` / `theta_difference`), which keep an
# actual hash SAMPLE of the set, so intersections and differences are
# first-class operations with much tighter error — and below the nominal
# entry count (2**lg_k) the sketch is EXACT. Same rollup economics as HLL:
# build once per fine grain, persist binary, answer set questions from
# sketch bytes without re-reading raw data.


def build_theta_sketches(df: DataFrame, group_cols: list[str],
                         value_col: str, lg_k: int = 12,
                         sketch_col: str = "theta_sketch") -> DataFrame:
    """One Theta sketch of ``value_col`` per ``group_cols`` grain.

    Write-time half of the set-algebra rollup (one hash aggregation,
    map-side partial; the shuffle carries bounded hash samples). Below
    2**lg_k distinct values per group the sketch is a complete hash
    sample and every downstream estimate is exact.
    """
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col),
        F.count("*").alias("row_count"),
    )


def theta_rollup(sketches: DataFrame, group_cols: list[str],
                 sketch_col: str = "theta_sketch",
                 estimate_col: str = "distinct_estimate") -> DataFrame:
    """Merge fine-grain theta sketches to ``group_cols`` and estimate
    distinct counts — the read-time half, raw data never re-read."""
    merged = F.theta_union_agg(F.col(sketch_col))
    agg = [
        F.theta_sketch_estimate(merged).alias(estimate_col),
        F.sum("row_count").alias("row_count"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)


def theta_pairwise_overlap(sketches: DataFrame, key_col: str,
                           sketch_col: str = "theta_sketch",
                           estimate_col: str = "overlap_estimate"
                           ) -> DataFrame:
    """|A ∩ B| for every group pair, as a DIRECT intersection of the two
    hash samples (`theta_intersection`) — no inclusion-exclusion, so the
    error does not inherit the union's scale. Runs on the one-row-per-
    group rollup frame: O(groups²) pairs, never O(rows)."""
    a = sketches.select(F.col(key_col).alias("key_a"),
                        F.col(sketch_col).alias("_sa"))
    b = sketches.select(F.col(key_col).alias("key_b"),
                        F.col(sketch_col).alias("_sb"))
    inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("_sa"), F.col("_sb")))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", inter.alias(estimate_col))
    )


def theta_pairwise_difference(sketches: DataFrame, key_col: str,
                              sketch_col: str = "theta_sketch",
                              estimate_col: str = "only_a_estimate"
                              ) -> DataFrame:
    """|A \\ B| for every ORDERED group pair (a ≠ b) via
    `theta_difference` — "members of segment A that segment B never
    saw", answered from persisted sketch bytes alone."""
    a = sketches.select(F.col(key_col).alias("key_a"),
                        F.col(sketch_col).alias("_sa"))
    b = sketches.select(F.col(key_col).alias("key_b"),
                        F.col(sketch_col).alias("_sb"))
    diff = F.theta_sketch_estimate(
        F.theta_difference(F.col("_sa"), F.col("_sb")))
    return (
        a.join(b, F.col("key_a") != F.col("key_b"))
        .select("key_a", "key_b", diff.alias(estimate_col))
    )


# ---------------------------------------------------------------------------
# KLL sketches — mergeable QUANTILES
# ---------------------------------------------------------------------------
# `percentile()` is exact but holds every value per group in memory and
# cannot be rolled up (yesterday's p99 + today's p99 says nothing about
# the week's p99). The KLL sketch (Karnin-Lang-Liberty, the DataSketches
# quantile sketch Spark 4 exposes as `kll_sketch_agg_double` /
# `kll_merge_agg_double`) is the mergeable answer: ~O(k log(n/k)) floats
# per sketch with a normalized RANK error guarantee (~0.8% at k=400),
# independent of n — so per-day sketches merge to any coarser window and
# the week's p99 comes from sketch bytes, not a re-scan.


def build_quantile_sketches(df: DataFrame, group_cols: list[str],
                            value_col: str, k: int = 400,
                            sketch_col: str = "quantile_sketch"
                            ) -> DataFrame:
    """One KLL(double) sketch of ``value_col`` per ``group_cols`` grain
    (write-time half; one hash aggregation, bounded sketch state)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)).alias(sketch_col),
        F.count("*").alias("row_count"),
    )


def merge_quantile_rollup(sketches: DataFrame, group_cols: list[str],
                          quantiles: tuple = (0.5, 0.9, 0.99),
                          sketch_col: str = "quantile_sketch") -> DataFrame:
    """Collapse fine-grain KLL sketches to ``group_cols`` and read the
    requested quantiles off the merged sketch (`q_50`, `q_90`, ... named
    by percent). Input is the persisted rollup, never raw rows."""
    merged = F.kll_merge_agg_double(F.col(sketch_col))
    agg = [F.sum("row_count").alias("row_count"),
           merged.alias("_merged")]
    out = (sketches.groupBy(*group_cols).agg(*agg)
           if group_cols else sketches.agg(*agg))
    for q in quantiles:
        name = f"q_{str(q).replace('0.', '').ljust(2, '0')}"
        out = out.withColumn(
            name, F.kll_sketch_get_quantile_double(
                F.col("_merged"), F.lit(float(q))))
    return out.drop("_merged")


def quantile_rollup_check(df: DataFrame, group_cols: list[str],
                          value_col: str, fine_col: str,
                          quantiles: tuple = (0.5, 0.9, 0.99),
                          k: int = 400,
                          tolerance: float = 0.05) -> DataFrame:
    """End-to-end KLL rollup with a built-in accuracy audit.

    Builds sketches at (``group_cols`` x ``fine_col``), merges up to
    ``group_cols``, and emits the EXACT interpolated percentiles (the
    expensive way — what the DuckDB oracle can hash-verify) plus one
    ``within_tolerance`` flag. The audit checks the guarantee KLL
    actually makes — RANK error, not value error: read each estimated
    quantile value off the merged sketch, then measure its exact
    achieved rank in the raw data (one broadcast join + one hash agg);
    the achieved rank must sit within ``tolerance`` of the requested
    rank. Rank error is normalized, so the audit is scale-free and
    holds at any SF. (`kll_sketch_get_rank_double` itself wants a
    foldable probe value, so the audit measures rank exactly instead —
    strictly stronger.)
    """
    fine = build_quantile_sketches(
        df, [*group_cols, fine_col], value_col, k)
    merged = F.kll_merge_agg_double(F.col("quantile_sketch"))
    rolled = fine.groupBy(*group_cols).agg(merged.alias("_merged"))
    est = rolled.select(*group_cols, *[
        F.kll_sketch_get_quantile_double(F.col("_merged"), F.lit(float(q)))
        .alias(f"_est_{int(q * 100)}")
        for q in quantiles])
    v = F.col(value_col).cast("double")
    achieved = (
        df.join(F.broadcast(est), group_cols)
        .groupBy(*group_cols)
        .agg(*[
            F.avg((v <= F.col(f"_est_{int(q * 100)}")).cast("double"))
            .alias(f"_rank_{int(q * 100)}")
            for q in quantiles])
    )
    exact = df.groupBy(*group_cols).agg(*[
        F.round(F.percentile(F.col(value_col), F.lit(q)), 6)
        .alias(f"p{int(q * 100)}")
        for q in quantiles])
    checks = [
        (F.abs(F.col(f"_rank_{int(q * 100)}") - F.lit(q))
         <= F.lit(tolerance))
        for q in quantiles]
    ok = checks[0]
    for c in checks[1:]:
        ok = ok & c
    return (
        exact.join(achieved, group_cols)
        .select(*group_cols,
                *[f"p{int(q * 100)}" for q in quantiles],
                ok.alias("within_tolerance"))
    )


# ---------------------------------------------------------------------------
# Count-min frequency table — mergeable per-key FREQUENCY estimates
# ---------------------------------------------------------------------------
# "How hot is key K?" at 100 TB normally costs a full groupBy over an
# unbounded key space. A count-min sketch bounds the state at depth x
# width counters regardless of key cardinality, merges by plain addition,
# and guarantees estimate >= true and estimate <= true + eps*N (w.h.p.,
# eps ~ e/width). Spark's built-in `count_min_sketch` returns an opaque
# binary with no SQL-side merge/query surface, so this represents the
# CMS as a plain (depth, bucket, cnt) DataFrame instead: rows are
# queryable with joins, merging two sketch tables is a union+sum, and
# everything stays expression-only (xxhash64 row hashes, one explode,
# one hash aggregation). Hashes are seeded deterministically, so the
# table is a pure function of the data — idempotent to rebuild, stable
# under repartitioning.


def build_freq_sketch(df: DataFrame, value_col: str,
                      depth: int = 5, width: int = 2048) -> DataFrame:
    """Count-min table of ``value_col`` frequencies: ``depth`` x
    ``width`` bounded rows (d, bucket, cnt). One explode (xdepth) + one
    hash aggregation; shuffle carries at most depth*width counter rows.
    Merge sketches built with the same (depth, width) by unioning and
    summing ``cnt`` per (d, bucket)."""
    rows = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("d"),
            F.pmod(F.xxhash64(F.col(value_col), F.lit(i)), F.lit(width))
            .alias("bucket"))
        for i in range(depth)]))
    return (
        df.select(rows.alias("_r"))
        .groupBy(F.col("_r.d").alias("d"), F.col("_r.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def merge_freq_sketches(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sum two CMS tables built with identical (depth, width)."""
    return (a.unionByName(b)
            .groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt")))


def freq_estimate(freq: DataFrame, keys: DataFrame, key_col: str,
                  depth: int = 5, width: int = 2048,
                  estimate_col: str = "freq_estimate") -> DataFrame:
    """Point-query the CMS table for each key in ``keys``: recompute the
    key's ``depth`` buckets (same seeded hashes), join against the
    bounded counter table, take the min. Missing buckets read as 0.
    The counter table is at most depth*width rows — Catalyst broadcasts
    it, so estimating any number of keys is shuffle-free on the keys
    side."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("d"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
                .alias("bucket"))
            for i in range(depth)])).alias("_p"))
    joined = probes.join(
        F.broadcast(freq),
        (F.col("_p.d") == F.col("d")) & (F.col("_p.bucket") == F.col("bucket")),
        "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
             .alias(estimate_col))
    )


def cms_join_size(a: DataFrame, b: DataFrame,
                  depth: int = 5, width: int = 2048,
                  estimate_col: str = "join_size_estimate") -> DataFrame:
    """Equi-join cardinality estimate from two count-min tables built
    with identical (depth, width): the classic AMS/CMS inner-product
    result (public) — per depth row, sum over buckets of
    cnt_a * cnt_b; the estimate is the min across depths. Colliding
    keys only ever ADD nonnegative products, so the estimate NEVER
    undercounts the true join size; expected overcount is
    ~|A||B|/width per depth, driven down by the min.

    This is the planner-side use of the sketches: decide
    broadcast-vs-shuffle, pre-size shuffle partitions, or refuse a
    runaway join BEFORE running it — from two bounded counter tables
    (depth x width rows each), never from the data. The product join
    is at most depth*width rows a side; output is one scalar row.
    """
    j = (a.alias("x").join(b.alias("y"), ["d", "bucket"])
         .groupBy("d")
         .agg(F.sum(F.col("x.cnt") * F.col("y.cnt")).alias("_ip")))
    # a depth row with zero shared buckets means that hash family saw
    # disjoint key sets: its inner product is 0, not "absent"
    depths = a.select("d").distinct()
    return (depths.join(j, "d", "left")
            .agg(F.min(F.coalesce(F.col("_ip"), F.lit(0)))
                 .alias(estimate_col)))
