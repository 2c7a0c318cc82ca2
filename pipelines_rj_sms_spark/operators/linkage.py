"""Probabilistic record linkage: blocking + similarity scoring.

The reference's domain lives on linking the same person across systems
(its SINAN ingestion carries a `ds_soundex` phonetic column —
bq_to_subpav/schedules.py:91 — precisely the classic linkage blocking
key), and its per-system patient tables are reconciled by CPF when
present, fuzzily when not. This module is the engine-side shape of
that: generate deterministic BLOCKING keys so candidate pairs come
from an equi-join (never a cross product), score candidates with
cheap expression-level similarities (Levenshtein ratio, exact-match
indicators), and keep matches above a threshold — optionally only the
best match per left record.

All of it is JVM expressions (`soundex`, `levenshtein` are Spark
built-ins); the blocking discipline is what makes it a 100 TB
operator: pair count is bounded by block sizes, and a hot block (a
very common surname) is visible as a skewed key — cap or salt it
upstream, exactly like every other candidate generator in this repo.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def phonetic_block_key(name_col: Column | str,
                       extra: list[Column] | None = None) -> Column:
    """Soundex of the first + last name token (the standard linkage
    block), optionally concatenated with coarse extra keys (birth year,
    municipality) to shrink blocks further."""
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    toks = F.split(F.trim(c), r"\s+")
    key = F.concat_ws(
        "|",
        F.soundex(F.element_at(toks, 1)),
        F.soundex(F.element_at(toks, -1)),
        *(extra or []))
    return key


def levenshtein_ratio(a: Column | str, b: Column | str,
                      max_dist: int | None = None) -> Column:
    """Normalized edit similarity in [0, 1]: 1 - lev(a,b)/max(len).
    Integer Levenshtein is engine-exact, so the ratio reproduces
    bit-identically in any SQL engine.

    ``max_dist`` switches to Spark's BANDED Levenshtein (the
    ``threshold`` argument, 3.5+): the DP explores only a 2·max_dist
    diagonal band — O(max_dist·n) instead of O(n²) per pair, the
    per-task-work lever (guide §1.2 step 2) for threshold-filtered
    linkage scoring where most candidate pairs are far apart. Pairs
    beyond the band score **-1.0** (below every sane threshold in
    [0, 1]) instead of their true ratio, so a downstream
    ``ratio >= t`` filter selects the IDENTICAL pair set as the exact
    spelling whenever ``max_dist >= (1 - t) * max_possible_len`` —
    the caller owns that bound (e.g. fixed-width blocking keys or a
    length cap upstream). Exact ratios of in-band pairs are
    bit-identical to the unbanded form."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    if max_dist is None:
        return (F.lit(1.0)
                - F.levenshtein(ca, cb)
                / F.greatest(F.length(ca), F.length(cb), F.lit(1)))
    lev = F.levenshtein(ca, cb, int(max_dist))
    return (F.when(lev < 0, F.lit(-1.0))
            .otherwise(F.lit(1.0) - lev
                       / F.greatest(F.length(ca), F.length(cb),
                                    F.lit(1))))


def _jaro_winkler_py(a: str, b: str, prefix_weight: float = 0.1,
                     boost_threshold: float = 0.7) -> float:
    """Textbook Jaro-Winkler (public algorithm, matching DuckDB's
    jaro_winkler_similarity semantics: empty strings score 0, Winkler
    prefix boost applied above the 0.7 Jaro threshold)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    b_matched = [False] * lb
    a_matched = [False] * la
    m = 0
    for i, ch in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_matched[j] and b[j] == ch:
                a_matched[i] = b_matched[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_matched[i]:
            while not b_matched[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro <= boost_threshold:
        return jaro
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return jaro + l * prefix_weight * (1.0 - jaro)


def jaro_winkler(a: Column | str, b: Column | str) -> Column:
    """Jaro-Winkler similarity in [0, 1] as an Arrow-batched pandas
    UDF — the sanctioned Python path (SCALE.md): JW's adaptive match
    window has no expression-level spelling, and linkage scoring runs
    AFTER blocking, so the UDF sees candidate pairs (block-bounded),
    never the cross product. Use `levenshtein_ratio` when an
    expression-only score suffices."""
    @F.pandas_udf("double")
    def _jw(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series([
            0.0 if (x is None or y is None) else _jaro_winkler_py(x, y)
            for x, y in zip(sa, sb)], dtype="float64")

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _jw(ca, cb)


def link_records(left: DataFrame, right: DataFrame,
                 block_cols: list[str],
                 score_expr: Column,
                 threshold: float = 0.8,
                 left_id: str = "left_id", right_id: str = "right_id",
                 best_per_left: bool = True,
                 score_col: str = "score") -> DataFrame:
    """Candidate generation + scoring + (optionally) best-match pick.

    ``left`` and ``right`` must both carry ``block_cols`` (from
    phonetic_block_key or any deterministic blocking) and their id
    columns; every other column should be pre-renamed to avoid
    ambiguity (the convention: left columns ``l_*``, right ``r_*``).
    ``score_expr`` is any expression over those columns (weighted
    levenshtein_ratio sums, exact-match indicators...).

    Plan shape: one equi-join on the block key (hash shuffle on the
    block — never a cross product), a codegen'd score projection, a
    threshold filter, and — with ``best_per_left`` — one window over
    the already-filtered candidate pairs ranked by (score desc,
    right_id) for a deterministic winner.
    """
    pairs = left.join(right, block_cols)
    scored = (pairs
              .withColumn(score_col, score_expr)
              .filter(F.col(score_col) >= F.lit(threshold)))
    if not best_per_left:
        return scored
    w = Window.partitionBy(left_id).orderBy(
        F.col(score_col).desc(), F.col(right_id))
    return (scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1).drop("_rk"))


def resolve_entities(df: DataFrame, id_col: str, block_cols: list[str],
                     score_expr: Column, threshold: float = 0.8,
                     payload_cols: list[str] | None = None,
                     max_iter: int = 50) -> DataFrame:
    """End-to-end entity resolution over ONE table: every record gets
    an ``entity_id`` (the smallest member id of its duplicate
    cluster). Composes the repo's primitives — blocking self-join →
    similarity threshold → duplicate edges → `dedup.connected_
    components` → min-id canonical label — each stage inheriting its
    scale posture (equi-join candidates, O(diameter) label rounds).

    ``payload_cols`` are the columns ``score_expr`` reads; they are
    exposed to it with ``l_``/``r_`` prefixes (e.g.
    ``jaro_winkler("l_name", "r_name")``). Pairs are generated once
    (id_a < id_b); records sharing no block with anyone stay their own
    entity.
    """
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.dedup import (
        _parallelize_narrow, connected_components)

    payload_cols = payload_cols or []
    # the similarity filter is compute-dense but byte-light (string-DP
    # per candidate pair), so a single-file input would run it on one
    # or two cores and AQE's byte-based coalescing can't help; the
    # repo's narrow-input widening is a no-op at real scale (file
    # splits already give parallelism) and pays one tiny shuffle here
    # (r12 stage profile: the scoring stage ran on 2 tasks, 3.2 s /
    # 7.2 s skewed)
    df = _parallelize_narrow(df)
    left = df.select(
        F.col(id_col).alias("_ida"), *block_cols,
        *[F.col(c).alias(f"l_{c}") for c in payload_cols])
    right = df.select(
        F.col(id_col).alias("_idb"), *block_cols,
        *[F.col(c).alias(f"r_{c}") for c in payload_cols])
    # No persist here (r13): connected_components eagerly
    # localCheckpoints its (src, dst) edge projection before the
    # symmetrizing union (dedup.py), so the blocking join + similarity
    # scoring — the expensive stage — executes exactly once into that
    # checkpoint and the scored-edge frame has exactly ONE consumer; a
    # persist would only hold a duplicate copy of the edge rows in
    # executor memory until release (ADVICE r12).
    edges = (left.join(right, block_cols)
             .filter(F.col("_ida") < F.col("_idb"))
             .filter(score_expr >= F.lit(threshold))
             .select("_ida", "_idb"))
    comp = connected_components(edges, "_ida", "_idb",
                                nodes=df, node_col=id_col,
                                max_iter=max_iter)
    # passing comp carries connected_components' own persist ledger
    # (symmetrized edges, label frames) onto the returned frame, so
    # release(result) frees them without the release_all() backstop
    return track(comp.select(F.col("node").alias(id_col),
                             F.col("component").alias("entity_id")),
                 comp)


def fs_u_probabilities(left: DataFrame, right: DataFrame,
                       agreement_exprs: dict[str, Column],
                       sample_pairs: int = 100_000,
                       salt: str = "fsu") -> dict[str, float]:
    """Estimate Fellegi-Sunter ``u`` probabilities — P(field agrees |
    records do NOT refer to the same entity) — from RANDOM pairings:
    random pairs are almost surely non-matches at population scale, so
    the chance-agreement rate per field IS u (the standard estimator;
    Fellegi & Sunter 1969, public).

    The random pairing is the repo's replayable md5 hash-draw, made
    QUADRATIC-PROOF for corpora far larger than ``sample_pairs``: each
    side buckets rows by hash mod sample_pairs, keeps exactly ONE row
    per bucket (the hash-minimal one — a single min(struct) hash agg,
    deterministic), and the bucket join is therefore at most 1:1 —
    never the (n/samples)² per-bucket fan-out a raw rank join would
    produce at population scale. Two narrow shuffles, no RNG
    coordination, no cross product. Column expressions in
    ``agreement_exprs`` must read the prefixed ``l_*``/``r_*``
    columns. Returns {field: u}, clamped away from 0/1 for finite
    log-weights.
    """
    def ranked(df, prefix):
        key = F.conv(F.substring(F.md5(
            F.concat(F.lit(salt + prefix),
                     F.concat_ws("|", *[F.col(c).cast("string")
                                        for c in df.columns]))),
            1, 15), 16, 10).cast("long")
        picked = (df.select(key.alias("_k"), *df.columns)
                  .groupBy(F.pmod(F.col("_k"), F.lit(sample_pairs))
                           .alias("_rk"))
                  .agg(F.min(F.struct("_k", *df.columns)).alias("_w")))
        return picked.select(
            "_rk", *[F.col(f"_w.{c}").alias(f"{prefix}_{c}")
                     for c in df.columns])

    pairs = ranked(left, "l").join(ranked(right, "r"), "_rk")
    aggs = [F.avg(expr.cast("int")).alias(name)
            for name, expr in agreement_exprs.items()]
    row = pairs.agg(*aggs).first()
    return {name: min(max(float(row[name] or 0.0), 1e-6), 1.0 - 1e-6)
            for name in agreement_exprs}


def fs_score(m: dict[str, float], u: dict[str, float],
             agreement_exprs: dict[str, Column]) -> Column:
    """Fellegi-Sunter log-likelihood match weight as ONE codegen
    expression: sum over fields of log2(m/u) when the field agrees,
    log2((1-m)/(1-u)) when it disagrees (null comparisons count as
    disagreement — the conservative convention). ``m`` = P(agree |
    match), from labeled data or domain priors; ``u`` from
    `fs_u_probabilities`. Use with `link_records` as the score_expr:
    probabilistic linkage with exactly the same blocking/plan shape
    as the deterministic scorers.
    """
    import math

    total = None
    for name, expr in agreement_exprs.items():
        agree_w = math.log2(m[name] / u[name])
        disagree_w = math.log2((1.0 - m[name]) / (1.0 - u[name]))
        term = F.when(expr, F.lit(agree_w)).otherwise(F.lit(disagree_w))
        total = term if total is None else total + term
    return total


def deletion_neighborhood_pairs(df: DataFrame, id_col: str,
                                text_col: str,
                                max_group: int | None = 1000
                                ) -> DataFrame:
    """Edit-distance-1 fuzzy pairs via the SymSpell deletion-
    neighborhood trick (public algorithm): two strings are within one
    edit iff they are equal, one is a single-character deletion of the
    other, or they share a single-deletion variant — so generating the
    ≤(len+1) deletion variants per string and equi-joining on the
    variant key finds EVERY candidate without any all-pairs scan, the
    blocking-discipline answer to "fuzzy join on a name column" that a
    naive levenshtein-θ join (a cross product) can never give at
    scale.

    Shape: one projection explodes each (id, text) into its distinct
    variants; variant groups collapse via collect_set and in-array
    pair combinations (the `cooccurrence_edges` pattern — pairs are
    emitted inside codegen, bounded by group size²); a final distinct
    + exact `levenshtein ≤ 1` verification removes the few
    hash-coincidence false candidates. ``max_group`` drops variant
    groups larger than the cap — the hot-block guard (an empty/very
    short string's variants collide massively); groups it drops could
    only contribute pairs of near-identical ultra-short strings.
    Returns (id_a, name_a, id_b, name_b, dist) with id_a < id_b.
    """
    s = F.col(text_col)
    variants = F.array_distinct(F.concat(
        F.array(s),
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(F.substring(s, F.lit(1), i - 1),
                               F.substring(s, i + 1,
                                           F.length(s))))))
    vars_df = (df.select(F.col(id_col).alias("_id"),
                         s.alias("_s"),
                         F.explode(variants).alias("_v"))
               .distinct())
    sets = (vars_df.groupBy("_v")
            .agg(F.sort_array(F.collect_set(
                F.struct(F.col("_id").alias("i"),
                         F.col("_s").alias("t")))).alias("_m")))
    sets = sets.filter(F.size("_m") >= 2)
    if max_group is not None:
        sets = sets.filter(F.size("_m") <= int(max_group))
    pairs = F.flatten(F.transform(
        "_m", lambda x, i: F.transform(
            F.slice(F.col("_m"), i + 2, F.size("_m")),
            lambda y: F.struct(x["i"].alias("ia"), x["t"].alias("ta"),
                               y["i"].alias("ib"), y["t"].alias("tb")))))
    cand = (sets.select(F.explode(pairs).alias("_p"))
            .select(F.col("_p.ia").alias("id_a"),
                    F.col("_p.ta").alias("name_a"),
                    F.col("_p.ib").alias("id_b"),
                    F.col("_p.tb").alias("name_b"))
            .distinct())
    dist = F.levenshtein("name_a", "name_b")
    return (cand.filter(dist <= 1)
            .select("id_a", "name_a", "id_b", "name_b",
                    dist.cast("int").alias("dist")))
