"""Deterministic (order-independent) aggregation over doubles.

Floating-point addition is not associative, so ``SUM(double)`` depends
on partial-aggregation order: the same query returns a value that
differs in the last ulp run-to-run as Spark's hash aggregate combines
partials in whatever order partitions finish. Rounding the result to k
decimals usually hides this — until the true value sits on a rounding
boundary, where the ulp flips the rounded digit (the classic flaky
hash-compare). The repo convention (see ``__spark_entry__`` header) is
that every score sum that feeds a compared output must be exact.

``det_sum`` makes the sum exact and commutative by quantizing each
addend to fixed-point integer units FIRST:

    units = floor(x * scale + 0.5)        # one IEEE multiply + floor,
                                          # bit-identical in any engine
    sum(units)                            # BIGINT — exact, commutative
    result = sum_units / scale            # two IEEE divides

``floor`` is exact on doubles and ``x * scale`` is a single IEEE-754
multiply, so the quantized addends are bit-identical across engines
(Spark, DuckDB, anything IEEE) and across partitionings; the integer
sum is exact regardless of combine order. The 1/scale quantization
noise (default 1e-9 per addend) is far below the 1e-6 rounding every
consumer applies, and — because BOTH engines quantize identically — it
cancels entirely in oracle comparisons.

Bounds to respect when picking ``scale``: |x|*scale must stay below
2**53 (exact double integers) and n_addends*|x|*scale below 2**63
(BIGINT overflow). The default 1e9 allows |x| ≤ ~9e3 with ~1e6 addends
per group — far beyond any score sum here; pass a smaller scale for
larger magnitudes.

The DuckDB mirror of this expression is ``det_sum_sql`` (kept next to
the oracles in ``__spark_entry__``): the oracle must quantize the same
way or the comparison reintroduces the cross-engine ulp.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DET_SCALE = 1_000_000_000  # 1e-9 units


def det_units(x: Column, scale: int = DET_SCALE) -> Column:
    """Fixed-point BIGINT units of a double expression:
    floor(x*scale + 0.5) — round-half-up at 1/scale, exact IEEE.
    (Spark's floor(double) already returns LONG.)"""
    return F.floor(x * F.lit(float(scale)) + F.lit(0.5))


def det_sum(x: Column, scale: int = DET_SCALE) -> Column:
    """Order-independent SUM of a double expression, emitted as DOUBLE.

    Aggregate expression: quantize each addend to 1/scale units, sum
    exactly as BIGINT, divide back. Identical under repartition(1) and
    repartition(N), and bit-identical to the DuckDB mirror
    ``det_sum_sql``.
    """
    return det_sum_units(det_units(x, scale), scale)


def det_sum_units(units: Column, scale: int = DET_SCALE) -> Column:
    """SUM of already-quantized BIGINT units, emitted as DOUBLE
    (sum_units / scale). Split out so callers can quantize once and
    feed several aggregates."""
    return F.sum(units).cast("double") / F.lit(float(scale))


def det_sum_big(x: Column, scale: int = DET_SCALE) -> Column:
    """Capacity-proof det_sum: the quantized BIGINT units are summed as
    DECIMAL(38,0) (exact integer arithmetic with 38 digits of headroom)
    instead of BIGINT, so group cardinality × magnitude can exceed 2**63
    without overflow — the form for corpus-wide sufficient statistics
    (PCA moments, corpus totals) that must survive billion-row groups.
    The long→decimal cast is exact; only the final decimal→double
    conversion rounds (nearest, engine-identical)."""
    return (F.sum(det_units(x, scale).cast("decimal(38,0)"))
            .cast("double") / F.lit(float(scale)))


def det_sum_big_sql(x: str, scale: int = DET_SCALE) -> str:
    """DuckDB mirror of det_sum_big: HUGEINT accumulation of the same
    floor-quantized units."""
    return (f"(CAST(SUM(CAST(floor(({x}) * {float(scale)!r} + 0.5) "
            f"AS HUGEINT)) AS DOUBLE) / {float(scale)!r})")


def det_sum_sql(x: str, scale: int = DET_SCALE) -> str:
    """DuckDB mirror of det_sum: same quantize-sum-divide, same IEEE
    ops, same order of divisions. DuckDB floor() returns DOUBLE, so
    the integral value is cast to BIGINT (exact); DuckDB SUM(BIGINT)
    widens to HUGEINT internally, which only matters past 2**63 —
    beyond our bounds either way."""
    return (f"(CAST(SUM(CAST(floor(({x}) * {float(scale)!r} + 0.5) "
            f"AS BIGINT)) AS DOUBLE) / {float(scale)!r})")


# --- pinned transcendental values --------------------------------------
#
# det_sum's premise — "floor(x*scale+0.5) is bit-identical in any IEEE
# engine" — holds only when x itself is bit-identical in both engines.
# A runtime transcendental (ln/exp/pow) is NOT: libm implementations
# (JVM StrictMath-adjacent vs DuckDB's C libm) may differ in the last
# ulp. When such a value is multiplied by a count (tf) BEFORE
# quantization, the ulp is amplified by tf*scale and the floor can flip
# — the cross-engine hash-mismatch class diagnosed in VERDICT r6 for
# doc_{uni,bi}gram_logprob. The cure: pin the transcendental ITSELF to
# a coarse shared grid first. At LOG_SCALE=1e6, a 1-ulp ln divergence
# (~1e-15 absolute for |ln|~10) flips the pinned unit only when
# ln*1e6+0.5 sits within ~1e-9 of an integer — per DISTINCT model term,
# not per (doc,term) addend, shrinking the flip surface ~1e6-fold.
# Downstream arithmetic (multiply by tf, BIGINT sum, one divide) is
# then exact integer / single-IEEE-op work.

LOG_SCALE = 1_000_000  # 1e-6 grid for pinned ln/exp values


def pin_units(x: Column, scale: int = LOG_SCALE) -> Column:
    """BIGINT units of a transcendental-bearing double expression on a
    shared 1/scale grid: floor(x*scale + 0.5). Use on the ln/exp value
    itself, BEFORE any multiplication by counts, so cross-engine libm
    ulps cannot be amplified past the grid spacing."""
    return F.floor(x * F.lit(float(scale)) + F.lit(0.5))


def det_log_units(x: Column, scale: int = LOG_SCALE) -> Column:
    """ln(x) pinned to the shared 1/scale grid (BIGINT units)."""
    return pin_units(F.log(x), scale)


def pin_units_sql(x: str, scale: int = LOG_SCALE) -> str:
    """DuckDB mirror of pin_units."""
    return f"CAST(floor(({x}) * {float(scale)!r} + 0.5) AS BIGINT)"


def det_log_units_sql(x: str, scale: int = LOG_SCALE) -> str:
    """DuckDB mirror of det_log_units."""
    return pin_units_sql(f"ln({x})", scale)


# --- exact integer rounding of grid-unit means ---------------------------
#
# Rounding a DOUBLE with round(x, 6) after dividing a pinned-grid sum by
# a count is the last remaining cross-engine hazard: when sum/n lands
# EXACTLY on a .5e-6 tie (which the 1e-6 pin grid manufactures whenever
# 2*sum/n is an odd integer — measured 2/500 unigram and 5/500 bigram
# rows at sf0.01, VERDICT r7 "What's wrong" #1), Spark's BigDecimal
# HALF_UP and DuckDB's float-path round() can resolve the tie
# differently. grid_mean removes the tie entirely: the 6dp rounding is
# computed in exact integer arithmetic — half-away-from-zero on the
# grid units themselves — and only the final units/scale division is
# IEEE (one correctly-rounded op on identical integers → bit-identical).


def grid_mean(sum_units: Column, n: Column, scale: int = LOG_SCALE) -> Column:
    """Exact half-away-from-zero mean of fixed-point grid units:
    round(sum_units / n) computed in integer arithmetic, emitted as
    DOUBLE units/scale. ``sum_units`` may be BIGINT or DECIMAL(38,0)
    (cast up internally); ``n`` must be a positive integer count.

    The quotient k = floor((2*|S| + n) / (2*n)) is built as
    (a - a % b) / b on DECIMAL — a - a%b is exactly divisible, so the
    decimal division is exact (no scale-6 HALF_UP hazard)."""
    s = sum_units.cast("decimal(38,0)")
    a = F.abs(s) * 2 + n
    b = n * 2
    k = ((a - a % b) / b).cast("long")
    sign = F.when(s < 0, F.lit(-1)).otherwise(F.lit(1))
    return (sign * k).cast("double") / F.lit(float(scale))


def pin_round6(x: Column) -> Column:
    """Engine-independent replacement for ``round(x, 6)`` on a DOUBLE:
    half-away-from-zero computed as floor(|x|·1e6 + 0.5) — one IEEE
    multiply plus an exact floor on the binary double, so every engine
    resolves boundary values identically. Spark's round (BigDecimal of
    the shortest decimal repr, HALF_UP) and a float-path round() can
    disagree exactly ON .5e-6 ties — dyadic rationals like 25/128 hit
    them (tools/tie_audit.py). Requires |x| < 2^53/1e6 ≈ 9e9."""
    u = F.floor(F.abs(x) * F.lit(1e6) + F.lit(0.5))
    return F.when(x < 0, -u).otherwise(u) / F.lit(1e6)


def pin_round6_sql(x: str) -> str:
    """DuckDB mirror of pin_round6 — same IEEE ops, same tie rule."""
    return (f"(CASE WHEN ({x}) < 0 THEN -floor(-({x}) * 1000000.0 + 0.5)"
            f" ELSE floor(({x}) * 1000000.0 + 0.5) END / 1000000.0)")


def grid_mean_sql(s: str, n: str, scale: int = LOG_SCALE) -> str:
    """DuckDB mirror of grid_mean. ``s`` should be a HUGEINT-capable
    integer sum expression, ``n`` a positive integer count; `//` on
    positive operands is the same floor((2|S|+n)/(2n))."""
    return (f"(CAST(CASE WHEN ({s}) < 0"
            f" THEN -((-2*({s}) + ({n})) // (2*({n})))"
            f" ELSE (2*({s}) + ({n})) // (2*({n})) END AS DOUBLE)"
            f" / {float(scale)!r})")
