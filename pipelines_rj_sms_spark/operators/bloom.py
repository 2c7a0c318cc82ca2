"""Bloom-filter semi-join prefiltering.

The classic distributed-join reduction (public technique; Spark core
has an internal-only `BloomFilterAggregate` used by its runtime-filter
rule, not exposed to SQL/DataFrame users): when the filtering side of a
semi-join is too large to broadcast as a hash relation but its *Bloom
filter* is compact, build the filter with one aggregation, broadcast
the bitmap, and drop non-matching probe rows BEFORE the shuffle. At
100 TB this turns "shuffle the fact table to check membership" into
"scan + projection, then shuffle only survivors" — the survivor
fraction is the join selectivity, often single-digit percent.

Everything is expression-only: k seeded xxhash64 probes set/check bits
in an array<bigint> bitmap; the bitmap is built by a (word → bit_or)
hash aggregation of at most m/64 rows and collapsed to ONE scalar row
(the same scalar-broadcast shape as the count-min table in
operators/sketches.py). Guarantee: NO false negatives ever; false
positives at the textbook (1-e^{-kn/m})^k rate only cost wasted rows
in the downstream exact join.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD = 64


def suggest_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: m = -n ln p / (ln 2)^2 bits, k = (m/n) ln 2."""
    m = max(_WORD, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + _WORD - 1) // _WORD) * _WORD
    k = max(1, round(m / max(n_keys, 1) * math.log(2)))
    return m, k


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(1000 + i)), F.lit(m_bits))
            for i in range(k)]


def build_bloom(df: DataFrame, key_col: str, m_bits: int = 1 << 20,
                k: int = 7) -> DataFrame:
    """One-row DataFrame holding the Bloom bitmap of ``key_col`` as
    array<bigint> (m_bits/64 words). Build cost: one narrow explode
    (xk) + one bounded hash aggregation (≤ m/64 groups) + one
    map-assembly row. m_bits must be a multiple of 64."""
    if m_bits % _WORD:
        raise ValueError(f"m_bits must be a multiple of {_WORD}: {m_bits}")
    n_words = m_bits // _WORD
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k)))
    words = (
        df.select(pos.alias("_pos"))
        .select((F.col("_pos") / _WORD).cast("long").alias("_w"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"),
                    (F.col("_pos") % _WORD).cast("int")).alias("_b"))
        .groupBy("_w").agg(F.bit_or("_b").alias("_bits"))
    )
    filled = words.agg(
        F.map_from_entries(F.collect_list(F.struct("_w", "_bits")))
        .alias("_m"))
    bitmap = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("_m"), i.cast("long")),
            F.lit(0).cast("long")))
    return filled.select(bitmap.alias("bloom"))


def might_contain(bloom_col: Column, key: Column, m_bits: int,
                  k: int) -> Column:
    """True iff every one of the key's k bits is set (no false
    negatives by construction)."""
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        word = F.get(bloom_col, (p / _WORD).cast("int"))
        bit = F.call_function("shiftleft", F.lit(1).cast("long"),
                              (p % _WORD).cast("int"))
        cond = cond & (word.bitwiseAND(bit) == bit)
    return cond


def bloom_prefilter(big: DataFrame, small: DataFrame, big_key: str,
                    small_key: str, m_bits: int = 1 << 20,
                    k: int = 7) -> DataFrame:
    """``big`` rows whose key *might* appear in ``small`` — a superset
    of the exact semi-join (never drops a true match). The bitmap rides
    in as one broadcast row, so this is a pure projection+filter on the
    probe side: zero probe-side shuffle."""
    bloom = F.broadcast(build_bloom(small, small_key, m_bits, k))
    return (big.join(bloom)
            .filter(might_contain(F.col("bloom"), F.col(big_key), m_bits, k))
            .drop("bloom"))


def bloom_semi_join(big: DataFrame, small: DataFrame, big_key: str,
                    small_key: str, m_bits: int = 1 << 20,
                    k: int = 7) -> DataFrame:
    """EXACT semi-join computed as bloom-prefilter → shuffle only the
    survivors → verify against the real key set. Result is identical to
    ``big.join(small, on=key, how="left_semi")``; the bloom stage just
    keeps the (1 - selectivity) fraction of ``big`` out of the
    Exchange."""
    pre = bloom_prefilter(big, small, big_key, small_key, m_bits, k)
    return pre.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        on=big_key, how="left_semi")
