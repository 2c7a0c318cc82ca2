"""Single-pass column profiling (the Deequ/dbt-profile analog).

The reference's quality checks are per-table point probes (row counts,
freshness — quality/checks.py covers those); what an operator running
a 100 TB lake also wants is a *profile*: per-column null rates,
cardinalities, dominant values, bounds — the input to schema-contract
drift alerts and to "is this ingestion sane" eyeballing.

Scale shape: the naive spelling runs one job per column per metric
(Spark's own `df.summary()` does a full pass per statistics family and
nothing for top values). Here the table is UNPIVOTED once —
explode(array(struct(name, value)...)) is a narrow map — and every
metric for every column comes out of ONE (column, value) hash
aggregation plus two tiny follow-ups on the already-collapsed counts
(at most sum-of-cardinalities rows). One wide scan, one real shuffle,
regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame,
                  columns: list[str] | None = None) -> DataFrame:
    """One row per profiled column:

    - ``n_rows`` / ``n_nulls`` — total and null observation counts;
    - ``n_distinct`` — exact distinct non-null values;
    - ``top_value`` / ``top_count`` — the modal non-null value (ties
      break on the larger value, so the profile is deterministic);
    - ``min_value`` / ``max_value`` — lexicographic bounds of the
      string rendering (documented as such: for numeric-typed audits
      keep the column typed and use an ordinary agg).

    Values are profiled in their string rendering, which makes one
    unpivoted pass possible across heterogeneous column types — the
    trade Deequ makes for its frequent-items pass as well. For
    unbounded-cardinality columns swap `n_distinct` for a sketch
    (operators/sketches.py) upstream; the exact profile is the oracle
    path.
    """
    cols = columns or df.columns
    pairs = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("value"))
        for c in cols]))
    counts = (df.select(pairs.alias("_p"))
              .select("_p.column", "_p.value")
              .groupBy("column", "value")
              .agg(F.count("*").alias("cnt")))
    # modal value via max(struct(cnt, value)) — one aggregation instead
    # of a window + self-join, so the counts subplan (and the wide
    # source scan under it) is consumed exactly once
    top = F.max(F.when(
        F.col("value").isNotNull(),
        F.struct(F.col("cnt"), F.col("value"))))
    return counts.groupBy("column").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt"))
              .otherwise(F.lit(0))).alias("n_nulls"),
        F.count(F.when(F.col("value").isNotNull(), F.lit(1)))
        .alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        top["value"].alias("top_value"),
        top["cnt"].alias("top_count"),
    )
