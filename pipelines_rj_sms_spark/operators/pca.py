"""PCA over embedding columns — dimensionality reduction next to the
PQ/IVF quantizers.

Same coordination shape as the IVF k-means trainer (`similarity.py`):
the DISTRIBUTED part computes exactly the sufficient statistics — the
per-position mean (d rows) and the Gram/covariance sums (d² rows,
bounded by the embedding dimension, never by data) — and the driver
does the d×d eigensolve with numpy (64×64 here; trivial at any corpus
size because d is a model constant). Projection is then EXPRESSION-ONLY:
the learned components are inlined as literal arrays, so encoding
billions of vectors is whole-stage-codegen'd dot products — the same
inlined-literal discipline as the LSH hyperplanes.

Determinism: eigenvectors have a sign ambiguity; each component's sign
is fixed by making its largest-|coordinate| entry positive, so two
training runs (and the unit test's independent numpy PCA) agree
exactly. The explained-variance ratios order components descending.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.numeric import det_sum_big

__all__ = ["pca_train", "pca_project"]


def pca_train(df: DataFrame, vec_col: str,
              k: int) -> tuple[list[list[float]], list[float], list[float]]:
    """Fit PCA; returns ``(components, mean, explained_var_ratio)``
    with ``components`` as ``k`` rows of length ``d`` (descending
    eigenvalue order, sign-fixed).

    One pass for n/mean, one for the Gram: positions explode to
    (i, x_i); the upper-triangle products are generated INSIDE a
    single array expression per row (nested indexed transform +
    flatten — no self-join, no row ids) and hash-aggregated, so the
    shuffle carries at most d + d(d+1)/2 keyed accumulator rows after
    map-side combine. Covariance derives from the Gram sums and the
    mean on the driver (d² floats), never a second data pass.
    """
    base = df.select(F.col(vec_col).cast("array<double>").alias("_v"))
    base = base.persist()
    # det_sum_big: the sufficient statistics are double sums whose
    # combine order must not perturb the trained model (the eigensolve
    # amplifies a last-ulp difference into sign/rotation wiggle);
    # quantized decimal accumulation is exact at any group size
    # (functions/numeric.py)
    ex = base.select(F.posexplode("_v").alias("_i", "_x"))
    pos = ex.groupBy("_i").agg(det_sum_big(F.col("_x")).alias("_s"),
                               F.count("*").alias("_n"))
    stats = {r["_i"]: (r["_s"], r["_n"]) for r in pos.collect()}
    d = len(stats)
    n = stats[0][1]
    mean = np.array([stats[i][0] / n for i in range(d)])

    # (i, j>=i, x_i*x_j) built row-locally: outer indexed transform
    # over the vector, inner transform over its tail slice — emits
    # exactly the upper triangle, whole-stage-codegen'd, zero shuffle
    # before the d(d+1)/2-key hash agg
    tri = F.flatten(F.transform(
        "_v",
        lambda xi, i: F.transform(
            F.slice(F.col("_v"), i + 1, d),
            lambda xj, o: F.struct(
                i.alias("_i"), (i + o).alias("_j"),
                (xi * xj).alias("_p")))))
    gram_rows = (base.select(F.explode(tri).alias("_t"))
                 .groupBy(F.col("_t._i").alias("_i"),
                          F.col("_t._j").alias("_j"))
                 .agg(det_sum_big(F.col("_t._p")).alias("_g"))
                 .collect())
    g = np.zeros((d, d))
    for r in gram_rows:
        g[r["_i"], r["_j"]] = r["_g"]
        g[r["_j"], r["_i"]] = r["_g"]
    cov = g / n - np.outer(mean, mean)
    base.unpersist()

    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    ratios = []
    total = float(np.sum(np.clip(vals, 0, None))) or 1.0
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        ratios.append(max(float(vals[idx]), 0.0) / total)
    return comps, [float(x) for x in mean], ratios


def pca_project(df: DataFrame, id_col: str, vec_col: str,
                components: list[list[float]], mean: list[float],
                out_col: str = "pca", round_to: int | None = 6,
                flat: bool = False) -> DataFrame:
    """Project vectors onto the learned components — expression-only:
    centered dot products against literal component arrays (no UDF, no
    model join; the model IS the plan).

    ``flat=True`` emits one scalar DOUBLE column per component
    (``pc1..pck``) instead of a single array column — the form
    downstream tabular consumers (and value-hash comparators that
    can't canonicalize list cells) want; identical math either way.
    """
    centered = F.zip_with(F.col(vec_col).cast("array<double>"),
                          F.array(*[F.lit(m) for m in mean]),
                          lambda x, m: x - m)
    dots = []
    for comp in components:
        carr = F.array(*[F.lit(c) for c in comp])
        dot = F.aggregate(
            F.zip_with(centered, carr, lambda x, c: x * c),
            F.lit(0.0), lambda acc, v: acc + v)
        dots.append(F.round(dot, round_to) if round_to else dot)
    if flat:
        return df.select(F.col(id_col),
                         *[d.alias(f"pc{i + 1}")
                           for i, d in enumerate(dots)])
    return df.select(F.col(id_col), F.array(*dots).alias(out_col))
