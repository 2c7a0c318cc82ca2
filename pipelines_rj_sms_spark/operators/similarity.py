"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (BASELINE.json): brute-force cosine
top-k as the exact baseline, plus an LSH-bucketed variant as the scale
path. Dot products are expression-only (zip_with + aggregate) so they run
in the JVM; no Python per row.

Scale notes:
- brute-force against ONE query vector is a narrow map + top-k — fine at
  any corpus size (top-k via orderBy+limit is a per-partition partial
  top-k then a tiny driver merge — no full sort materialized thanks to
  Spark's TakeOrderedAndProject).
- all-pairs similarity must never be a cross join: the LSH variant
  buckets by random-hyperplane sign bits and only joins within buckets.
"""

from __future__ import annotations

# module-level so pyspark can resolve stringified `pd.Series` type
# hints of pandas UDFs against these globals
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.numeric import det_sum


def dot(a: Column, b: Column) -> Column:
    """Expression-only dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; zero vectors yield null (try_divide) rather
    than an ANSI divide-by-zero error — padding/empty embeddings are a
    data reality, not a crash."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_top_k(df: DataFrame, query_vec: list[float], k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      round_to: int | None = None) -> DataFrame:
    """Exact cosine top-k against one query vector.

    Plan shape: scan -> project(similarity) -> TakeOrderedAndProject(k).
    Ties broken by id for determinism; ordering uses the unrounded
    similarity (round_to only affects the reported value).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.col(vec_col).cast("array<double>")
    out = (
        df.select(F.col(id_col), cosine(vec, q).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )
    if round_to is not None:
        out = out.select(id_col, F.round("cosine_sim", round_to).alias("cosine_sim"))
    return out


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy dependency
    at plan-build time, reproducible across runs/executors)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplane projections."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot(vec_col, F.array(*[F.lit(x) for x in p]))
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def lsh_top_k(df: DataFrame, query_vec: list[float], k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding",
              n_planes: int = 8) -> DataFrame:
    """Approximate top-k: hyperplane-LSH prefilter, exact cosine re-rank.

    At 100 TB the bucket filter is a partition-prunable predicate when the
    corpus is written bucketed/partitioned by `lsh_bucket`; here it is a
    pushed-down filter on a derived column. Recall is tunable via
    n_planes (fewer planes = bigger buckets = higher recall).
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)
    vec = F.col(vec_col).cast("array<double>")
    q_bucket_val = 0
    for i, p in enumerate(planes):
        proj = sum(a * b for a, b in zip(p, query_vec))
        if proj > 0:
            q_bucket_val |= 1 << i
    with_bucket = df.withColumn("_bucket", lsh_bucket(vec, planes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        with_bucket.filter(F.col("_bucket") == q_bucket_val)
        .select(F.col(id_col), cosine(vec, q).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def train_ivf_centroids(df: DataFrame, vec_col: str = "embedding",
                        k: int = 16, iters: int = 10, sample: int = 10_000,
                        seed: int = 42) -> list[list[float]]:
    """IVF coarse quantizer: k-means on a bounded driver sample.

    Sampling to the driver is the standard IVF training recipe (FAISS
    trains on a subset too) — ``sample`` bounds driver memory regardless
    of corpus size; assignment (the data-sized step) stays distributed.
    """
    import numpy as np

    n = df.count()
    frac = min(1.0, sample / max(n, 1))
    rows = (df.sample(frac, seed=seed) if frac < 1.0 else df) \
        .select(vec_col).limit(sample).collect()
    x = np.array([[float(v) for v in r[0]] for r in rows])
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        # assign to nearest centroid by cosine (normalize once)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = (xn @ cn.T).argmax(axis=1)
        for j in range(len(cents)):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def assign_ivf_cells(df: DataFrame, centroids: list[list[float]],
                     vec_col: str = "embedding",
                     cell_col: str = "ivf_cell") -> DataFrame:
    """Distributed cell assignment: argmax cosine over centroid literals
    (expression-only — centroids are plan constants, no UDF, no shuffle).
    At scale, write the corpus partitioned/bucketed by ``cell_col`` so a
    probe prunes to nprobe cells."""
    import math

    vec = F.col(vec_col).cast("array<double>")
    scored = F.array(*[
        F.struct(
            (dot(vec, F.array(*[F.lit(x) for x in c])) /
             (norm(vec) * math.sqrt(sum(v * v for v in c)))).alias("sim"),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(centroids)
    ])
    return df.withColumn(cell_col, F.array_max(scored)["cell"])


def ivf_candidate_pairs(x_df: DataFrame, y_df: DataFrame,
                        centroids: list[list[float]], nprobe: int = 2,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Blocked (x_id, y_id) candidate pairs for cross-corpus mining
    (the ``candidates=`` input of :func:`bitext_margin_pairs`): the y
    side is indexed by its single nearest IVF cell, each x probes its
    ``nprobe`` nearest cells, and one equi-join on the cell id yields
    the candidates — never a cross product, and neither corpus is
    broadcast. Cell scoring is expression-only (centroid literals),
    like :func:`assign_ivf_cells`; the x-side explode is x``nprobe``
    on narrow (id, cell) rows.
    """
    import math

    vec = F.col(vec_col).cast("array<double>")

    def cell_scores():
        return F.array(*[
            F.struct(
                (dot(vec, F.array(*[F.lit(v) for v in c])) /
                 (norm(vec) * math.sqrt(sum(v * v for v in c))))
                .alias("sim"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ])

    y_cells = y_df.select(F.col(id_col).alias("y_id"),
                          F.array_max(cell_scores())["cell"].alias("_cell"))
    probes = F.slice(F.reverse(F.array_sort(cell_scores())), 1, nprobe)
    x_cells = (x_df
               .select(F.col(id_col).alias("x_id"),
                       F.explode(probes).alias("_p"))
               .select("x_id", F.col("_p")["cell"].alias("_cell")))
    return x_cells.join(y_cells, "_cell").select("x_id", "y_id")


def ivf_top_k(df: DataFrame, centroids: list[list[float]],
              query_vec: list[float], k: int = 10, nprobe: int = 4,
              id_col: str = "vec_id", vec_col: str = "embedding",
              cell_col: str = "ivf_cell") -> DataFrame:
    """IVF probe: exact cosine top-k within the nprobe nearest cells.

    ``df`` should already carry ``cell_col`` (from assign_ivf_cells — at
    scale, precomputed at write time so the filter partition-prunes).
    """
    import math

    qn = math.sqrt(sum(v * v for v in query_vec))
    sims = []
    for i, c in enumerate(centroids):
        cn = math.sqrt(sum(v * v for v in c))
        sims.append((sum(a * b for a, b in zip(c, query_vec)) / (cn * qn), i))
    probe_cells = [i for _, i in sorted(sims, reverse=True)[:nprobe]]
    return brute_force_top_k(
        df.filter(F.col(cell_col).isin(probe_cells)), query_vec, k,
        id_col=id_col, vec_col=vec_col,
    )


def embedding_near_dupes(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         threshold: float = 0.95,
                         n_planes: int = 8) -> DataFrame:
    """All-pairs near-duplicates by cosine >= threshold, LSH-bucketed.

    Self-join only within hyperplane buckets (id_a < id_b), then exact
    cosine verification — the standard blocked near-dup shape that avoids
    the O(n^2) cross product.
    """
    first = df.select(vec_col).first()
    dim = len(first[0]) if first else 0
    planes = _hyperplanes(dim, n_planes)
    vec = F.col(vec_col).cast("array<double>")
    bucketed = df.select(
        F.col(id_col), vec.alias("_v"), lsh_bucket(vec, planes).alias("_bucket")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, (F.col("a._bucket") == F.col("b._bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a._v"), F.col("b._v")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def batch_top_k(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id",
                query_vec_col: str = "embedding",
                round_to: int | None = None) -> DataFrame:
    """Exact cosine top-k for a SET of query vectors in one pass over
    the corpus (the batched form of brute_force_top_k — N probes cost
    one corpus scan, not N).

    Plan shape: corpus x broadcast(queries) -> project(similarity) ->
    two-stage per-query top-k. The broadcast nested loop is deliberate
    and bounded: |queries| rows per corpus row, the standard brute-force
    batch-ANN layout, and what is shuffled afterwards is the narrow
    (query, id, sim) triplet — embeddings never move. The top-k runs in
    two windows: first over (input-partition id, query) — spreading the
    cut across n_partitions * |queries| reducers instead of |queries|
    hot keys — then the final window over query alone sees at most
    k * n_partitions rows per query, never the corpus.
    """
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(query_vec_col).cast("array<double>").alias("_qvec")))
    vec = F.col(vec_col).cast("array<double>")
    scored = (corpus.select(id_col, vec.alias("_v"))
              .join(q)
              .select(F.col("_qid").alias(query_id_col), F.col(id_col),
                      cosine(F.col("_v"), F.col("_qvec")).alias("cosine_sim")))
    from pyspark.sql import Window
    local = Window.partitionBy(
        F.spark_partition_id(), query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col))
    pruned = (scored.withColumn("_lrk", F.row_number().over(local))
              .filter(F.col("_lrk") <= k).drop("_lrk"))
    final = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col))
    out = (pruned.withColumn("_rk", F.row_number().over(final))
           .filter(F.col("_rk") <= k).drop("_rk"))
    if round_to is not None:
        out = out.select(query_id_col, id_col,
                         F.round("cosine_sim", round_to).alias("cosine_sim"))
    return out


# ------------------------------------------------------- product quantization

def train_pq_codebook(df: DataFrame, vec_col: str = "embedding",
                      m: int = 8, ksub: int = 16, iters: int = 10,
                      sample: int = 10_000, seed: int = 42,
                      ) -> list[list[list[float]]]:
    """PQ codebook: independent L2 k-means per subspace on a bounded
    driver sample (the FAISS training recipe — same cost class as
    train_ivf_centroids). Returns codebook[j] = ksub centroids of
    dim/m floats each. Encoding and scoring (the data-sized steps)
    stay distributed.
    """
    import numpy as np

    n = df.count()
    frac = min(1.0, sample / max(n, 1))
    rows = (df.sample(frac, seed=seed) if frac < 1.0 else df) \
        .select(vec_col).limit(sample).collect()
    x = np.array([[float(v) for v in r[0]] for r in rows])
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    book: list[list[list[float]]] = []
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        cents = xs[rng.choice(len(xs), size=min(ksub, len(xs)),
                              replace=False)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        book.append([[float(v) for v in c] for c in cents])
    return book


def pq_encode(df: DataFrame, codebook: list[list[list[float]]],
              vec_col: str = "embedding",
              code_col: str = "pq_code") -> DataFrame:
    """Expression-only PQ encode: per subspace, argmin L2 over the
    centroid literals (ties -> lowest code). The codebook is a plan
    constant, so the whole encode is one codegen'd projection — right
    for small/medium ksub; for production-sized books (ksub=256) use
    :func:`pq_encode_pandas`, the Arrow-vectorized twin.

    Codes are ~m bytes per vector vs 4*dim for the raw floats — the
    compressed corpus an ADC scan reads instead of embeddings.
    """
    m = len(codebook)
    sub = len(codebook[0][0])
    vec = F.col(vec_col).cast("array<double>")

    def code_for(j: int):
        subvec = F.slice(vec, j * sub + 1, sub)
        cands = F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with(subvec, F.array(*[F.lit(v) for v in c]),
                               lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(ci).alias("c"),
            )
            for ci, c in enumerate(codebook[j])
        ])
        return F.array_min(cands)["c"]

    return df.withColumn(code_col, F.array(*[code_for(j) for j in range(m)]))


def pq_encode_pandas(df: DataFrame, codebook: list[list[list[float]]],
                     vec_col: str = "embedding",
                     code_col: str = "pq_code") -> DataFrame:
    """Arrow-vectorized PQ encode for production-sized codebooks: numpy
    argmin per batch (the sanctioned slow path — one python hop, all
    math vectorized). Semantics identical to :func:`pq_encode`."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    book = [np.array(b) for b in codebook]
    m = len(book)
    sub = book[0].shape[1]

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            xs = x[:, j * sub:(j + 1) * sub]
            d2 = ((xs[:, None, :] - book[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(code_col, encode(F.col(vec_col).cast("array<double>")))


def pq_adc_top_k(df: DataFrame, codebook: list[list[list[float]]],
                 query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id",
                 code_col: str = "pq_code",
                 round_to: int | None = None) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query builds one
    m x ksub inner-product lookup table (driver-side, tiny); each row's
    approximate dot product is m table lookups — the corpus scan reads
    only the codes, never the embeddings. Returns (id, approx_dot)
    ordered desc, ties to the id.
    """
    m = len(codebook)
    sub = len(codebook[0][0])
    lut = [
        [sum(c[i] * query_vec[j * sub + i] for i in range(sub))
         for c in codebook[j]]
        for j in range(m)
    ]
    score = None
    for j in range(m):
        term = F.element_at(F.array(*[F.lit(v) for v in lut[j]]),
                            F.col(code_col)[j] + 1)
        score = term if score is None else score + term
    # PQ scores are heavily tied (ksub^m distinct values at most), so
    # round BEFORE ordering when the caller wants reproducible output:
    # ties then break purely on the id, immune to last-ulp summation
    # differences across engines/partitionings
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        df.select(id_col, score.alias("approx_dot"))
        .orderBy(F.col("approx_dot").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_pq_top_k(df: DataFrame, centroids: list[list[float]],
                 codebook: list[list[list[float]]],
                 query_vec: list[float], k: int = 10, nprobe: int = 4,
                 id_col: str = "vec_id", cell_col: str = "ivf_cell",
                 code_col: str = "pq_code",
                 round_to: int | None = None) -> DataFrame:
    """IVFADC: the classic two-level ANN layout — IVF cells prune the
    candidate set (partition pruning when the corpus is written
    partitioned by cell), then the ADC lookup-table scan scores PQ
    codes. ``df`` carries ``cell_col`` and ``code_col`` precomputed at
    write time (assign_ivf_cells + pq_encode); neither step re-reads
    embeddings at query time.
    """
    import math

    qn = math.sqrt(sum(v * v for v in query_vec))
    sims = []
    for i, c in enumerate(centroids):
        cn = math.sqrt(sum(v * v for v in c))
        sims.append((sum(a * b for a, b in zip(c, query_vec)) / (cn * qn), i))
    probe_cells = [i for _, i in sorted(sims, reverse=True)[:nprobe]]
    return pq_adc_top_k(
        df.filter(F.col(cell_col).isin(probe_cells)), codebook,
        query_vec, k, id_col=id_col, code_col=code_col, round_to=round_to)


def lsh_multiprobe_top_k(df: DataFrame, query_vec: list[float],
                         k: int = 10, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         n_planes: int = 8) -> DataFrame:
    """Multi-probe hyperplane LSH: scan the query's bucket PLUS every
    Hamming-distance-1 neighbor (each sign bit flipped once).

    Single-bucket LSH loses exactly the neighbors that fall on the
    other side of one hyperplane — the dominant miss mode. Probing the
    n_planes+1 nearest buckets recovers most of that recall while still
    scanning only ~(n_planes+1)/2^n_planes of the corpus (vs 1/2^n for
    single-probe). Same layout as lsh_top_k: with the corpus written
    bucketed by `lsh_bucket`, the probe set is a partition-prunable IN
    filter.
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)
    q_bucket = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(p, query_vec)) > 0:
            q_bucket |= 1 << i
    probes = [q_bucket] + [q_bucket ^ (1 << i) for i in range(n_planes)]
    vec = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("_bucket", lsh_bucket(vec, planes))
        .filter(F.col("_bucket").isin(probes))
        .select(F.col(id_col), cosine(vec, q).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _bound_cells(slim: DataFrame, id_col: str, cell_col: str,
                 max_cell_size: int, on_oversize: str) -> DataFrame:
    """semantic_dedup's cell-size guard (see its docstring): verify no
    cell exceeds ``max_cell_size`` (one hash agg + a 1-row driver
    probe — the bounded-collect class) and either raise naming the
    worst offender or slice oversized cells into hard-capped
    sub-cells along the component-sum projection order."""
    from pyspark.sql import Window

    if max_cell_size < 2:
        raise ValueError(
            f"max_cell_size must be >= 2: {max_cell_size}")
    worst = (slim.filter(F.col(cell_col).isNotNull())
             .groupBy(cell_col).agg(F.count("*").alias("_n"))
             .filter(F.col("_n") > max_cell_size)
             .orderBy(F.col("_n").desc(), F.col(cell_col))
             .limit(1).collect())
    if not worst:
        return slim
    if on_oversize == "raise":
        r = worst[0]
        raise ValueError(
            f"semantic_dedup cell {r[cell_col]!r} holds {r['_n']} rows"
            f" > max_cell_size={max_cell_size}: the within-cell pair"
            f" join would cost |cell|^2. Re-cluster with larger k"
            f" (k ~ n/target_cell_size) or pass on_oversize='split'"
            f" for hard-capped bounded-recall slices.")
    proj = F.aggregate(F.col("_v"), F.lit(0.0), lambda a, x: a + x)
    w = Window.partitionBy(cell_col).orderBy(proj, F.col(id_col))
    sub = F.floor((F.row_number().over(w) - 1) / F.lit(max_cell_size))
    return slim.withColumn(
        cell_col,
        F.when(F.col(cell_col).isNull(),
               F.lit(None).cast("string"))
        .otherwise(F.concat(F.col(cell_col).cast("string"),
                            F.lit("#"), sub.cast("string"))))


def semantic_dedup(df: DataFrame, centroids: list[list[float]] | None,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   threshold: float = 0.9,
                   cell_col: str = "ivf_cell",
                   cells_df: DataFrame | None = None,
                   max_cell_size: int | None = None,
                   on_oversize: str = "raise") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embeddings, then drop every
    row that has a LOWER-id neighbor with cosine >= ``threshold``
    inside the same cluster cell. Returns the surviving rows.

    The keep-lowest-id rule makes the result deterministic and
    single-pass — no iterative connected components: within a near-dup
    clique the minimum id survives, everything else has that minimum as
    a qualifying lower-id neighbor and drops.

    Scale shape: cell assignment is expression-only (centroid literals,
    no shuffle); pair enumeration is an equi-join on the cell id, so
    cost is O(sum of cell sizes squared), never corpus x corpus — pick
    k ~ sqrt(n) cells (the SemDeDup recipe) to bound cell fan-out, and
    feed `train_ivf_centroids` output at scale. The drop list carries
    only ids; survivors come from one left_anti join.

    ``cells_df``: precomputed (id_col, cell_col) assignments replace
    the centroid-literal cell step — feed :func:`kmeans_lloyd` output
    for the paper's exact recipe (whole-corpus k-means cells) instead
    of the sampled-IVF approximation. ``centroids`` is ignored then.
    The join is a LEFT join: a row of ``df`` missing from ``cells_df``
    is exempt from dedup and passes through as a SURVIVOR (its NULL
    cell matches nothing in the self-join), never silently dropped —
    a partial assignment frame weakens the dedup, it cannot lose data.

    ``max_cell_size``: the within-cell pair join costs |cell|² per
    cell — with a caller-chosen small k (or a degenerate clustering
    that funnels the corpus into one cell) that silently becomes
    corpus², the exact footgun the cell structure exists to prevent.
    Rule of thumb: pick k ∝ n / target_cell_size (SemDeDup's own
    deployment used ~11k cells for ~100M docs ≈ 10k-row cells). The
    guard checks actual cell sizes (one hash agg + a 1-row probe)
    and, for cells over the cap, either:

    - ``on_oversize="raise"`` (default): ValueError naming the worst
      cell — the caller picked k too small for the corpus; or
    - ``on_oversize="split"``: bounds the cost by slicing each
      oversized cell into ``ceil(size/max_cell_size)`` sub-cells of
      at most ``max_cell_size`` rows, ordered by the vectors'
      projection onto the all-ones direction (a deterministic 1-d
      locality key: near-duplicate vectors have near-identical
      component sums, so they land in the same slice except at slice
      boundaries) — the bounded-recall analogue of the paper's
      hierarchical re-cluster fallback, with a HARD cost cap. Pairs
      straddling a slice boundary are not compared (documented
      recall loss; shrink k upstream instead of leaning on the
      guard). The slicing window is keyed by the cell id, so its
      shuffle skew is bounded by the largest cell's rows — the same
      rows the pair join would otherwise square.
    """
    if on_oversize not in ("raise", "split"):
        raise ValueError(f"on_oversize must be raise|split: {on_oversize}")
    if cells_df is not None:
        cells = df.join(
            cells_df.select(F.col(id_col), F.col(cell_col)),
            id_col, "left")
    else:
        cells = assign_ivf_cells(df, centroids, vec_col, cell_col)
    vec = F.col(vec_col).cast("array<double>")
    slim = cells.select(F.col(id_col), vec.alias("_v"), F.col(cell_col))
    if max_cell_size is not None:
        slim = _bound_cells(slim, id_col, cell_col,
                            max_cell_size, on_oversize)
    a, b = slim.alias("a"), slim.alias("b")
    drops = (
        a.join(b, (F.col(f"a.{cell_col}") == F.col(f"b.{cell_col}"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .filter(cosine(F.col("a._v"), F.col("b._v")) >= F.lit(threshold))
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return df.join(drops, id_col, "left_anti")


def label_centroids(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label mean vector, computed distributively: posexplode to
    (label, pos, val) — a narrow map — then one hash aggregation per
    (label, pos) and an ordered reassembly per label. Shuffle rows are
    24-byte triplets; no vector ever sits whole in aggregation state,
    so dimension and label cardinality scale independently (this is
    also the k-means update step IVF training uses, generalized to any
    label column)."""
    pe = df.select(
        F.col(label_col).alias("_lbl"),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("_pos", "_val"))
    # det_sum/count, not avg: centroid coordinates feed rounded cosine
    # comparisons downstream, so the mean must be combine-order-exact
    # (functions/numeric.py)
    per = pe.groupBy("_lbl", "_pos").agg(
        (det_sum(F.col("_val")) / F.count("_val")).alias("_avg"))
    return (per.groupBy("_lbl")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_avg"))),
                lambda s: s["_avg"]).alias("centroid"))
            .select(F.col("_lbl").alias(label_col), "centroid"))


def cluster_cohesion(df: DataFrame, label_col: str = "label",
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Cluster-quality report: each vector's cosine to its own label
    centroid, aggregated to per-label (n_vectors, mean_cos, min_cos).
    A label whose mean cohesion drops release-over-release is drifting;
    a low min flags mislabeled members. Centroids ride back broadcast
    (labels ≪ rows) so scoring is a projection over the vectors."""
    cents = label_centroids(df, label_col, vec_col)
    joined = df.join(F.broadcast(cents), label_col)
    cos = cosine(F.col(vec_col).cast("array<double>"), F.col("centroid"))
    return (joined
            .select(label_col, cos.alias("_cos"))
            .groupBy(label_col)
            .agg(F.count("*").alias("n_vectors"),
                 (det_sum(F.col("_cos")) / F.count("*"))
                 .alias("mean_cos"),
                 F.min("_cos").alias("min_cos")))


def rrf_fuse(rankings: list[DataFrame], id_col: str,
             score_cols: list[str], rrf_k: int = 60,
             top: int = 10) -> DataFrame:
    """Hybrid-retrieval fusion by reciprocal rank (Cormack, Clarke &
    Büttcher 2009, public): each input ranking contributes
    1/(rrf_k + rank) per candidate; candidates missing from a ranking
    simply contribute nothing. The standard RAG recipe for combining
    lexical (BM25) and dense (embedding cosine) retrieval without
    score calibration — ranks are scale-free.

    CONTRACT: inputs are top-k CANDIDATE LISTS (tens to thousands of
    rows — the upstream retrievers did the data-scale work), so ranks
    come from an unpartitioned row_number window: a deliberate
    single-partition sort over k rows, not a corpus-scale operation.
    Ranks order by (score desc, id asc) for determinism. Returns
    (id, rrf_score, n_rankers) — n_rankers = how many lists surfaced
    the candidate (the agreement signal).
    """
    from pyspark.sql import Window

    parts = []
    for df, score_col in zip(rankings, score_cols):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        parts.append(df.select(
            F.col(id_col),
            F.row_number().over(w).alias("_rank")))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    # plain SUM is safe here (no det_sum needed): each candidate has at
    # most len(rankings) addends — 2 for the standard lexical+dense
    # fusion — and IEEE addition of two doubles is commutative, so no
    # combine order exists that changes the value. Revisit only if
    # fusing 3+ rankings where (a+b)+c vs a+(b+c) could differ.
    return (allp.groupBy(id_col)
            .agg(F.round(F.sum(1.0 / (F.lit(float(rrf_k))
                                      + F.col("_rank"))), 6)
                 .alias("rrf_score"),
                 F.count("*").alias("n_rankers"))
            .orderBy(F.col("rrf_score").desc(), F.col(id_col))
            .limit(top))


def scalar_quantize(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column:
    per-vector scale = max|v|/127, codes = floor(v/scale + 0.5) in
    [-127, 127] — 4x smaller than float32 at rest and in shuffle, the
    standard first rung of the vector-compression ladder below PQ.
    Rounding is spelled floor(x + 0.5) (NOT round()) so every engine
    reproduces identical codes — round() half-even/half-up conventions
    differ across engines. Expression-only; zero vectors get scale 1
    and all-zero codes. Returns (id, sq_scale, qvec array<int>).
    """
    v = F.col(vec_col).cast("array<double>")
    maxabs = F.aggregate(v, F.lit(0.0),
                         lambda a, x: F.greatest(a, F.abs(x)))
    scale = F.when(maxabs > 0, maxabs / 127.0).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5))
                    .cast("int"))
    return df.select(F.col(id_col), scale.alias("sq_scale"),
                     q.alias("qvec"))


def sq_top_k(df: DataFrame, query_vec: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_to: int | None = 6) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors: the
    per-vector scales CANCEL in the cosine, so scoring is pure integer
    dot products over the codes — sum(qd*qq) / (|qd| |qq|) — inside
    whole-stage codegen, reading 1/4 the bytes of the float path. The
    query is quantized driver-side with the same floor(+0.5) rule.
    Exact-oracle-checkable because every step is deterministic
    arithmetic; accuracy vs exact cosine is pinned by the unit (int8
    keeps cosine within ~1e-2 for unit-scale embeddings).
    """
    mx = max(abs(float(x)) for x in query_vec) or 1.0
    qs = mx / 127.0
    import math
    qq = [int(math.floor(float(x) / qs + 0.5)) for x in query_vec]
    qarr = F.array(*[F.lit(x) for x in qq])
    qnorm = math.sqrt(sum(x * x for x in qq)) or 1.0

    quant = scalar_quantize(df, id_col, vec_col)
    qd = F.col("qvec")
    dotqq = F.aggregate(F.zip_with(qd, qarr, lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x)
    dnorm = F.sqrt(F.aggregate(
        F.transform(qd, lambda a: (a * a).cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    score = F.when(dnorm > 0, dotqq / (dnorm * F.lit(qnorm))) \
        .otherwise(F.lit(0.0))
    out = (quant.select(F.col(id_col), score.alias("sq_cosine"))
           .orderBy(F.col("sq_cosine").desc(), F.col(id_col))
           .limit(k))
    if round_to is not None:
        out = out.select(id_col,
                         F.round("sq_cosine", round_to).alias("sq_cosine"))
    return out


def rbo_truncated(a_ranked: DataFrame, b_ranked: DataFrame,
                  id_col: str, rank_col: str = "rank",
                  k: int = 10, p: float = 0.9) -> DataFrame:
    """Truncated rank-biased overlap (Webber et al. 2010, public
    formula) between two top-k rankings — "how much do two rankers
    agree, weighted toward the top?", the standard ranker-swap
    regression gate (KS/Jaccard ignore rank position):

        RBO@k = Σ_{d=1..k} (1−p)·p^{d−1} · |A_d ∩ B_d| / d

    Rewritten as a PER-DOC fold: a doc first appearing in both
    prefixes at depth m = max(rank_a, rank_b) contributes the suffix
    weight Σ_{d=m..k} w_d — so one full-outer join of the two k-row
    lists replaces the depth explode. The suffix weights are Python-
    computed literals injected into BOTH engines (no runtime pow —
    libm parity never enters), and the ≤k contributions det-quantize.
    Returns one row: (overlap_at_k, jaccard_at_k, rbo_at_k) @6dp.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    w = [(1.0 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    suffix = [sum(w[m - 1:]) for m in range(1, k + 1)]
    a = a_ranked.select(F.col(id_col).alias("_id"),
                        F.col(rank_col).alias("_ra"))
    b = b_ranked.select(F.col(id_col).alias("_id"),
                        F.col(rank_col).alias("_rb"))
    j = a.join(b, "_id", "full")
    md = F.greatest(F.coalesce(F.col("_ra"), F.lit(k + 1)),
                    F.coalesce(F.col("_rb"), F.lit(k + 1)))
    contrib = F.lit(0.0)
    for m in range(k, 0, -1):
        contrib = F.when(md == m, F.lit(suffix[m - 1])) \
            .otherwise(contrib)
    both = (md <= k).cast("long")
    agg = j.agg(F.sum(both).alias("_x"),
                F.count("*").alias("_u"),
                det_sum(contrib).alias("_rbo"))
    return agg.select(
        F.col("_x").cast("bigint").alias("overlap_at_k"),
        F.round(F.col("_x").cast("double")
                / F.col("_u").cast("double"), 6).alias("jaccard_at_k"),
        F.round(F.col("_rbo"), 6).alias("rbo_at_k"))


def bitext_margin_pairs(x_df: DataFrame, y_df: DataFrame, k: int = 4,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        mutual: bool = True,
                        min_margin: float | None = None,
                        candidates: DataFrame | None = None) -> DataFrame:
    """Margin-based parallel-pair mining between two embedding sets
    (Artetxe & Schwenk 2019, the public CCMatrix/LASER recipe): a
    candidate pair (x, y) scores cos(x,y) normalized by the average
    similarity of each side's own k-NN neighborhood —
    ``margin = cos / ((avg_kNN(x) + avg_kNN(y)) / 2)`` — which
    suppresses hub vectors that are close to *everything*. With
    ``mutual=True`` (the paper's strongest strategy) a pair survives
    only if each side is the other's argmax-margin candidate.

    Returns (x_id, y_id, cosine_sim, margin) — both values 6dp.

    Scale shape: with ``candidates=None`` candidate generation is two
    :func:`batch_top_k` passes (each one corpus scan) — the exact
    small-|X| default, deliberate bounded query-broadcast. When
    NEITHER side broadcasts (the CCMatrix regime, 10^8 x 10^8), pass
    ``candidates`` — an (x_id, y_id) DataFrame from any blocked
    generator (IVF cell equi-join: :func:`ivf_candidate_pairs`; LSH
    buckets; an external index) — and the whole pipeline becomes
    narrow equi-joins: cosines are computed ONLY for candidate pairs
    (two hash joins to fetch the vectors) and each side's k-NN mean is
    taken over its candidate neighborhood, the standard approximation
    the paper's large-scale deployments make. Everything after is
    narrow (x, y, units) triplets — two hash aggs for the neighborhood
    means, two equi-joins, two row_number windows. Embeddings never
    move past the scoring stage.

    Numeric contract: each cosine is pinned to the 1e-6 grid
    (``pin_units`` BIGINT), neighborhood means are exact integer
    ``grid_mean``s, and the margin is one IEEE expression over those
    exact 6dp operands with ``pin_round6`` output — bit-identical
    across engines/partitionings. Ranking uses the raw margin with id
    tiebreaks.
    """
    from pyspark.sql import Window

    from pipelines_rj_sms_spark.functions.numeric import (
        grid_mean,
        pin_round6,
        pin_units,
    )

    from pipelines_rj_sms_spark.operators.cache import track

    if candidates is not None:
        # Blocked path: score ONLY the injected (x_id, y_id) pairs —
        # two narrow hash joins fetch the vectors, then the pair table
        # (persisted: consumed by both per-side top-k windows) replaces
        # the corpus scans entirely. No broadcast of either side.
        xv = x_df.select(F.col(id_col).alias("x_id"),
                         F.col(vec_col).cast("array<double>").alias("_xv"))
        yv = y_df.select(F.col(id_col).alias("y_id"),
                         F.col(vec_col).cast("array<double>").alias("_yv"))
        scored_cands = track(
            (candidates.select("x_id", "y_id").distinct()
             .join(xv, "x_id").join(yv, "y_id")
             .select("x_id", "y_id",
                     pin_units(cosine(F.col("_xv"), F.col("_yv")))
                     .alias("_u")))
            .persist())
        wxk = Window.partitionBy("x_id").orderBy(
            F.col("_u").desc(), "y_id")
        wyk = Window.partitionBy("y_id").orderBy(
            F.col("_u").desc(), "x_id")
        fwd = (scored_cands.withColumn("_r", F.row_number().over(wxk))
               .filter(F.col("_r") <= k).drop("_r"))
        bwd = (scored_cands.withColumn("_r", F.row_number().over(wyk))
               .filter(F.col("_r") <= k).drop("_r"))
        legs = (scored_cands,)
    else:
        xq = x_df.select(F.col(id_col).alias("query_id"), F.col(vec_col))
        yq = y_df.select(F.col(id_col).alias("query_id"), F.col(vec_col))
        # persist both top-k legs: each is consumed twice (its
        # neighborhood mean AND the candidate union) — without the
        # persist the brute-force corpus scan re-executes per consumer
        # (observed as 3x the BroadcastNestedLoop passes in the audited
        # plan)
        fwd = track((batch_top_k(y_df, xq, k=k, id_col=id_col,
                                 vec_col=vec_col)
                     .select(F.col("query_id").alias("x_id"),
                             F.col(id_col).alias("y_id"),
                             pin_units(F.col("cosine_sim")).alias("_u")))
                    .persist())
        bwd = track((batch_top_k(x_df, yq, k=k, id_col=id_col,
                                 vec_col=vec_col)
                     .select(F.col(id_col).alias("x_id"),
                             F.col("query_id").alias("y_id"),
                             pin_units(F.col("cosine_sim")).alias("_u")))
                    .persist())
        legs = (fwd, bwd)
    ax = fwd.groupBy("x_id").agg(
        grid_mean(F.sum("_u"), F.count("*")).alias("_ax"))
    ay = bwd.groupBy("y_id").agg(
        grid_mean(F.sum("_u"), F.count("*")).alias("_ay"))
    cands = fwd.unionByName(bwd).distinct()
    scored = (cands.join(ax, "x_id").join(ay, "y_id")
              .select("x_id", "y_id", "_u",
                      ((F.col("_u") / F.lit(1e6))
                       / ((F.col("_ax") + F.col("_ay")) / F.lit(2.0))
                       ).alias("_m")))
    if min_margin is not None:
        scored = scored.filter(F.col("_m") >= min_margin)
    if mutual:
        wx = Window.partitionBy("x_id").orderBy(F.col("_m").desc(), "y_id")
        wy = Window.partitionBy("y_id").orderBy(F.col("_m").desc(), "x_id")
        scored = (scored
                  .withColumn("_rx", F.row_number().over(wx))
                  .withColumn("_ry", F.row_number().over(wy))
                  .filter((F.col("_rx") == 1) & (F.col("_ry") == 1))
                  .drop("_rx", "_ry"))
    out = scored.select(
        "x_id", "y_id",
        (F.col("_u") / F.lit(1e6)).alias("cosine_sim"),
        pin_round6(F.col("_m")).alias("margin"))
    return track(out, *legs)


# --- distributed Lloyd's k-means (oracle-exact) ---------------------------


def kmeans_lloyd(df: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 8,
                 n_iter: int = 4) -> DataFrame:
    """Fully distributed Lloyd's k-means over an embedding column —
    the whole-corpus counterpart of :func:`train_ivf_centroids`
    (which trains on a bounded driver sample, the FAISS recipe). Use
    this when the sample would bias the quantizer or when the cluster
    assignment itself IS the product (corpus bucketing for SemDeDup /
    diversity mixes). Returns (id, cluster, d2): the final hard
    assignment and its squared L2 distance (1e-6-pinned).

    Bit-deterministic on any engine at any partitioning:

    - seeds are the ``k`` lowest-id vectors, every dimension pinned to
      the 1e-6 grid; cluster index = rank of the seed id;
    - distances fold left over the dimension array (``zip_with`` +
      ``aggregate`` — fixed order, so the IEEE sum is reproducible,
      unlike a SUM over an exploded frame);
    - assignment is ``min(struct(d2, cluster))`` — one hash agg, ties
      break on the lower cluster id, never a sort window;
    - centroid updates are exact: per-(cluster, dim) BIGINT sums of
      1e-6-pinned values, divided with ``grid_mean``'s half-away
      integer rounding, so every new centroid lands on the grid;
    - empty clusters keep their previous centroid (documented).

    Scale shape (the HITS/logreg posture): the pinned design frame is
    persisted once; each iteration is one broadcast of the k-row
    centroid frame under every vector (the sanctioned |C|-row pattern
    — cost k*n narrow rows, never data x data), one assignment hash
    agg, and one (cluster, dim)-keyed update agg bounded by k*dims
    output rows. O(n_iter) shuffles; nothing driver-side.
    """
    from pyspark.sql import Window

    from pipelines_rj_sms_spark.functions.numeric import (grid_mean,
                                                          pin_units)
    from pipelines_rj_sms_spark.operators.cache import track

    def pin6(c: Column) -> Column:
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    x = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col),
                    lambda v: v.cast("double")).alias("_x")).persist()
    pins = [x]
    # k seed rows -> a k-row window is fine; the data never sorts
    seeds = x.orderBy("_id").limit(k)
    cents = seeds.select(
        (F.row_number().over(Window.orderBy("_id")) - 1).alias("_cl"),
        F.transform("_x", pin6).alias("_c"))

    def d2_col() -> Column:
        return F.aggregate(
            F.zip_with("_x", "_c", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v)

    def assign_frame(cframe: DataFrame) -> DataFrame:
        d2 = (x.crossJoin(F.broadcast(cframe))
              .select("_id", "_cl", d2_col().alias("_d2")))
        return (d2.groupBy("_id")
                .agg(F.min(F.struct("_d2", "_cl")).alias("_m"))
                .select("_id", F.col("_m._cl").alias("_cl"),
                        F.col("_m._d2").alias("_d2")))

    for _ in range(n_iter):
        cents = track(cents.persist())
        pins.append(cents)
        # carry _x THROUGH the assignment aggregation instead of
        # joining assignments back to the design frame (r12): every
        # row of an _id group holds the same _x, and the min-struct
        # winner is decided by the (_d2, _cl) prefix (_cl is unique
        # per group), so min(struct(_d2, _cl, _x)) picks the identical
        # assignment and saves one full-vector shuffle join per
        # iteration
        d2 = (x.crossJoin(F.broadcast(cents))
              .select("_id", "_cl", d2_col().alias("_d2"), "_x"))
        assign = (d2.groupBy("_id")
                  .agg(F.min(F.struct("_d2", "_cl", "_x")).alias("_m"))
                  .select(F.col("_m._cl").alias("_cl"),
                          F.col("_m._x").alias("_x")))
        dims = assign.select(
            "_cl", F.posexplode("_x").alias("_dim", "_v"))
        upd = (dims.groupBy("_cl", "_dim")
               .agg(F.sum(pin_units(F.col("_v"))).alias("_su"),
                    F.count("*").alias("_n"))
               .select("_cl", "_dim",
                       grid_mean(F.col("_su"), F.col("_n")).alias("_cv")))
        new_c = (upd.groupBy("_cl")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("_dim", "_cv"))),
                     lambda s: s["_cv"]).alias("_c")))
        cents = (cents.select("_cl", F.col("_c").alias("_c_old"))
                 .join(new_c, "_cl", "left")
                 .select("_cl",
                         F.coalesce("_c", "_c_old").alias("_c")))
    out = assign_frame(cents).select(
        F.col("_id").alias(id_col),
        F.col("_cl").cast("int").alias("cluster"),
        pin6(F.col("_d2")).alias("d2"))
    return track(out, *pins)
