"""Distributed Lloyd's k-means (operators/similarity.py kmeans_lloyd)."""

from pipelines_rj_sms_spark.operators.similarity import kmeans_lloyd


def _blobs():
    """Two tight, well-separated 4-d blobs of 6 points each."""
    rows = []
    for i in range(6):
        rows.append((i, [10.0 + 0.1 * i, 10.0, 10.0, 10.0]))
    for i in range(6, 12):
        rows.append((i, [-10.0 - 0.1 * i, -10.0, -10.0, -10.0]))
    return rows


def test_kmeans_separates_two_blobs(spark):
    df = spark.createDataFrame(_blobs(),
                               "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           kmeans_lloyd(df, k=2, n_iter=4).collect()}
    assert len(out) == 12
    a = {out[i]["cluster"] for i in range(6)}
    b = {out[i]["cluster"] for i in range(6, 12)}
    assert len(a) == 1 and len(b) == 1 and a != b
    # converged: every point sits near its centroid
    assert all(r["d2"] < 1.0 for r in out.values())
    # d2 is on the 1e-6 grid
    assert all(round(r["d2"] * 1e6) == r["d2"] * 1e6 for r in out.values())


def test_kmeans_partition_invariant(spark):
    df = spark.createDataFrame(_blobs(),
                               "vec_id long, embedding array<double>")
    one = {tuple(r) for r in
           kmeans_lloyd(df.coalesce(1), k=3, n_iter=3).collect()}
    many = {tuple(r) for r in
            kmeans_lloyd(df.repartition(8), k=3, n_iter=3).collect()}
    assert one == many


def test_kmeans_empty_cluster_keeps_seed(spark):
    """Seeds are the k lowest ids; with k=3 over two blobs one seed
    cluster may starve — the run must still return a total assignment
    (the starved centroid keeps its seed position, documented)."""
    df = spark.createDataFrame(_blobs(),
                               "vec_id long, embedding array<double>")
    out = kmeans_lloyd(df, k=3, n_iter=4).collect()
    assert len(out) == 12
    assert all(0 <= r["cluster"] < 3 for r in out)


def test_kmeans_zero_iterations_assigns_to_pinned_seeds(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [4.0, 4.0]), (2, [0.1, 0.1]),
         (3, [3.9, 3.9])],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["cluster"] for r in
           kmeans_lloyd(df, k=2, n_iter=0).collect()}
    # seeds are ids 0 and 1 -> clusters 0 and 1; nearest-seed assignment
    assert out == {0: 0, 1: 1, 2: 0, 3: 1}


def test_semdedup_with_kmeans_cells(spark):
    """cells_df path: near-identical vectors land in one k-means cell
    and the lower id survives; the cross-blob pair never pairs."""
    from pipelines_rj_sms_spark.operators.similarity import (
        kmeans_lloyd,
        semantic_dedup,
    )
    rows = [
        (0, [10.0, 10.0, 10.0, 10.0]),
        (1, [10.0, 10.0, 10.0, 10.01]),      # near-dup of 0
        (2, [-10.0, -10.0, -10.0, -10.0]),
        (3, [-10.0, -10.0, -10.0, -10.02]),  # near-dup of 2
        (4, [10.0, -10.0, 10.0, -10.0]),     # lone
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cells = kmeans_lloyd(df, k=3, n_iter=3).withColumnRenamed(
        "cluster", "ivf_cell")
    out = semantic_dedup(df, None, threshold=0.99, cells_df=cells)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 2, 4]
