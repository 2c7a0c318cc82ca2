import numpy as np
import pytest

from pipelines_rj_sms_spark.operators.pca import pca_project, pca_train


def _toy_vectors(n=120, d=6, seed=3):
    rng = np.random.default_rng(seed)
    # strong variance along two planted directions
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    z = rng.normal(size=(n, d)) * np.array([10, 5, 1, 1, 0.5, 0.2])
    return (z @ basis.T) + rng.normal(size=d)


def test_pca_matches_numpy(spark):
    x = _toy_vectors()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>")
    comps, mean, ratios = pca_train(df, "embedding", k=2)

    c = np.cov(x.T, bias=True)
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1][:2]
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    for got, idx in zip(comps, order):
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        assert np.allclose(got, v, atol=1e-8)
    assert ratios[0] > ratios[1] > 0
    assert ratios[0] == pytest.approx(
        vals[order[0]] / np.clip(vals, 0, None).sum(), abs=1e-9)


def test_pca_projection_expression_only_and_correct(spark):
    x = _toy_vectors(n=40)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>")
    comps, mean, _ = pca_train(df, "embedding", k=2)
    out = pca_project(df, "vec_id", "embedding", comps, mean)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Join" not in plan
    got = {r["vec_id"]: r["pca"] for r in out.collect()}
    expect = (x - x.mean(axis=0)) @ np.array(comps).T
    for i in range(40):
        assert np.allclose(got[i], np.round(expect[i], 6), atol=1e-6)
    # projected variance along PC1 exceeds PC2
    proj = np.array([got[i] for i in range(40)])
    assert proj[:, 0].var() > proj[:, 1].var()


def test_pca_projection_flat_columns(spark):
    """flat=True emits scalar pc1..pck columns with values identical
    to the array form — the driver-gradeable shape."""
    x = _toy_vectors(n=25)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>")
    comps, mean, _ = pca_train(df, "embedding", k=2)
    arr = {r["vec_id"]: r["pca"]
           for r in pca_project(df, "vec_id", "embedding",
                                comps, mean).collect()}
    flat = pca_project(df, "vec_id", "embedding", comps, mean, flat=True)
    assert flat.columns == ["vec_id", "pc1", "pc2"]
    for r in flat.collect():
        assert [r["pc1"], r["pc2"]] == list(arr[r["vec_id"]])
