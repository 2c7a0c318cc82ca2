"""PII scrubbing (functions/privacy.py) + contamination gate edges."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.privacy import (mask_cpf, scrub_pii)
from pipelines_rj_sms_spark.operators.dedup import contamination_overlap


def test_scrub_pii_all_patterns(spark):
    rows = [
        ("CPF 123.456.789-01 fim", "CPF [CPF] fim"),
        ("cns: 702 4056 8411 0001 ok", "cns: [CNS] ok"),
        ("liga (21) 99876-5432 ou 21 3456-7890", "liga [TEL] ou [TEL]"),
        ("mande para ana.silva+x@saude.rj.gov.br hoje",
         "mande para [EMAIL] hoje"),
        ("sem pii nenhum aqui", "sem pii nenhum aqui"),
        # order: the CPF's digits must not be half-eaten by the phone mask
        ("doc 987.654.321-00 tel 4002-8922", "doc [CPF] tel [TEL]"),
    ]
    df = spark.createDataFrame(rows, ["raw", "want"])
    got = df.select("want", scrub_pii("raw").alias("got")).collect()
    for r in got:
        assert r.got == r.want


def test_masks_stay_jvm_side(spark):
    df = spark.createDataFrame([("x",)], ["t"]).select(mask_cpf("t"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_contamination_overlap_two_sided(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(101, shared + " in the training set"),
         (102, "completely unrelated corpus text with no overlap at all")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(1, shared + " in the benchmark")], ["doc_id", "text"])
    out = contamination_overlap(corpus, bench, "doc_id", "text",
                                k=8, w=4, min_shared=3, max_df=None,
                                hash_fn="md5")
    rows = out.collect()
    assert [(r.id_corpus, r.id_bench) for r in rows] == [(101, 1)]
    assert rows[0].n_shared >= 3


def test_dp_noisy_counts_deterministic_and_close(spark):
    import math
    from pipelines_rj_sms_spark.functions.privacy import (
        replayable_noisy_counts)
    rows = [("a",)] * 100 + [("b",)] * 50
    df = spark.createDataFrame(rows, ["g"])
    out1 = {r["g"]: r["noisy_count"]
            for r in replayable_noisy_counts(
                df, ["g"], epsilon=1.0).collect()}
    out2 = {r["g"]: r["noisy_count"]
            for r in replayable_noisy_counts(
                df, ["g"], epsilon=1.0).collect()}
    assert out1 == out2                      # replayable
    assert abs(out1["a"] - 100) < 15         # Lap(1) rarely exceeds ~7
    assert abs(out1["b"] - 50) < 15
    # hand-verify the exact inverse-CDF arithmetic for group "a"
    import hashlib
    h = int(hashlib.md5(b"dpa").hexdigest()[:8], 16)
    u = ((h % 1048576) + 0.5) / 1048576.0
    noise = -1.0 * math.copysign(1, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
    assert abs(out1["a"] - round(max(100 + noise, 0.0), 6)) < 1e-9


def test_dp_noisy_counts_epsilon_scales_noise(spark):
    from pipelines_rj_sms_spark.functions.privacy import (
        replayable_noisy_counts)
    rows = [(f"g{i}", ) for i in range(200) for _ in range(3)]
    df = spark.createDataFrame(rows, ["g"])
    tight = replayable_noisy_counts(df, ["g"], epsilon=10.0,
                                    clamp_nonnegative=False).collect()
    loose = replayable_noisy_counts(df, ["g"], epsilon=0.1,
                                    clamp_nonnegative=False).collect()
    dev_t = sum(abs(r["noisy_count"] - 3) for r in tight)
    dev_l = sum(abs(r["noisy_count"] - 3) for r in loose)
    assert dev_l > dev_t * 10  # b scales 100x


def test_dp_noisy_counts_requires_secret_seed(spark):
    import pytest
    from pipelines_rj_sms_spark.functions.privacy import (
        dp_noisy_counts, replayable_noisy_counts)
    df = spark.createDataFrame([("a",)] * 10, ["g"])
    for bad in ("dp", "", "short", "changeme"):
        with pytest.raises(ValueError):
            dp_noisy_counts(df, ["g"], epsilon=1.0, secret_seed=bad)
    seed = "f3a9c1e7b2d8a4f6deadbeef"
    got = {r["g"]: r["noisy_count"] for r in dp_noisy_counts(
        df, ["g"], epsilon=1.0, secret_seed=seed).collect()}
    # delegates to the replayable core with the seed as salt
    want = {r["g"]: r["noisy_count"] for r in replayable_noisy_counts(
        df, ["g"], epsilon=1.0, salt=seed).collect()}
    assert got == want
