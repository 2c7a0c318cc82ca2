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
