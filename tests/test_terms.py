"""TF-IDF term ranking: rarity beats frequency, determinism."""

from pipelines_rj_sms_spark.operators.terms import tfidf_top_terms


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(
        [(1, "common common common zebra"),
         (2, "common words here"),
         (3, "common again common")],
        ["doc_id", "text"])
    out = tfidf_top_terms(df, "doc_id", "text", top_n=1)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # 'common' has tf=3 in doc 1, but df=3; 'zebra' tf=1, df=1:
    # 3 * 4/4 = 3.0 vs 1 * 4/2 = 2.0 -> frequency wins here...
    assert top[1] == "common"
    # ...but in doc 2 every term is tf=1, so the rarest ('here'/'words',
    # df=1, score 2.0) beats 'common' (df=3, score 1.0); tie -> lexicographic
    assert top[2] == "here"


def test_tfidf_deterministic_across_layouts(spark):
    rows = [(i, f"alpha beta gamma term{i} term{i} shared") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, tfidf_top_terms(df, "doc_id", "text").collect()))
    b = sorted(map(tuple, tfidf_top_terms(df.repartition(7), "doc_id", "text").collect()))
    assert a == b
    assert len(a) == 150  # 3 per doc
