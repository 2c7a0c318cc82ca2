from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    shingles,
    token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello,  world! 123 foo",), ("",)], ["text"])
    rows = df.select(
        token_count("text").alias("n"),
        bpe_ish_token_count("text").alias("b"),
    ).collect()
    assert rows[0]["n"] == 4
    # hello , world ! 123 foo -> 6 bpe-ish tokens
    assert rows[0]["b"] == 6
    assert rows[1]["n"] == 0


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    rows = df.select(shingles("text", 3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == ["a b"]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [("the cat is on the mat and it is happy",),
         ("el perro y la casa por una calle del pueblo como siempre",),
         ("xyzzy qwerty plugh",)],
        ["text"],
    )
    out = [r["l"] for r in df.select(lang_id("text").alias("l")).collect()]
    assert out == ["en", "es", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("a reasonable length document with plenty of normal readable words "
          "that goes on for a while and has good composition overall",),
         ("!!! ??? ### $$$",)],
        ["text"],
    )
    rows = [r["q"] for r in df.select(quality_score("text").alias("q")).collect()]
    assert rows[0] > 0.8
    assert rows[1] < 0.5
    assert all(0.0 <= q <= 1.0 for q in rows)


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame([("same text here",), ("same text here",),
                                ("other content",)], ["text"])
    out = [r["f"] for r in df.select(fingerprint("text").alias("f")).collect()]
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_rolling_fingerprint_order_sensitive(spark):
    from pipelines_rj_sms_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame(
        [("the quick fox",), ("fox quick the",), ("the quick fox",), ("",)],
        ["text"])
    for fn in ("xxhash64", "md5"):
        rows = df.select(rolling_fingerprint("text", hash_fn=fn).alias("fp")).collect()
        assert rows[0]["fp"] == rows[2]["fp"]      # identical sequence
        assert rows[0]["fp"] != rows[1]["fp"]      # same tokens, other order
        assert rows[3]["fp"] == 0                  # empty doc -> init value
        assert all(0 <= r["fp"] < 1_000_000_007 for r in rows)


def test_rolling_fingerprint_md5_reference_value(spark):
    """Pin the md5 variant's arithmetic against a driver-side replay so
    the DuckDB oracle spelling can't drift from the Spark one."""
    import hashlib

    from pipelines_rj_sms_spark.functions.text import rolling_fingerprint

    text_val = "Hello rolling HASH world"
    h = 0
    for tok in text_val.lower().split():
        h = (h * 31 + int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)) % 1_000_000_007
    df = spark.createDataFrame([(text_val,)], ["text"])
    got = df.select(rolling_fingerprint("text", hash_fn="md5").alias("fp")).first()["fp"]
    assert got == h


def _winnow_py(text_val, k=8, w=4):
    import hashlib

    s = text_val.lower()
    n = max(len(s) - k + 1, 1)
    hashes = [int(hashlib.md5(s[i:i + k].encode()).hexdigest()[:8], 16)
              for i in range(n)]
    wins = [min(hashes[j:j + w]) for j in range(max(len(hashes) - w + 1, 1))]
    return sorted(set(wins))


def test_winnow_fingerprints_matches_reference_algorithm(spark):
    from pipelines_rj_sms_spark.functions.text import winnow_fingerprints

    texts = ["the quick brown fox jumps over the lazy dog",
             "tiny", ""]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r["fps"] for r in
           df.select(winnow_fingerprints("text", hash_fn="md5").alias("fps"))
           .collect()]
    assert got == [_winnow_py(t) for t in texts]


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length >= k + w - 1 must yield at least
    one shared fingerprint — the winnowing recall guarantee."""
    from pipelines_rj_sms_spark.functions.text import winnow_fingerprints

    shared = "a very distinctive shared passage of text"  # len 41 >= 11
    df = spark.createDataFrame(
        [("intro words before " + shared,),
         (shared + " and completely different tail content",),
         ("nothing in common with the others at all here",)],
        ["text"])
    fps = [set(r["fps"]) for r in
           df.select(winnow_fingerprints("text", k=8, w=4).alias("fps"))
           .collect()]
    assert fps[0] & fps[1]          # overlap detected
    assert not (fps[0] & fps[2])    # unrelated docs stay disjoint


def test_dup_token_fraction_and_bigrams(spark):
    from pipelines_rj_sms_spark.functions.text import (dup_token_fraction,
                                                       token_bigrams)

    df = spark.createDataFrame(
        [("a a a a",), ("all words differ here",), ("",), ("single",)],
        ["text"])
    got = df.select(dup_token_fraction("text").alias("d"),
                    token_bigrams("text").alias("b")).collect()
    assert got[0].d == 0.75 and got[0].b == ["a a", "a a", "a a"]
    assert got[1].d == 0.0 and got[1].b == ["all words", "words differ",
                                            "differ here"]
    assert got[2].d == 0.0 and got[2].b == []
    assert got[3].d == 0.0 and got[3].b == []


def test_token_chunks_sliding_windows(spark):
    from pipelines_rj_sms_spark.functions.text import token_chunks
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "")], ["doc_id", "text"])
    out = (df.select("doc_id", F.inline(token_chunks("text", size=3, stride=2)))
           .collect())
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
           for r in out}
    # doc 1: 7 tokens, starts 1,3,5,7
    assert got[(1, 0)] == ("a b c", 3)
    assert got[(1, 1)] == ("c d e", 3)
    assert got[(1, 2)] == ("e f g", 3)
    assert got[(1, 3)] == ("g", 1)          # short tail window
    assert got[(2, 0)] == ("x y", 2)
    assert got[(3, 0)] == ("", 0)           # empty doc -> one empty chunk
    # every token of doc 1 is covered at least once
    covered = " ".join(got[(1, i)][0] for i in range(4)).split()
    assert set(covered) == set("abcdefg")


def test_token_chunks_validates_args(spark):
    import pytest as _pytest

    from pipelines_rj_sms_spark.functions.text import token_chunks
    with _pytest.raises(ValueError):
        token_chunks("text", size=0)
    with _pytest.raises(ValueError):
        token_chunks("text", size=4, stride=-1)


def test_flesch_reading_ease_hand_computed(spark):
    from pipelines_rj_sms_spark.functions.text import flesch_reading_ease
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "")], ["id", "t"])
    out = {r["id"]: r["fre"].asDict() for r in df.select(
        "id", flesch_reading_ease("t").alias("fre")).collect()}
    r = out[1]
    # sentences: ". " and "!" -> 2; words 6; vowel groups:
    # e,a,a,e,o,a -> 6
    assert r["n_sentences"] == 2
    assert r["n_words"] == 6
    assert r["n_syllables"] == 6
    expect = 206.835 - 1.015 * 6 / 2 - 84.6 * 6 / 6
    assert abs(r["score"] - round(expect, 6)) < 1e-9
    assert out[2]["score"] is None and out[2]["n_words"] == 0


def test_flesch_stays_in_codegen(spark):
    from pipelines_rj_sms_spark.functions.text import flesch_reading_ease
    df = spark.createDataFrame([(1, "a b c.")], ["id", "t"])
    plan = df.select(flesch_reading_ease("t").alias("f")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_compression_ratio_separates_repetition(spark):
    from pipelines_rj_sms_spark.functions.text import compression_ratio_udf
    import random
    rng = random.Random(5)
    noise = " ".join("".join(rng.choices("abcdefghijklmnop", k=8))
                     for _ in range(200))
    boiler = "the same sentence again and again. " * 200
    df = spark.createDataFrame(
        [(1, boiler), (2, noise), (3, None), (4, "")],
        "doc_id long, text string")
    ratio = compression_ratio_udf()
    got = {r["doc_id"]: r["cr"] for r in df.select(
        "doc_id", ratio("text").alias("cr")).collect()}
    assert got[1] < 0.05            # boilerplate crushes
    assert got[2] > 0.4             # noise resists
    assert got[3] is None and got[4] is None


def test_compression_ratio_is_arrow_not_rowwise(spark):
    from pipelines_rj_sms_spark.functions.text import compression_ratio_udf
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = df.select(compression_ratio_udf()("text").alias("c")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_compression_ratio_exact_on_fixture_corpus(spark):
    """Oracle-hardening for the rows-only doc_compression_ratio gate:
    every ratio the Spark UDF emits over the sf0.001 documents fixture
    must equal an INDEPENDENT driver-side zlib recomputation of the
    same text, to the query's 6-dp rounding — the full Arrow
    round-trip (utf-8 bytes, level 6, null handling) is pinned, not
    just the two-point separation smoke."""
    import os
    import zlib

    from pipelines_rj_sms_spark.functions.text import compression_ratio_udf
    from pipelines_rj_sms_spark.session import read_parquet_normalized

    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL",
                            "/root/testdata/sf0.001")
    docs = read_parquet_normalized(
        spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ratio = compression_ratio_udf()
    got = {r["doc_id"]: r["c"] for r in docs.select(
        "doc_id", F.round(ratio("text"), 6).alias("c")).collect()}
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(got) == len(raw) > 0
    for doc_id, text in raw.items():
        if text is None or len(text) == 0:
            assert got[doc_id] is None
            continue
        b = text.encode("utf-8")
        expect = round(len(zlib.compress(b, 6)) / len(b), 6)
        assert got[doc_id] == expect, doc_id
