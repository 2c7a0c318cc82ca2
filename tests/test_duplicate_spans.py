"""Exact duplicated-substring spans (Lee et al. 2022, windowed form):
duplicate_token_spans finds the maximal shared span, remove_duplicate_spans
keeps exactly one copy (the global first occurrence).

Hand-built fixture: doc 0 is 20 unique tokens a0..a19; doc 1 copies
doc 0's tokens 5..14 (10 tokens, >= k+2 so the span merge has work to
do) surrounded by unique b-tokens; doc 2 is all-unique and shorter
than k (no windows at all)."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators import dedup
from pipelines_rj_sms_spark.operators.cache import release

K = 8
SHARED = " ".join(f"a{i}" for i in range(5, 15))          # 10 tokens
DOC0 = " ".join(f"a{i}" for i in range(20))
DOC1 = " ".join(["b0", "b1", "b2", SHARED, "b3", "b4"])
DOC2 = "c0 c1 c2"


def _docs(spark):
    return spark.createDataFrame(
        [(0, DOC0), (1, DOC1), (2, DOC2)], "doc_id long, text string")


def test_duplicate_spans_finds_maximal_shared_span(spark):
    out = dedup.duplicate_token_spans(_docs(spark), "doc_id", "text", k=K)
    rows = {r["doc_id"]: r for r in out.collect()}
    release(out)
    assert set(rows) == {0, 1}                 # doc 2: no dup, no windows
    # doc 0: shared tokens at 0-based positions 5..14 -> windows at
    # 5,6,7 (w - k + 1 = 3), merged to ONE maximal span
    assert (rows[0]["span_start"], rows[0]["span_end"],
            rows[0]["n_windows"]) == (5, 14, 3)
    # doc 1: copy sits after 3 unique tokens -> positions 3..12
    assert (rows[1]["span_start"], rows[1]["span_end"],
            rows[1]["n_windows"]) == (3, 12, 3)


def test_duplicate_spans_partition_invariant(spark):
    docs = _docs(spark)
    a = dedup.duplicate_token_spans(docs, "doc_id", "text", k=K)
    got_a = sorted(map(tuple, a.collect()))
    release(a)
    b = dedup.duplicate_token_spans(docs.repartition(7), "doc_id",
                                    "text", k=K)
    got_b = sorted(map(tuple, b.collect()))
    release(b)
    assert got_a == got_b


def test_duplicate_spans_within_doc_repeat(spark):
    # the SAME doc repeating its own k-gram is a duplicate too
    # (Lee et al. removes within-doc repeats): 8 tokens repeated twice
    eight = " ".join(f"d{i}" for i in range(K))
    df = spark.createDataFrame([(7, f"{eight} {eight}")],
                               "doc_id long, text string")
    out = dedup.duplicate_token_spans(df, "doc_id", "text", k=K)
    rows = out.collect()
    release(out)
    # windows at 0-based 0 and 8 match each other; each is its own
    # maximal run (positions 0 and 8 are not consecutive)
    assert sorted((r["span_start"], r["span_end"]) for r in rows) \
        == [(0, 7), (8, 15)]


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    out = dedup.remove_duplicate_spans(_docs(spark), "doc_id", "text",
                                       k=K, out_col="clean")
    rows = {r["doc_id"]: r["clean"] for r in out.collect()}
    release(out)
    # doc 0 holds every dup window's global first occurrence -> intact
    assert rows[0] == DOC0
    # doc 1 loses exactly the copied tokens, keeps its own
    assert rows[1] == "b0 b1 b2 b3 b4"
    # doc 2 untouched
    assert rows[2] == DOC2


def test_remove_preserves_case_outside_spans(spark):
    df = spark.createDataFrame(
        [(0, DOC0), (1, "B0 B1 B2 " + SHARED + " B3")],
        "doc_id long, text string")
    out = dedup.remove_duplicate_spans(df, "doc_id", "text", k=K,
                                       out_col="clean")
    rows = {r["doc_id"]: r["clean"] for r in out.collect()}
    release(out)
    assert rows[1] == "B0 B1 B2 B3"   # original case survives


def test_remove_drops_fully_duplicated_doc(spark):
    # doc 1 is an exact copy of doc 0 (>= k tokens): doc 0 keeps all
    # (first occurrence), doc 1 reduces to nothing and drops out
    df = spark.createDataFrame([(0, DOC0), (1, DOC0)],
                               "doc_id long, text string")
    out = dedup.remove_duplicate_spans(df, "doc_id", "text", k=K)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    release(out)
    assert rows == {0: DOC0}


def _py_remove(docs: dict, k: int) -> dict:
    """Pure-Python reference of remove_duplicate_spans: same windowed
    hashing semantics (window identity = its token tuple), same global
    first-occurrence keep rule, same coverage subtraction."""
    toks = {d: t.split() for d, t in docs.items()}
    lowered = {d: [w.lower() for w in ws] for d, ws in toks.items()}
    occ = {}
    for d in sorted(lowered):
        ws = lowered[d]
        for i in range(len(ws) - k + 1):
            occ.setdefault(tuple(ws[i:i + k]), []).append((d, i))
    removable = {d: set() for d in toks}
    kept_cover = {d: set() for d in toks}
    for gram, sites in occ.items():
        if len(sites) < 2:
            continue
        first = min(sites)
        for (d, i) in sites:
            target = kept_cover if (d, i) == first else removable
            target[d].update(range(i, i + k))
    out = {}
    for d, ws in toks.items():
        keep = [w for j, w in enumerate(ws)
                if j not in (removable[d] - kept_cover[d])]
        if keep:
            out[d] = " ".join(keep)
    return out


def test_remove_matches_python_reference_on_random_corpora(spark):
    """Randomized equivalence vs an independent pure-Python model:
    small alphabets force heavy window collisions, overlapping spans,
    and within-doc repeats — the cases hand fixtures under-sample."""
    import random

    rng = random.Random(0)
    for trial in range(5):
        n_docs = rng.randint(2, 6)
        docs = {}
        for d in range(n_docs):
            n = rng.randint(0, 30)
            docs[d] = " ".join(
                rng.choice(["a", "b", "c", "D"]) for _ in range(n))
        df = spark.createDataFrame(
            [(d, t) for d, t in docs.items()],
            "doc_id long, text string")
        out = dedup.remove_duplicate_spans(df, "doc_id", "text", k=3,
                                           out_col="clean")
        got = {r["doc_id"]: r["clean"] for r in out.collect()}
        release(out)
        want = _py_remove(docs, 3)
        assert got == want, f"trial {trial}: {got} != {want} on {docs}"


def test_incremental_span_dedup_two_batches(spark):
    """Streaming-shape span dedup: batch 2 loses content already in the
    store (even where it would be batch-first), keeps novel content,
    and the returned hashes reflect the CLEANED text."""
    b1 = spark.createDataFrame([(0, DOC0)], "doc_id long, text string")
    clean1, h1 = dedup.incremental_span_dedup(
        b1, None, "doc_id", "text", k=K)
    rows1 = {r["doc_id"]: r["text"] for r in clean1.collect()}
    assert rows1 == {0: DOC0}          # nothing to dedup against
    store = h1.persist()
    assert store.count() == 20 - K + 1  # one hash per window

    # batch 2: doc 10 repeats DOC0's middle span twice (so it is ALSO
    # batch-internal-first for that content) plus novel tokens; doc 11
    # is pure novel content
    b2 = spark.createDataFrame(
        [(10, f"n0 n1 {SHARED} n2 {SHARED} n3"),
         (11, "m0 m1 m2 m3 m4 m5 m6 m7 m8")],
        "doc_id long, text string")
    clean2, h2 = dedup.incremental_span_dedup(
        b2, store, "doc_id", "text", k=K)
    rows2 = {r["doc_id"]: r["text"] for r in clean2.collect()}
    from pipelines_rj_sms_spark.operators.cache import release
    release(clean2)
    # the store copy wins BOTH occurrences — batch-first does not
    # protect store-duplicated content
    assert rows2[10] == "n0 n1 n2 n3"
    assert rows2[11] == "m0 m1 m2 m3 m4 m5 m6 m7 m8"
    # new hashes come from cleaned text: doc 10 has < k tokens left ->
    # contributes nothing; doc 11 contributes 9-k+1 = 2 windows
    assert h2.count() == 2
    release(clean1)
    store.unpersist()


def test_incremental_span_dedup_rerun_is_idempotent(spark):
    """Re-ingesting an already-stored batch removes everything
    store-duplicated; only sub-k fragments survive."""
    b1 = spark.createDataFrame([(0, DOC0)], "doc_id long, text string")
    clean1, h1 = dedup.incremental_span_dedup(
        b1, None, "doc_id", "text", k=K)
    clean1.collect()
    store = h1.persist()
    again, _ = dedup.incremental_span_dedup(
        spark.createDataFrame([(99, DOC0)], "doc_id long, text string"),
        store, "doc_id", "text", k=K)
    assert again.collect() == []       # fully duplicated -> drops out
    from pipelines_rj_sms_spark.operators.cache import release
    release(again)
    release(clean1)
    store.unpersist()
