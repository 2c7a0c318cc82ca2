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


def test_bm25_ranks_matching_docs_first(spark):
    """A doc repeating the query term beats one mentioning it once;
    docs without any query term don't appear; shorter docs win on
    length normalization at equal tf."""
    from pipelines_rj_sms_spark.operators.terms import bm25_top_k
    df = spark.createDataFrame([
        (1, "spark spark spark fast engine"),
        (2, "spark is mentioned once here in a much longer document text"),
        (3, "nothing relevant at all"),
        (4, "spark engine"),
    ], ["id", "txt"])
    rows = bm25_top_k(df, "id", "txt", ["spark"], k=10).collect()
    ids = [r["id"] for r in rows]
    assert 3 not in ids and set(ids) == {1, 2, 4}
    assert ids[0] in (1, 4)           # high tf or short doc lead
    assert ids[-1] == 2               # long one-hit doc ranks last
    assert all(r["n_terms_hit"] == 1 for r in rows)


def test_bm25_multi_term_hit_count(spark):
    from pipelines_rj_sms_spark.operators.terms import bm25_top_k
    df = spark.createDataFrame([
        (1, "alpha beta gamma"),
        (2, "alpha alpha delta"),
    ], ["id", "txt"])
    out = {r["id"]: r["n_terms_hit"]
           for r in bm25_top_k(df, "id", "txt", ["alpha", "beta"]).collect()}
    assert out == {1: 2, 2: 1}


def test_unigram_logprob_rare_tokens_score_lower(spark):
    """A doc made of corpus-rare tokens has lower mean logprob than one
    made of the corpus's dominant token."""
    from pipelines_rj_sms_spark.operators.terms import unigram_logprob
    df = spark.createDataFrame(
        [(1, "the the the the"), (2, "zq xv jk qq"), (3, "the the zq the")],
        ["id", "txt"])
    out = {r["id"]: (r["mean_logprob"], r["n_tokens"])
           for r in unigram_logprob(df, "id", "txt").collect()}
    assert out[1][0] > out[3][0] > out[2][0]
    assert out[1][1] == 4 and out[2][1] == 4


def test_pmi_collocations_hand_computed(spark):
    from pipelines_rj_sms_spark.operators.terms import pmi_collocations
    import math
    # "new york" always together; "the" everywhere
    docs = [(1, "new york the city"), (2, "new york the park"),
            (3, "the new york")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["bg"]: r for r in pmi_collocations(
        df, "text", min_count=3, k=10).collect()}
    assert "new york" in out
    r = out["new york"]
    n_ab, n_big, n_tok, n_a, n_b = 3, 8, 11, 3, 3
    expect = math.log((n_ab / n_big) / ((n_a / n_tok) * (n_b / n_tok)))
    assert r["n_ab"] == 3
    assert abs(r["pmi"] - round(expect, 6)) < 1e-9


def test_pmi_min_count_filters(spark):
    from pipelines_rj_sms_spark.operators.terms import pmi_collocations
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c d")], ["doc_id", "text"])
    got = [r["bg"] for r in pmi_collocations(
        df, "text", min_count=2, k=10).collect()]
    assert got == ["a b"]


def test_feature_hash_deterministic_and_sparse(spark):
    from pipelines_rj_sms_spark.operators.terms import feature_hash
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], ["doc_id", "text"])
    a = sorted(map(tuple, feature_hash(df, "doc_id", "text",
                                       dim=32).collect()))
    b = sorted(map(tuple, feature_hash(df, "doc_id", "text",
                                       dim=32).collect()))
    assert a == b and len(a) >= 2
    # buckets bounded by dim
    assert all(0 <= r[1] < 32 for r in a)


def test_feature_hash_unsigned_counts_tokens(spark):
    from pipelines_rj_sms_spark.operators.terms import feature_hash
    df = spark.createDataFrame([(1, "x x x")], ["doc_id", "text"])
    out = feature_hash(df, "doc_id", "text", dim=8,
                       signed=False).collect()
    assert len(out) == 1 and abs(out[0]["weight"]) == 3


def test_feature_hash_md5_portable(spark):
    import duckdb
    from pipelines_rj_sms_spark.operators.terms import feature_hash
    df = spark.createDataFrame(
        [(1, "spark duck parity check")], ["doc_id", "text"])
    got = sorted((r["bucket"], r["weight"]) for r in feature_hash(
        df, "doc_id", "text", dim=16, hash_fn="md5").collect())
    duck = duckdb.sql(r"""
      WITH t AS (SELECT unnest(['spark','duck','parity','check']) AS w),
      h AS (SELECT
        CAST(('0x' || substr(md5('fh' || w), 1, 8)) AS BIGINT) % 16
          AS bucket,
        CASE WHEN CAST(('0x' || substr(md5('fs' || w), 1, 8)) AS BIGINT)
                  % 2 = 0 THEN 1 ELSE -1 END AS s
        FROM t)
      SELECT bucket, sum(s) AS weight FROM h GROUP BY 1
      HAVING sum(s) <> 0 ORDER BY 1""").fetchall()
    assert [(b, int(w)) for b, w in duck] == [(b, int(w)) for b, w in got]


def test_bigram_logprob_hand_computed(spark):
    import math
    from pipelines_rj_sms_spark.operators.terms import bigram_logprob
    docs = [(1, "a b a b"), (2, "a b")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in bigram_logprob(df, "doc_id", "text").collect()}
    # corpus bigrams: doc1: "a b","b a","a b"; doc2: "a b"
    # counts: "a b"->3, "b a"->1 ; contexts: a->3, b->1 ; vocab=2
    # Hand model replays the PINNED decomposition (the operator's
    # numeric contract): ln p on the 1e-6 grid, integer sum, then
    # exact half-away-from-zero integer rounding of S/n (grid_mean)
    # — the VERDICT r7 #1 contract that removed the .5e-6 round ties.
    u_ab = math.floor(math.log((3 + 1) / (3 + 2)) * 1e6 + 0.5)
    u_ba = math.floor(math.log((1 + 1) / (1 + 2)) * 1e6 + 0.5)

    def gm(s, n):
        k = (-2 * s + n) // (2 * n) if s < 0 else (2 * s + n) // (2 * n)
        return (-k if s < 0 else k) / 1e6

    s1 = 2 * u_ab + u_ba
    assert out[1]["n_bigrams"] == 3
    assert out[1]["mean_bigram_logprob"] == gm(s1, 3)
    assert out[2]["mean_bigram_logprob"] == gm(u_ab, 1)
    # true-math sanity: pin error ≤0.5 unit/term plus the rounding
    # step → pinned result within 1.5 grid units of the true round()
    exp1 = (2 * math.log(4 / 5) + math.log(2 / 3)) / 3
    assert abs(out[1]["mean_bigram_logprob"] - round(exp1, 6)) <= 1.5e-6


def test_bigram_logprob_short_doc_excluded(spark):
    from pipelines_rj_sms_spark.operators.terms import bigram_logprob
    df = spark.createDataFrame([(1, "solo"), (2, "a b")],
                               ["doc_id", "text"])
    got = {r["doc_id"] for r in bigram_logprob(
        df, "doc_id", "text").collect()}
    assert got == {2}  # 1-token doc emits no bigram rows


def test_zipf_fit_synthetic_power_law(spark):
    from pipelines_rj_sms_spark.operators.terms import zipf_fit
    # construct counts following freq = 1000 / rank exactly
    words = []
    for rank in range(1, 21):
        words += [f"w{rank:02d}"] * (1000 // rank)
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    out = zipf_fit(df, "text").collect()[0]
    assert out["n_terms"] == 20
    assert -1.1 < out["slope"] < -0.9
    assert out["r2"] > 0.99


def test_ranking_metrics_hand_computed(spark):
    """One query, k=3: DCG/IDCG/AP recomputed independently in
    Python from the public formulas."""
    import math
    from pipelines_rj_sms_spark.operators.terms import ranking_metrics
    rows = [("q", 1, 5.0, 0), ("q", 2, 4.0, 2), ("q", 3, 3.0, 1),
            ("q", 4, 2.0, 0), ("q", 5, 1.0, 1)]
    df = spark.createDataFrame(rows, ["q", "id", "s", "rel"])
    out = ranking_metrics(df, "q", "id", "s", "rel", k=3).collect()[0]
    dcg = 3 / math.log(3) + 1 / math.log(4)          # ranks 2, 3
    idcg = 3 / math.log(2) + 1 / math.log(3) + 1 / math.log(4)
    ap = (1 / 2 + 2 / 3) / 3                         # R = 3 >= k
    assert out["n_candidates"] == 5 and out["n_relevant"] == 3
    assert abs(out["precision_at_k"] - 2 / 3) < 1e-6
    assert abs(out["ndcg_at_k"] - dcg / idcg) < 1e-6
    assert abs(out["ap_at_k"] - ap) < 1e-6


def test_ranking_metrics_perfect_and_empty(spark):
    """A ranker that orders by relevance scores NDCG=AP=1; a query
    with no relevant candidates gets NULL AP and 0 precision."""
    from pipelines_rj_sms_spark.operators.terms import ranking_metrics
    rows = ([("good", i, 10.0 - i, 3 - min(i, 3)) for i in range(6)]
            + [("none", i, float(-i), 0) for i in range(4)])
    df = spark.createDataFrame(rows, ["q", "id", "s", "rel"])
    out = {r["query"]: r for r in
           ranking_metrics(df, "q", "id", "s", "rel", k=4).collect()}
    assert out["good"]["ndcg_at_k"] == 1.0
    assert out["good"]["ap_at_k"] == 1.0
    assert out["none"]["ap_at_k"] is None
    assert out["none"]["ndcg_at_k"] is None
    assert out["none"]["precision_at_k"] == 0.0


def test_good_turing_hand_computed(spark):
    """Source A = 'a a b c': N=4 V=3 F1=2 F2=1 -> unseen 0.5,
    chao1 = 3 + 2*1/(2*2) = 3.5. Source B = 'x y': F2=0 exercises
    the bias-corrected denominator (chao1 = 2 + 2*1/2 = 3)."""
    from pipelines_rj_sms_spark.operators.terms import (
        good_turing_richness)
    df = spark.createDataFrame(
        [("A", "a a b c"), ("B", "x y")], ["source", "text"])
    out = {r["source"]: r for r in
           good_turing_richness(df, "text", ["source"]).collect()}
    a = out["A"]
    assert (a["n_tokens"], a["vocab_size"], a["f1"], a["f2"]) == (4, 3, 2, 1)
    assert a["gt_unseen_mass"] == 0.5 and a["chao1"] == 3.5
    b = out["B"]
    assert b["gt_unseen_mass"] == 1.0 and b["chao1"] == 3.0


def test_vocabulary_overlap_hand_computed(spark):
    """A={a,b,c}, B={b,c,d}, C={x}: AB jaccard = 2/4, AC = BC = 0
    (pairs with empty intersection don't appear)."""
    from pipelines_rj_sms_spark.operators.terms import (
        vocabulary_overlap)
    df = spark.createDataFrame(
        [("A", "a b c b"), ("B", "b c d"), ("C", "x x")],
        ["src", "text"])
    out = {(r["key_a"], r["key_b"]): r for r in
           vocabulary_overlap(df, "src", "text").collect()}
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert (r["inter_size"], r["size_a"], r["size_b"]) == (2, 3, 3)
    assert r["jaccard"] == 0.5


def test_token_ngrams_builds_windows(spark):
    from pyspark.sql import functions as F

    from pipelines_rj_sms_spark.functions.text import token_ngrams
    df = spark.createDataFrame([("A b c d",), ("x",), ("",)], ["text"])
    got = [r[0] for r in df.select(token_ngrams("text", 3)).collect()]
    assert got == [["a b c", "b c d"], [], []]


def test_ngram_repetition_hand_computed(spark):
    """doc 1: "go go go stop" -> bigrams [go go, go go, go stop]:
    tot=3 dist=2 dup=1/3; top = "go go" (cnt 2, len 5) over 13 chars.
    doc 2: all-distinct bigrams -> dup_frac 0. doc 3: 1 token -> no
    row."""
    from pipelines_rj_sms_spark.operators.terms import ngram_repetition
    df = spark.createDataFrame(
        [(1, "go go go stop"), (2, "a b c"), (3, "solo")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           ngram_repetition(df, "doc_id", "text", n=2).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1["n_grams"], r1["top_gram"]) == (3, "go go")
    assert r1["dup_frac"] == 0.333333          # round6(1/3)
    assert r1["top_char_frac"] == 0.769231     # round6(2*5/13)
    r2 = out[2]
    assert (r2["n_grams"], r2["dup_frac"]) == (2, 0.0)


def test_ngram_repetition_tie_breaks_lexicographic(spark):
    from pipelines_rj_sms_spark.operators.terms import ngram_repetition
    # "b a b a": bigrams [b a, a b, b a] -> counts {b a: 2, a b: 1};
    # "z y z y x y z y": ties between "z y" (2) and "y z" (2) -> min
    df = spark.createDataFrame([(1, "z y z y x y z y")],
                               ["doc_id", "text"])
    [r] = ngram_repetition(df, "doc_id", "text", n=2).collect()
    # counts: "z y":3, "y z":2, "y x":1, "x y":1 -> top is z y
    assert r["top_gram"] == "z y"
    df2 = spark.createDataFrame([(1, "b a c a b a c a")],
                                ["doc_id", "text"])
    [r2] = ngram_repetition(df2, "doc_id", "text", n=2).collect()
    # "a b":1 "b a":2 "a c":2 "c a":2 -> tie at 2, lexicographic min "a c"
    assert r2["top_gram"] == "a c"


def test_kn_bigram_logprob_hand_computed(spark):
    import math

    from pipelines_rj_sms_spark.operators.terms import kn_bigram_logprob
    docs = [(1, "a b a b"), (2, "a b")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in kn_bigram_logprob(df, "doc_id", "text").collect()}
    # corpus bigrams: "a b" x3, "b a" x1
    # cv: a->3, b->1 ; N1+(a.)=1, N1+(b.)=1 ; N1+(.b)=1, N1+(.a)=1
    # N1+(..)=2 types ; V=2
    D = 0.75

    def pkn(cbg, cv, n1v, n1w):
        return (max(cbg - D, 0.0) / cv
                + (D * n1v / cv) * ((n1w + 1.0) / (2.0 + 2.0)))

    u_ab = math.floor(math.log(pkn(3, 3, 1, 1)) * 1e6 + 0.5)
    u_ba = math.floor(math.log(pkn(1, 1, 1, 1)) * 1e6 + 0.5)

    def gm(s, n):
        k = (-2 * s + n) // (2 * n) if s < 0 else (2 * s + n) // (2 * n)
        return (-k if s < 0 else k) / 1e6

    assert out[1]["n_bigrams"] == 3
    assert out[1]["mean_kn_logprob"] == gm(2 * u_ab + u_ba, 3)
    assert out[2]["mean_kn_logprob"] == gm(u_ab, 1)
    # probabilities are proper: every pkn in (0, 1]
    assert 0 < pkn(3, 3, 1, 1) <= 1 and 0 < pkn(1, 1, 1, 1) <= 1


def test_kn_novelty_signal_beats_add_one(spark):
    """The KN continuation count penalizes a word that only ever
    follows ONE context ('francisco' after 'san') when it shows up in
    a new context — the novelty signal add-one smoothing lacks.
    p_cont is per-WORD: the unseen bigram 'of francisco' must score
    below 'of the' (the = seen after many contexts)."""
    from pipelines_rj_sms_spark.operators.terms import kn_bigram_logprob
    corpus = [(i, "san francisco") for i in range(10)]
    corpus += [(100 + i, t) for i, t in enumerate(
        ["a the", "b the", "c the", "d the", "of a", "of b"])]
    probe = [(900, "of francisco"), (901, "of the")]
    df = spark.createDataFrame(corpus + probe, ["doc_id", "text"])
    out = {r["doc_id"]: r["mean_kn_logprob"]
           for r in kn_bigram_logprob(df, "doc_id", "text").collect()}
    assert out[900] < out[901]


def test_kn_bigram_partition_invariant(spark):
    from pipelines_rj_sms_spark.operators.terms import kn_bigram_logprob
    docs = [(i, f"w{i % 5} w{(i + 1) % 7} w{i % 3} w{(i * 3) % 11}")
            for i in range(60)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = {tuple(r) for r in kn_bigram_logprob(
        df.coalesce(1), "doc_id", "text").collect()}
    b = {tuple(r) for r in kn_bigram_logprob(
        df.repartition(16), "doc_id", "text").collect()}
    assert a == b and len(a) == 60


def test_kn_trigram_short_doc_contract_and_counts(spark):
    from pipelines_rj_sms_spark.operators.terms import kn_trigram_logprob
    docs = [(1, "a b c d"), (2, "a b"), (3, ""), (4, "x y z")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r
           for r in kn_trigram_logprob(df, "doc_id", "text").collect()}
    assert set(out) == {1, 4}           # <3 tokens emit no row
    assert out[1]["n_trigrams"] == 2    # "a b c", "b c d"
    assert out[4]["n_trigrams"] == 1
    # proper probabilities: mean logprob strictly negative
    assert all(r["mean_kn3_logprob"] < 0 for r in out.values())


def test_kn_trigram_sharper_than_bigram_on_templated_text(spark):
    """Order 3 separates fixed 3-word collocations from shuffled ones
    that share every BIGRAM context distribution as much as possible:
    the doc made of the corpus-dominant trigram scores above a doc of
    never-seen trigrams built from seen words."""
    from pipelines_rj_sms_spark.operators.terms import kn_trigram_logprob
    corpus = [(i, "new york city") for i in range(10)]
    corpus += [(50, "york city new"), (51, "city new york")]
    probe = [(900, "new york city new york city"),
             (901, "york new city york new city")]
    df = spark.createDataFrame(corpus + probe, ["doc_id", "text"])
    out = {r["doc_id"]: r["mean_kn3_logprob"]
           for r in kn_trigram_logprob(df, "doc_id", "text").collect()}
    assert out[900] > out[901]


def test_kn_trigram_partition_invariant(spark):
    from pipelines_rj_sms_spark.operators.terms import kn_trigram_logprob
    docs = [(i, f"w{i % 5} w{(i + 1) % 7} w{i % 3} w{(i * 3) % 11} w{i % 2}")
            for i in range(60)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = {tuple(r) for r in kn_trigram_logprob(
        df.coalesce(1), "doc_id", "text").collect()}
    b = {tuple(r) for r in kn_trigram_logprob(
        df.repartition(16), "doc_id", "text").collect()}
    assert a == b and len(a) == 60


def test_vocab_growth_checkpoints_exact(spark):
    """Hand-checkable curve: doc i = one novel token + one shared
    token. Threshold_i = (9*i) div 8; prefix of t+1 docs holds
    2*(t+1) occurrences and (t+1)+1 distinct tokens."""
    from pipelines_rj_sms_spark.operators.terms import (
        vocab_growth_checkpoints)
    df = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(10)],
        "doc_id long, text string")
    rows = {r["checkpoint"]: r for r in
            vocab_growth_checkpoints(df, "doc_id", "text", 8).collect()}
    assert set(rows) == set(range(1, 9))
    for i in range(1, 9):
        thr = (9 * i) // 8
        assert rows[i]["doc_id_threshold"] == thr
        assert rows[i]["n_tokens_cum"] == 2 * (thr + 1)
        assert rows[i]["vocab_cum"] == thr + 2


def test_heaps_fit_open_and_closed_vocab(spark):
    """Unbounded-novelty corpus fits beta ~ 1; a closed vocabulary
    fits beta == +0.0 (negative zero canonicalized — the saturated
    cov_n = -0.0 class)."""
    import math

    from pipelines_rj_sms_spark.operators.terms import heaps_fit

    open_v = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(5)))
         for i in range(40)], "doc_id long, text string")
    fit = heaps_fit(open_v, "doc_id", "text", 8).collect()[0]
    assert fit["n_checkpoints"] == 8
    assert 0.9 <= fit["beta"] <= 1.0
    assert fit["r2"] > 0.999

    closed = spark.createDataFrame(
        [(i, "same small vocab here") for i in range(40)],
        "doc_id long, text string")
    fit2 = heaps_fit(closed, "doc_id", "text", 8).collect()[0]
    assert fit2["beta"] == 0.0
    assert math.copysign(1.0, fit2["beta"]) == 1.0
    assert fit2["r2"] == 0.0


def test_bigram_logprob_within_fits_own_slice_better(spark):
    """The specialist leg: every key's self-model mean logprob is >=
    the shared corpus model's mean on that key (same add-one family,
    fitted to a subset)."""
    from pipelines_rj_sms_spark.operators.terms import (
        bigram_logprob, bigram_logprob_within)
    rows = ([(i, "the cat sat on the mat", "a") for i in range(6)]
            + [(10 + i, "zq wv zq pk wv zq", "b") for i in range(6)])
    df = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    shared = {r["src"]: r["mean_bigram_logprob"]
              for r in bigram_logprob(df, "src", "text").collect()}
    self_ = {r["src"]: r["mean_self_logprob"]
             for r in bigram_logprob_within(df, "src", "text")
             .collect()}
    assert set(shared) == set(self_) == {"a", "b"}
    for k in shared:
        assert self_[k] >= shared[k], (k, self_[k], shared[k])


def test_watermark_zscore_flags_greenlist_text(spark):
    """A doc constructed by always choosing a green continuation
    (the watermarked-generator simulation) scores z = sqrt(n); human
    word salad sits near green_frac 0.5. Sub-2-token docs emit no
    row."""
    import hashlib

    from pipelines_rj_sms_spark.operators.terms import (
        watermark_greenlist_zscore)

    vocab = [f"w{i}" for i in range(50)]

    def green(prev, cand):
        h = int(hashlib.md5(f"wm{prev} {cand}".encode())
                .hexdigest()[:8], 16)
        return h % 2 < 1

    toks = ["w0"]
    while len(toks) < 50:
        toks.append(next(c for c in vocab if green(toks[-1], c)))
    marked = " ".join(toks)
    salad = " ".join(vocab)
    df = spark.createDataFrame(
        [(0, marked), (1, salad), (2, "single")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           watermark_greenlist_zscore(df, "doc_id", "text").collect()}
    assert set(out) == {0, 1}          # 1-token doc emits no row
    assert out[0]["n_green"] == out[0]["n_scored"] == 49
    assert out[0]["green_frac"] == 1.0
    assert out[0]["z"] == round(49 / 49 ** 0.5, 6)
    assert out[0]["z"] > 4
    assert abs(out[1]["green_frac"] - 0.5) < 0.25
    assert abs(out[1]["z"]) < 4


def test_ngram_novelty_shared_vs_unique(spark):
    """Twin docs score 0 novelty (every shingle shared), a
    disjoint-vocab doc scores 1, a half-borrowed doc in between."""
    from pipelines_rj_sms_spark.operators.terms import ngram_novelty
    shared = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [(0, shared), (1, shared),
         (2, "zeta eta theta iota kappa"),
         (3, shared + " only here tail words")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           ngram_novelty(df, "doc_id", "text", 3).collect()}
    assert out[0]["novelty"] == 0.0 and out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    assert out[2]["n_shingles"] == 3 and out[2]["n_novel"] == 3
    # doc 3: 9 tokens -> 7 shingles; the 3 fully inside the shared
    # prefix have df >= 2, the 4 crossing into the tail are novel
    assert out[3]["n_shingles"] == 7
    assert out[3]["n_novel"] == 4
    assert out[3]["novelty"] == round(4 / 7, 6)
