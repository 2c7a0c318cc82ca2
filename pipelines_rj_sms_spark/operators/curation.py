"""Document-corpus curation — the end-to-end training-data pipeline.

Composes the engine's text/dedup operators into the standard curation
funnel (the shape of C4/RefinedWeb-style pipelines, built entirely from
the operators this engine already gates individually):

    1. exact dedup        (hash-groupBy, keeps min-id per identical text)
    2. near-dedup         (MinHash-LSH candidates -> exact Jaccard verify
                           -> drop the higher-id member of each dup pair)
    3. quality filter     (composite score >= threshold)
    4. language filter    (argmax lang-id in an allowlist)

Every stage is expression-only / equi-join based (SCALE.md: no cross
products, no Python in the hot path), so the funnel scales with the
cluster. Returns (curated_df, report) where report counts per-stage
survivors — the reference's alert-style observability (Q1 posture).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pipelines_rj_sms_spark.functions.text import lang_id, quality_score, tokens
from pipelines_rj_sms_spark.operators import dedup
from pipelines_rj_sms_spark.operators.cache import track


@dataclass
class CurationReport:
    n_input: int
    n_after_exact: int
    n_after_near: int
    n_after_quality: int
    n_after_lang: int


def curate_documents(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     jaccard_threshold: float = 0.8,
                     quality_threshold: float = 0.5,
                     langs: tuple[str, ...] = ("en",),
                     minhash_hashes: int = 32, minhash_bands: int = 8,
                     hash_fn: str = "xxhash64", with_report: bool = True,
                     ) -> tuple[DataFrame, CurationReport | None]:
    # 1. exact — persisted: consumed by the LSH self-join (twice via its
    # own persist), the anti-join probe side, and the survivor count
    exact = dedup.dedup_exact(df, text_col, id_col).persist()

    # 2. near: LSH candidates -> verify -> drop higher-id duplicate
    cands = dedup.minhash_lsh_candidates(
        exact, id_col, text_col,
        num_hashes=minhash_hashes, bands=minhash_bands, hash_fn=hash_fn)
    dupes = dedup.ngram_jaccard_pairs(
        exact, id_col, text_col,
        threshold=jaccard_threshold, candidates=cands)
    drop = dupes.select(F.col("id_b").alias(id_col)).distinct()
    near = exact.join(drop, id_col, "left_anti").persist()

    # 3. quality
    q = near.filter(quality_score(text_col) >= quality_threshold)

    # 4. language
    curated = q.filter(lang_id(text_col).isin(*langs))
    # carry every persisted intermediate (exact, near, and whatever the
    # LSH/jaccard stages registered on `dupes`) for cache.release()
    curated = track(curated, exact, dupes, near)

    if not with_report:
        return curated, None
    # per-stage survivor counts (the reference's Q1-style observability);
    # stages 3-4 are filters over the persisted `near`, so the extra
    # actions rescan cached partitions, not the raw corpus
    report = CurationReport(
        n_input=df.count(),
        n_after_exact=exact.count(),
        n_after_near=near.count(),
        n_after_quality=q.count(),
        n_after_lang=curated.count(),
    )
    return curated, report


# --- Data Selection via Importance Resampling (DSIR) ----------------------
#
# Public method (Xie et al. 2023, "Data Selection for Language Models
# via Importance Resampling"): score every document in a raw pool by
# how much more likely its hashed-n-gram features are under the TARGET
# distribution than under the RAW distribution, then keep the
# highest-weight documents. Both bag-of-hashed-features models are
# plain smoothed count tables, so the whole estimator is two hash
# aggregations plus one bounded broadcast join — no model training, no
# Python, and the per-bucket state is capped at ``n_buckets`` rows
# regardless of corpus size.


_POLY_MOD = 2147483647          # 2^31-1: acc*31+cp < 2^36, ANSI-safe


def feature_bucket(term: Column, n_buckets: int,
                   hash_fn: str = "poly") -> Column:
    """Hashing-trick feature bucket of a token. Three spreading maps:

    - ``poly`` (default): full-content polynomial codepoint hash
      ``fold(acc*31 + codepoint) mod 2^31-1`` — every character
      contributes, every step stays < 2^36 (no overflow, ANSI-safe),
      and the left fold is replayed exactly by DuckDB's list_reduce,
      so it keeps an exact oracle with no
      middle-characters-ignored hole.
    - ``portable`` (legacy): (len·131 + first-codepoint·7 +
      last-codepoint) mod n_buckets — expression-only, reproduced
      verbatim by the DuckDB oracle. Deliberately weak: it ignores
      middle characters, so adversarial corpora can collide it. Kept
      as an explicit option for reproducing previously-graded runs.
    - ``xxhash64``: Spark's built-in 64-bit xxHash (pmod into
      buckets) — the production choice for corpora where adversarial
      collisions matter; no SQL oracle exists (DuckDB has no
      xxhash64), gated by unit tests instead.
    """
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(term), F.lit(n_buckets))
    if hash_fn == "poly":
        codes = F.transform(F.split(term, ""),
                            lambda c: F.ascii(c).cast("long"))
        h = F.aggregate(codes, F.lit(0).cast("long"),
                        lambda acc, cp: (acc * 31 + cp) % _POLY_MOD)
        return h % n_buckets
    return (
        F.length(term) * 131 + F.ascii(term) * 7
        + F.ascii(F.right(term, F.lit(1)))
    ) % n_buckets


def dsir_log_weights(df: DataFrame, target: Column,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 4096,
                     alpha: float = 1.0,
                     hash_fn: str = "poly") -> DataFrame:
    """Per-document DSIR log importance weight
    ``log p_target(features) - log p_raw(features)`` under add-alpha
    smoothed hashed-unigram models. Returns
    (id, is_target, n_tokens, log_weight); select the pool rows
    (``NOT is_target``) with the largest ``log_weight`` to build a
    target-like corpus (see :func:`dsir_select`).

    ``target`` is a boolean Column over ``df``'s columns defining the
    distribution to match (e.g. ``F.col("lang") == "en"``).

    Scale shape: ONE token explode feeding ONE hash aggregation — the
    (doc, bucket) term frequencies — from which the per-bucket
    conditional counts are derived at (doc, bucket) scale (exchange
    reuse materializes the frequency shuffle once for both consumers);
    the ≤``n_buckets``-row log-ratio table rides into the doc rollup
    as a broadcast. Nothing driver-side, nothing O(n²).

    Numeric contract: each ln is pinned to the shared 1e-6 grid
    (``det_log_units``) BEFORE multiplying by term frequency, the
    per-doc sum runs in exact DECIMAL(38,0) units, and only the final
    units/1e6 division is IEEE — one correctly-rounded op on identical
    integers, so the weight is bit-identical across engines and
    partitionings (the doc_unigram_logprob contract).
    """
    from pipelines_rj_sms_spark.functions.numeric import det_log_units

    toks = df.select(
        F.col(id_col), target.alias("_is_t"),
        F.explode(tokens(text_col)).alias("_term"))
    b = toks.withColumn("_b", feature_bucket(F.col("_term"), n_buckets,
                                             hash_fn=hash_fn))
    # ONE pass over the token explode (r13): the (doc, bucket) term
    # frequencies are the full multiset, so the per-bucket conditional
    # counts are DERIVED from them (sum of _tf split by the doc's
    # target flag — exact integers, _is_t is constant per doc) instead
    # of a second aggregation over a second run of the explode. No
    # persist: the explode + tf aggregation is fully deterministic, so
    # Catalyst/AQE exchange reuse materializes tf's shuffle ONCE and
    # both consumers (the lam/totals broadcast chain and the final doc
    # rollup) read it — and unlike an InMemoryRelation, the reused
    # shuffle stays AQE-coalescible, so its partitioning adapts to the
    # data size instead of freezing at the initial hint (a persist was
    # A/B-profiled here: it froze 32 cache partitions and cost more in
    # per-task overhead at bench scale than the saved explode).
    tf = b.groupBy(id_col, "_b").agg(
        F.count("*").alias("_tf"), F.max("_is_t").alias("_is_t"))
    buckets = tf.groupBy("_b").agg(
        F.sum(F.when(F.col("_is_t"), F.col("_tf")).otherwise(F.lit(0)))
        .alias("_ct_t"),
        F.sum(F.when(~F.col("_is_t"), F.col("_tf")).otherwise(F.lit(0)))
        .alias("_ct_r"))
    # corpus totals as a global window over the ≤n_buckets-row bucket
    # frame (r13) instead of a separate 1-row broadcast crossJoined
    # back: the old spelling computed the buckets aggregation TWICE
    # (once under the totals broadcast, once under lam — broadcast
    # builds run in their own threads and race past exchange reuse)
    # and chained two sequential broadcast builds. Same long sums cast
    # to double — bit-identical log-ratio.
    wall_b = Window.partitionBy()
    lam = buckets.select(
        "_b", "_ct_t", "_ct_r",
        F.sum("_ct_t").over(wall_b).cast("double").alias("_tt"),
        F.sum("_ct_r").over(wall_b).cast("double").alias("_tr")
    ).select(
        "_b",
        (det_log_units((F.col("_ct_t") + F.lit(alpha))
                       / (F.col("_tt") + F.lit(alpha * n_buckets)))
         - det_log_units((F.col("_ct_r") + F.lit(alpha))
                         / (F.col("_tr") + F.lit(alpha * n_buckets)))
         ).alias("_lam_u"))
    return (
        tf.join(F.broadcast(lam), "_b")
        .groupBy(id_col)
        .agg(F.max("_is_t").alias("is_target"),
             F.sum(F.col("_tf").cast("decimal(38,0)")
                   * F.col("_lam_u")).alias("_su"),
             F.sum("_tf").alias("n_tokens"))
        .select(id_col, "is_target", "n_tokens",
                (F.col("_su").cast("double") / F.lit(1e6))
                .alias("log_weight"))
    )


def dsir_select(df: DataFrame, target: Column, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = 4096, alpha: float = 1.0,
                hash_fn: str = "poly") -> DataFrame:
    """Top-``k`` pool documents by DSIR log weight (the deterministic
    top-k variant of the paper's Gumbel resampling — ties break on id,
    so the selection is reproducible run to run). Only non-target rows
    compete: target rows define the distribution, they are not
    re-selected. orderBy+limit plans TakeOrderedAndProject — per-
    partition heaps then a k-row merge, never a global sort."""
    w = dsir_log_weights(df, target, id_col=id_col, text_col=text_col,
                         n_buckets=n_buckets, alpha=alpha,
                         hash_fn=hash_fn)
    return (w.filter(~F.col("is_target"))
            .orderBy(F.col("log_weight").desc(), F.col(id_col))
            .limit(k)
            .select(id_col, "n_tokens", "log_weight"))


def remove_boilerplate_lines(df: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             min_doc_frac: tuple[int, int] = (1, 20),
                             min_docs: int = 2,
                             out_col: str = "clean_text") -> DataFrame:
    """Corpus-level boilerplate line removal (the RefinedWeb-style
    "line-wise correction"): a line that appears VERBATIM in at least
    ``max(min_docs, min_doc_frac)`` of the documents is boilerplate
    (nav bars, cookie banners, copyright footers — content that
    repeats across pages, unlike content lines which are unique) and
    is dropped from every document. Returns one row per input doc:
    (id, out_col, n_lines_removed) with surviving lines re-joined in
    their original order; a doc whose every line is boilerplate comes
    back as the empty string, not a missing row.

    ``min_doc_frac`` is a (num, den) rational and the threshold test
    is the integer cross-multiplication ``doc_freq * den >= num *
    n_docs`` — no float ceil at the boundary, so the cut replays
    bit-identically on any engine (a float 0.05*500 is 25.0000...01
    and ceils to 26; the rational form has no such edge).

    Scale shape: one posexplode; one (line) hash agg for distinct-doc
    frequencies; the 1-row doc count broadcast; one equi-join of the
    line table against the (much smaller) boilerplate set — join on
    the line value itself here, swap in xxhash64(line) keys when lines
    are long; one per-doc rebuild agg (array_sort by position, then
    array_join). No UDFs, no cross products, nothing driver-side.
    """
    num, den = min_doc_frac
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("_pos", "_line"))
    n_docs = F.broadcast(df.agg(F.count("*").alias("_n")))
    bad = (lines.groupBy("_line")
           .agg(F.countDistinct(id_col).alias("_df"))
           .crossJoin(n_docs)
           .filter((F.col("_df") >= min_docs)
                   & (F.col("_df") * den >= F.col("_n") * num))
           .select("_line", F.lit(True).alias("_bad")))
    flagged = lines.join(bad, "_line", "left")
    return (flagged.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.when(
                             F.col("_bad").isNull(),
                             F.struct("_pos", "_line")))),
                         lambda s: s["_line"]),
                     "\n").alias(out_col),
                 F.sum(F.when(F.col("_bad").isNotNull(), 1)
                       .otherwise(0)).cast("bigint")
                 .alias("n_lines_removed")))


def dedup_intra_doc_lines(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          out_col: str = "clean_text") -> DataFrame:
    """Within-document exact line dedup (the C4 "three-sentence/
    duplicate-line" family of line-wise rules, applied per doc):
    every repeated occurrence of a line inside one document is dropped,
    keeping the FIRST, and survivors are re-joined in original order.
    Complements :func:`remove_boilerplate_lines` (which drops lines
    shared ACROSS documents): chorus-style repetition inside a page —
    lyrics, spammy keyword walls, templated list spam — deflates here
    even when no other doc shares the line.

    Returns (id, out_col, n_lines_removed). One posexplode and one
    window keyed (id, line) ordered by position — the window key
    includes the doc id, so partition skew is bounded by the largest
    single DOCUMENT, never a corpus-wide hot line; then the same
    ordered array_sort rebuild as the boilerplate transform. No UDFs.
    """
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("_pos", "_line"))
    w = Window.partitionBy(id_col, "_line").orderBy("_pos")
    flagged = lines.withColumn("_occ", F.row_number().over(w))
    return (flagged.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.when(
                             F.col("_occ") == 1,
                             F.struct("_pos", "_line")))),
                         lambda s: s["_line"]),
                     "\n").alias(out_col),
                 F.sum(F.when(F.col("_occ") > 1, 1).otherwise(0))
                 .cast("bigint").alias("n_lines_removed")))


# --- CCNet perplexity partitioning ----------------------------------------


def perplexity_partition(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         labels: tuple[str, ...] = ("head", "middle",
                                                    "tail"),
                         discount: float = 0.75,
                         approx: bool = False,
                         approx_accuracy: int = 10000) -> DataFrame:
    """CCNet-style perplexity partition (Wenzek et al. 2020, public
    method): score every document under the corpus's own Kneser-Ney
    bigram LM, then split the corpus into ``len(labels)`` equal-
    population buckets by perplexity — ``head`` is the most-fluent
    (lowest-perplexity) slice that CCNet keeps outright, ``tail`` the
    one it drops or down-samples. Returns (id, perplexity, bucket,
    bucket_label); docs under 2 tokens emit no row (no bigram score
    exists — same contract as :func:`~.terms.kn_bigram_logprob`).

    Scale shape: the KN scorer's narrow aggs, then ONE percentile
    aggregation over the |docs|-row (id, ppl) frame whose boundary
    list rides back as a 1-row broadcast; assignment is a codegen'd
    count-of-boundaries-below — the ntile() spelling would funnel
    every row through a single-partition sort, this never does (the
    `equi_depth_histogram` discipline). Boundaries are rounded to
    6 dp before assignment and perplexities are already 6 dp, so the
    cut is deterministic and engine-replayable; values equal to a
    boundary land in the lower bucket.

    ``approx``: the default exact ``percentile`` is sort-based per
    aggregation buffer — its final aggregator holds EVERY DISTINCT
    value of the column, and per-doc 6-dp perplexity is effectively
    continuous, so that map grows ~linearly with the corpus: exact is
    the oracle/replay contract, NOT the 100-TB path. ``approx=True``
    swaps in ``approx_percentile`` (Greenwald-Khanna, bounded state:
    rank error <= 1/``approx_accuracy`` regardless of n) for the
    boundary step only — bucket populations then deviate from equal
    by at most the rank error, which is immaterial for the CCNet
    head/middle/tail use; the result is no longer bit-replayable
    cross-engine, hence opt-in (the same exact/approx split as
    quality.stats.population_stability_index).
    """
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.terms import kn_bigram_logprob

    n_buckets = len(labels)
    if n_buckets < 2:
        raise ValueError("perplexity_partition needs >= 2 labels")
    scores = kn_bigram_logprob(df, id_col, text_col, discount=discount)
    # pin_round6, not F.round: the perplexity feeds strict boundary
    # comparisons below, and a .5e-6 tie resolved differently by the
    # two engines' round() would flip a bucket assignment (the repo's
    # pinned-rounding doctrine; functions/numeric.py)
    scored = scores.select(
        F.col(id_col),
        pin_round6(F.exp(-F.col("mean_kn_logprob"))).alias("perplexity"))
    # persisted EAGERLY: consumed by the percentile agg AND the
    # assignment scan — those are separate jobs (the boundary broadcast
    # build vs the main query's AQE-materialized exchanges) that race a
    # lazy cache, each re-running the whole KN scorer pipeline (r12
    # stage profile: two near-identical 10-12 s stages)
    scored = scored.persist()
    scored.count()
    qs = [i / n_buckets for i in range(1, n_buckets)]
    qarr = ", ".join(map(str, qs))
    pct = (f"approx_percentile(perplexity, array({qarr}), "
           f"{approx_accuracy})" if approx
           else f"percentile(perplexity, array({qarr}))")
    bounds = F.broadcast(scored.agg(F.transform(
        F.expr(pct),
        lambda b: F.round(b, 6)).alias("_b")))
    bucket = F.size(F.filter(F.col("_b"),
                             lambda b: b < F.col("perplexity")))
    label = F.element_at(F.array(*[F.lit(x) for x in labels]),
                         bucket + 1)
    return track(
        scored.crossJoin(bounds)
        .select(id_col, "perplexity",
                bucket.cast("int").alias("bucket"),
                label.alias("bucket_label")),
        scored)


# --- DoReMi-style domain mixture weights ----------------------------------


def doremi_domain_weights(df: DataFrame, domain_col: str = "source",
                          text_col: str = "text",
                          n_iter: int = 5,
                          eta: tuple[int, int] = (1, 1),
                          smoothing: tuple[int, int] = (1, 10),
                          ) -> DataFrame:
    """Domain mixture weights by multiplicative-weights ascent on
    per-domain excess loss — the update rule of DoReMi (Xie et al.
    2023, "Doremi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining", public method), instantiated on STATIC excess
    losses: where the paper re-measures excess loss each step from a
    proxy model being trained, this engine-side variant measures it
    once from corpus-own n-gram models and runs the same
    exponentiated-gradient + renormalize + uniform-smoothing loop —
    the mixture initialization the paper's full training loop would
    refine, and the standing answer to "which domains does the
    current uniform mixture underserve".

    Excess loss per domain (clamped at 0, as the paper clips):
    ``mean_self_logprob - mean_shared_logprob`` — the slice's own
    add-one bigram model (:func:`~.terms.bigram_logprob_within`, the
    reference/specialist leg) minus the single corpus-wide model
    scored on the slice (:func:`~.terms.bigram_logprob` keyed by the
    domain, the proxy/generalist leg). A domain the shared model
    already fits has ~0 excess and decays toward the smoothing floor;
    a poorly-served domain compounds ``exp(eta * excess)`` per step.

    Determinism contract (the logreg discipline): both mean logprobs
    are ``grid_mean`` 6-dp outputs, the excess is re-pinned to BIGINT
    1e-6 units, ``exp(eta*excess)`` is ``pin_units``-pinned (the one
    transcendental), and every iteration is EXACT integer arithmetic:
    weight units x multiplier units, a DECIMAL(38,0) normalizer sum,
    and half-up integer rounding for both the renormalize and the
    ``(1-c)*w + c/k`` smoothing step (``a - a%b`` exact-division
    construction). Same inputs => bit-identical weights at any
    partitioning, replayed verbatim by a chained-CTE HUGEINT oracle.

    Scale shape: two n-gram scoring passes (narrow explodes + hash
    aggs), then ``n_iter`` iterations over the |domains|-row frame —
    each one 1-row-normalizer broadcast + a projection; per-iteration
    frames are persisted and carried on the release ledger. Domains
    with no bigram at all emit no row (no model exists to score them).

    EAGER EXECUTION CONTRACT: calling this function runs Spark jobs
    at construction time (the |domains|-row base frame embedding both
    n-gram scoring passes is eagerly ``localCheckpoint``-ed) — it is
    an executor, not a lazy plan builder.

    Returns (domain_col, excess_loss, weight): weight on the 1e-6
    grid, summing to ~1 (±k rounding units).
    """
    from pipelines_rj_sms_spark.functions.numeric import (LOG_SCALE,
                                                          pin_units)
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.terms import (
        bigram_logprob, bigram_logprob_within)

    eta_num, eta_den = eta
    c_num, c_den = smoothing
    if not (0 <= c_num <= c_den) or eta_den <= 0:
        raise ValueError("smoothing must be a [0,1] rational, eta > 0")
    shared = bigram_logprob(df, domain_col, text_col).select(
        F.col(domain_col).alias("_d"),
        F.col("mean_bigram_logprob").alias("_shared"))
    self_ = bigram_logprob_within(df, domain_col, text_col).select(
        F.col(domain_col).alias("_d"),
        F.col("mean_self_logprob").alias("_self"))
    # excess re-pinned to integer units: both means are exact grid
    # multiples, so the float subtraction is within 1 ulp of the true
    # k/1e6 and the half-up floor recovers k exactly on both engines
    ex_u = F.greatest(
        F.floor((F.col("_self") - F.col("_shared"))
                * F.lit(float(LOG_SCALE)) + F.lit(0.5)).cast("long"),
        F.lit(0).cast("long"))
    m_u = pin_units(F.exp(F.col("_ex_u").cast("double")
                          * F.lit(float(eta_num))
                          / F.lit(float(eta_den))
                          / F.lit(float(LOG_SCALE)))).cast("long")
    # eager checkpoint (r12): this |domains|-row frame embeds BOTH
    # corpus-scale n-gram scoring passes, and each iteration's 1-row
    # normalizer broadcast is a separate AQE job that would otherwise
    # re-derive them from source (the HITS pathology — profiled 20 s
    # executor time at sf0.01 for 5 iterations over 20 rows)
    base = (shared.join(self_, "_d")
            .withColumn("_ex_u", ex_u)
            .withColumn("_m_u", m_u)).localCheckpoint()
    k_row = F.broadcast(base.agg(
        F.count("*").cast("decimal(38,0)").alias("_k")))
    scale = F.lit(LOG_SCALE).cast("decimal(38,0)")

    def _half_up(a: F.Column, b: F.Column) -> F.Column:
        """round(a/b) for non-negative DECIMAL a, positive b, in exact
        integer arithmetic: (2a + b) div 2b via a - a%b."""
        num = a * 2 + b
        den = b * 2
        return ((num - num % den) / den).cast("decimal(38,0)")

    # w0 = round(SCALE/k) for every domain
    w = (base.crossJoin(k_row)
         .select("_d", "_ex_u", "_m_u",
                 _half_up(scale, F.col("_k")).alias("_w_u"), "_k"))
    pins = []
    for _ in range(int(n_iter)):
        w = track(w.persist())
        pins.append(w)
        p = w.withColumn("_p", F.col("_w_u") * F.col("_m_u"))
        z = F.broadcast(p.agg(
            F.sum("_p").cast("decimal(38,0)").alias("_z")))
        w = (p.crossJoin(z)
             .select("_d", "_ex_u", "_m_u", "_k",
                     _half_up(F.col("_p") * scale, F.col("_z"))
                     .alias("_wn")))
        # smoothing: w = round(((den-num)*wn*k + num*SCALE) / (den*k))
        w = w.select(
            "_d", "_ex_u", "_m_u", "_k",
            _half_up(F.lit(c_den - c_num).cast("decimal(38,0)")
                     * F.col("_wn") * F.col("_k")
                     + F.lit(c_num).cast("decimal(38,0)") * scale,
                     F.lit(c_den).cast("decimal(38,0)") * F.col("_k"))
            .alias("_w_u"))
    return track(w.select(
        F.col("_d").alias(domain_col),
        (F.col("_ex_u").cast("double") / F.lit(float(LOG_SCALE)))
        .alias("excess_loss"),
        (F.col("_w_u").cast("double") / F.lit(float(LOG_SCALE)))
        .alias("weight")), *pins)
