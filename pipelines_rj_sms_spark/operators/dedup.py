"""Deduplication operators — exact, keep-last, MinHash-LSH, SimHash,
n-gram Jaccard, embedding near-dup.

The reference needs keyed keep-last dedup (bq_to_subpav/utils.py:299-350,
minhasaude_mongodb/tasks.py:128-130 — W3/U2 in SURVEY §2) and cross-run
key-set dedup (J5). The fuzzy family (MinHash/SimHash/Jaccard) is the
training-data-pipeline extension: candidate generation must be *bucketed*
(band-hash equi-join) so the join is a shuffle on short keys, never an
O(n^2) cross product — that is the property that survives 100 TB.

Design notes for scale:
- keep-last uses a row_number window (deterministic under shuffle), never
  dropDuplicates (which keeps an arbitrary row per key).
- MinHash signatures are computed per-row with expression-only
  transform/aggregate over shingles — no UDF, no explode of the corpus
  until the (much smaller) banded candidate join.
- candidate pairs are generated with id_a < id_b to halve the join and
  avoid self-pairs; verification (exact Jaccard) runs only on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.text import shingles
from pipelines_rj_sms_spark.operators.cache import track


def _parallelize_narrow(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    arrives in fewer partitions (a small file = one task = one core busy).

    At real scale, file splits already give enough partitions and this is
    a no-op — it only pays the (tiny) shuffle when the input is narrower
    than the cluster, which is exactly when it's worth it.
    """
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover — Spark Connect has no SparkContext
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # width heuristic from inputFiles(), not df.rdd.getNumPartitions():
    # touching .rdd forces a full plan translation per call. File-backed
    # inputs with >= target splits are already wide enough; everything
    # else (small local relations, narrow files) pays the tiny shuffle.
    if len(df.inputFiles()) >= target:
        return df
    return df.repartition(target)


def dedup_keep_last(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """W3: deterministic keep-last per key (largest order_col wins; ties
    broken by all remaining columns to stay deterministic under shuffle)."""
    tiebreak = [F.col(c).desc() for c in df.columns if c not in keys and c != order_col]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(), *tiebreak)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id row per identical text.

    Plan: groupBy(md5(text)).agg(min(id)) — the aggregation shuffles
    16-byte hash + id pairs with a map-side partial min (never document
    bodies) — then a semi join on (hash, id) brings back the full winner
    rows. At 100 TB the winner set is the output size, and the agg-side
    shuffle stays tiny regardless of duplicate skew; a window over the
    hash would instead shuffle every body to the hash's partition.
    """
    hashed = df.withColumn("_h", F.md5(F.col(text_col)))
    keep = (
        hashed.select("_h", id_col)
        .groupBy("_h").agg(F.min(id_col).alias(id_col))
    )
    return hashed.join(keep, ["_h", id_col], "left_semi").drop("_h")


def paragraph_dedup(df: DataFrame, id_col: str, text_col: str,
                    sep: str = "\n\n", min_chars: int = 1,
                    out_col: str | None = None) -> DataFrame:
    """C4-style intra-corpus paragraph dedup: split each document on
    ``sep``, keep only the globally FIRST occurrence of each distinct
    paragraph (min (doc id, position)), and reassemble each document
    from its surviving paragraphs in original order. A document whose
    every comparable paragraph was seen earlier drops out of the result
    (nothing left to carry) — the C4 rule, not a bug.

    Plan: posexplode -> groupBy(md5(paragraph)).agg(min_by struct) —
    16-byte hashes + (id, pos) pairs shuffle, never paragraph bodies,
    with map-side partial min — then a semi join on (hash, id, pos)
    keeps winners and one groupBy(id) rebuilds the text (array_sort by
    kept position). Short fragments below ``min_chars`` pass through
    uncompared (whitespace runs are not evidence of duplication).
    """
    out_col = out_col or text_col
    # Spark split() takes a REGEX; \Q..\E quotes the separator literally
    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(f"\\Q{sep}\\E")))
        .alias("_pos", "_para"),
    )
    cmp = parts.filter(F.length("_para") >= min_chars)
    keep = (
        cmp.withColumn("_h", F.md5("_para"))
        .groupBy("_h")
        .agg(F.min(F.struct(id_col, "_pos")).alias("_w"))
        .select(F.col(f"_w.{id_col}").alias(id_col),
                F.col("_w._pos").alias("_pos"))
    )
    survivors = (
        parts.filter(F.length("_para") < min_chars)
        .unionByName(cmp.join(keep, [id_col, "_pos"], "left_semi"))
    )
    return (
        survivors.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_para")))
             .alias("_ps"))
        .select(F.col(id_col),
                F.array_join(F.transform("_ps", lambda s: s["_para"]),
                             sep).alias(out_col))
    )


def minhash_signature(df: DataFrame, text_col: str, num_hashes: int = 32,
                      shingle_n: int = 3, sig_col: str = "minhash",
                      hash_fn: str = "xxhash64") -> DataFrame:
    """Add a MinHash signature column (array<bigint> or array<string>).

    Each hash slot i is min over shingles of hash(shingle, seed=i).
    hash_fn='xxhash64' (default, fast JVM path): xxhash64 takes extra
    literal args as part of the hashed tuple, giving num_hashes
    independent permutation approximations in one projection.
    hash_fn='md5' is the engine-portable family (used for
    oracle-differential testing): slot i is the min over shingles of
    an 8-hex-char (32-bit) slice of md5(seed-group || shingle) — four
    slots share one md5 call, so the hot path pays ceil(num_hashes/4)
    digests per shingle instead of num_hashes (measured ~25% off the
    whole sf0.1 signature projection; tokenize+shingle dominates the
    rest). 32-bit slot entropy keeps min-collision odds at
    ~|shingles|/2^32 per pair — immaterial for banding.
    """
    # Materialize the shingle array in its own projection: referencing the
    # raw shingles() expression from every slot makes Catalyst duplicate
    # the whole tokenize+shingle tree num_hashes times (~6x slower
    # measured at 5k docs x 8 hashes).
    shingled = df.withColumn("_sh", shingles(text_col, shingle_n))
    sh = F.col("_sh")

    # seeds/offsets must be captured via factories: a `lambda s, i=i`
    # would be seen by pyspark as a binary (element, index) lambda and
    # i would become the array-index column instead of the captured
    # value.
    if hash_fn == "md5":
        n_groups = -(-num_hashes // 4)

        def mh_col(g: int):
            return F.transform(
                sh, lambda s: F.md5(F.concat(F.lit(f"{g}:"), s)))

        # one md5 array per seed group, materialized once (separate
        # transform lambdas would re-digest per slot — Catalyst does
        # not CSE across higher-order functions)
        for g in range(n_groups):
            shingled = shingled.withColumn(f"_mh{g}", mh_col(g))

        def slot(i: int):
            g, off = divmod(i, 4)

            def slice_of(h):
                return F.substring(h, 1 + 8 * off, 8)

            return F.array_min(F.transform(F.col(f"_mh{g}"), slice_of))

        drop = ["_sh"] + [f"_mh{g}" for g in range(n_groups)]
    else:
        def slot(i: int):
            def hashed(s):
                return F.xxhash64(s, F.lit(i))
            return F.array_min(F.transform(sh, hashed))

        drop = ["_sh"]
    return (
        shingled.withColumn(
            sig_col, F.array(*[slot(i) for i in range(num_hashes)]))
        .drop(*drop)
    )


def minhash_lsh_candidates(df: DataFrame, id_col: str, text_col: str,
                           num_hashes: int = 32, bands: int = 8,
                           shingle_n: int = 3,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """MinHash + LSH banding: returns candidate pairs (id_a, id_b).

    shingle -> minhash -> split signature into ``bands`` bands -> hash each
    band -> self-equi-join on (band_idx, band_hash). The join key has
    ~corpus/bucket cardinality, so Catalyst plans a plain shuffled hash
    join; no cross product ever materializes.
    """
    sig = minhash_signature(_parallelize_narrow(df.select(id_col, text_col)),
                            text_col, num_hashes, shingle_n, hash_fn=hash_fn)
    banded = lsh_bands(sig, id_col, num_hashes, bands, hash_fn=hash_fn)
    # persist: the self-join references `banded` twice — without this the
    # whole shingle+hash pipeline runs once per side (2x measured cost at
    # 5k docs; fatal at 100 TB).
    banded = banded.persist()
    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(
            right,
            (F.col(f"a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    # register the persisted subplan for cache.release() — long-lived
    # sessions calling this repeatedly must be able to free the blocks
    return track(pairs, banded)


def lsh_bands(sig_df: DataFrame, id_col: str, num_hashes: int,
              bands: int, hash_fn: str = "xxhash64",
              sig_col: str = "minhash") -> DataFrame:
    """(id, band_idx, band_hash) rows from a signature table.

    Pure expression over the signature array, so it applies equally to
    a freshly computed batch and to a signature store read back from
    the lakehouse — the incremental-dedup path depends on both sides
    banding identically.
    """
    rows_per_band = num_hashes // bands
    band_hasher = F.md5 if hash_fn == "md5" else F.xxhash64
    return sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[
                band_hasher(F.concat_ws(
                    ",", *[F.col(sig_col)[b * rows_per_band + r].cast("string")
                           for r in range(rows_per_band)]
                )).cast("string")
                for b in range(bands)
            ])
        ).alias("band_idx", "band_hash"),
    )


def sig_agreement(sig_a, sig_b, num_hashes: int):
    """Estimated Jaccard from two MinHash signatures: the fraction of
    agreeing slots (an unbiased estimator of true shingle Jaccard)."""
    return (
        F.aggregate(
            F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
            F.lit(0), lambda acc, x: acc + x,
        ) / F.lit(float(num_hashes))
    )


def incremental_lsh_dedup(new_df: DataFrame, sig_store: DataFrame | None,
                          id_col: str, text_col: str,
                          num_hashes: int = 32, bands: int = 8,
                          shingle_n: int = 3, sim_threshold: float = 0.5,
                          hash_fn: str = "xxhash64",
                          ) -> tuple[DataFrame, DataFrame]:
    """Dedup an ingest batch against an already-ingested corpus WITHOUT
    re-reading the corpus — the 100 TB continuous-ingestion shape.

    ``sig_store`` is the persisted signature table of everything
    accepted so far: (id, minhash array), ~num_hashes longs per doc
    (a few hundred bytes — the corpus text itself never participates).
    Candidates come from LSH band collisions (new vs store, plus new vs
    new); each candidate is then *verified* from signatures alone via
    slot agreement >= ``sim_threshold``, the unbiased MinHash estimate
    of shingle Jaccard. Among new-batch duplicates the lowest id wins;
    any new doc matching the store is dropped. Ids must be unique
    across store and batch.

    Returns ``(accepted, accepted_sigs)``; append ``accepted_sigs`` to
    the store (e.g. via the lakehouse sink) to ingest the next batch.
    Re-merging an already-appended batch is harmless for dedup
    correctness (its re-ingested twins would just be rejected).

    Scale: per batch this is two equi-joins on (band_idx, band_hash)
    whose build side is the NEW batch's bands (small), never the
    store's full band table on the probe side of a shuffle — plus the
    batch's internal self-join. Store bands derive from the signature
    array on the fly (pure projection); at 100 TB the store is still
    only ~0.1% the corpus bytes.
    """
    new_sigs = minhash_signature(
        _parallelize_narrow(new_df.select(id_col, text_col)),
        text_col, num_hashes, shingle_n, hash_fn=hash_fn,
    ).select(id_col, "minhash").persist()
    new_bands = lsh_bands(new_sigs, id_col, num_hashes, bands,
                          hash_fn=hash_fn).persist()

    def verified(cands: DataFrame, other_sigs: DataFrame) -> DataFrame:
        """Candidate (new_id, other_id) pairs -> distinct new_id whose
        signature agreement clears the threshold."""
        a = new_sigs.select(F.col(id_col).alias("new_id"),
                            F.col("minhash").alias("_sa"))
        b = other_sigs.select(F.col(id_col).alias("other_id"),
                              F.col("minhash").alias("_sb"))
        return (
            cands.join(a, "new_id").join(b, "other_id")
            .filter(sig_agreement(F.col("_sa"), F.col("_sb"),
                                  num_hashes) >= sim_threshold)
            .select("new_id").distinct()
        )

    dropped = []
    if sig_store is not None:
        store_bands = lsh_bands(sig_store, id_col, num_hashes, bands,
                                hash_fn=hash_fn)
        cand_hist = (
            new_bands.alias("a")
            .join(store_bands.alias("b"),
                  (F.col("a.band_idx") == F.col("b.band_idx"))
                  & (F.col("a.band_hash") == F.col("b.band_hash")))
            .select(F.col(f"a.{id_col}").alias("new_id"),
                    F.col(f"b.{id_col}").alias("other_id"))
            .distinct()
        )
        dropped.append(verified(cand_hist, sig_store))

    cand_new = (
        new_bands.alias("a")
        .join(new_bands.alias("b"),
              (F.col("a.band_idx") == F.col("b.band_idx"))
              & (F.col("a.band_hash") == F.col("b.band_hash"))
              & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("new_id"),
                F.col(f"b.{id_col}").alias("other_id"))
        .distinct()
    )
    dropped.append(verified(cand_new, new_sigs))

    drop_ids = dropped[0]
    for d in dropped[1:]:
        drop_ids = drop_ids.unionAll(d)
    drop_ids = drop_ids.withColumnRenamed("new_id", id_col).distinct()

    accepted = track(new_df.join(drop_ids, id_col, "left_anti"),
                     new_sigs, new_bands)
    accepted_sigs = new_sigs.join(drop_ids, id_col, "left_anti")
    return accepted, accepted_sigs


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        shingle_n: int = 3, threshold: float = 0.8,
                        candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity over candidate pairs.

    With ``candidates`` (e.g. from LSH) this verifies only those pairs;
    without, candidates are generated by sharing at least one shingle
    (equi-join on shingle — still never a cross product, but write
    amplification is O(shared shingles); use LSH at scale).
    Returns (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    sh = df.select(
        F.col(id_col), shingles(text_col, shingle_n).alias("_sh")
    ).select(id_col, "_sh", F.size("_sh").alias("_n"))
    sh = _parallelize_narrow(sh).persist()  # referenced by both join sides
    if candidates is None:
        # join on xxhash64(shingle), not the shingle text: the shuffle key
        # drops from ~tens of bytes to 8 and the equi-compare is a long
        # compare (~2x faster at sf0.1; collision odds over a 100 TB
        # corpus' distinct shingles are ~2^-64 per pair — below any
        # practical dedup threshold concern)
        #
        # persist the EXPLODED+HASHED frame, not just sh (r12): both
        # self-join sides consume `exploded`, and caching one level
        # below it left the explode + per-shingle xxhash64 running
        # twice (r12 stage profile of leakage_safe_split: two
        # identical 12 MB map stages, 15.1 s + 4.8 s executor). Narrow
        # (id, n, hash) rows, MEMORY_AND_DISK evictable, released via
        # the track ledger like every candidate generator here.
        exploded = sh.select(
            id_col, "_n",
            F.explode(F.transform("_sh", lambda s: F.xxhash64(s))).alias("_s"),
        ).persist()
        a = exploded.alias("a")
        b = exploded.alias("b")
        # length-ratio prune (PPJoin-style): jaccard <= min(n)/max(n), so
        # pairs whose sizes differ beyond the threshold can never qualify —
        # cut them in the join condition, before the intersection count
        size_ok = (
            F.least(F.col("a._n"), F.col("b._n"))
            >= threshold * F.greatest(F.col("a._n"), F.col("b._n"))
        )
        inter = (
            a.join(b, (F.col("a._s") == F.col("b._s"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                   & size_ok)
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a._n").alias("n_a"),
                F.col("b._n").alias("n_b"),
            )
            .agg(F.count("*").alias("inter"))
        )
    else:
        a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a"),
                      F.col("_n").alias("n_a"))
        b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b"),
                      F.col("_n").alias("n_b"))
        inter = (
            candidates.join(a, "id_a").join(b, "id_b")
            # same length-ratio prune: skip the O(n) array_intersect for
            # candidate pairs that cannot reach the threshold
            .filter(F.least("n_a", "n_b") >= threshold * F.greatest("n_a", "n_b"))
            .select(
                "id_a", "id_b", "n_a", "n_b",
                F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            )
        )
    out = (
        inter.withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    out = track(out, sh)
    if candidates is None:
        out = track(out, exploded)
    else:
        out = track(out, candidates)
    return out


def winnow_overlap_pairs(df: DataFrame, id_col: str, text_col: str,
                         k: int = 8, w: int = 4, min_shared: int = 2,
                         max_df: int | None = 1000,
                         hash_fn: str = "xxhash64") -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    (substring-level overlap/plagiarism detection, the MOSS pipeline).

    Winnowing guarantees any shared substring of length >= k+w-1
    produces a shared fingerprint, so recall is structural, not
    probabilistic. Candidate generation is an equi-join on the exploded
    8-byte fingerprints (never a cross product); the groupBy count then
    ranks pairs by overlap strength. Returns (id_a, id_b, n_shared).

    ``max_df`` drops fingerprints occurring in more than that many
    documents before the self-join (the MOSS "ignore boilerplate" rule).
    This is not just precision hygiene — it is the scale guard: one
    fingerprint shared by D documents emits D^2/2 join rows, so a
    boilerplate k-gram in a million docs is a 5*10^11-row hot key. With
    the cap, per-key fan-out is bounded by max_df^2 (measured: the
    uncapped join OOMs a 128 GiB local run at a 5k-doc templated
    corpus; capped, it finishes in seconds with identical rare-overlap
    pairs). Pass None only for tiny, trusted-diverse corpora.
    """
    from pipelines_rj_sms_spark.functions.text import winnow_fingerprints

    fps = df.select(
        F.col(id_col),
        F.explode(winnow_fingerprints(text_col, k=k, w=w, hash_fn=hash_fn))
        .alias("_fp"),
    )
    fps = _parallelize_narrow(fps).persist()  # both join sides
    raw_fps = fps
    if max_df is not None:
        # sketch arrays are distinct per doc, so count(*) = doc frequency
        hot = (fps.groupBy("_fp").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_df).select("_fp"))
        fps = fps.join(hot, "_fp", "left_anti").persist()
    a, b = fps.alias("a"), fps.alias("b")
    out = (
        a.join(b, (F.col("a._fp") == F.col("b._fp"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return track(out, raw_fps, fps)


def contamination_overlap(corpus: DataFrame, benchmark: DataFrame,
                          id_col: str, text_col: str,
                          k: int = 8, w: int = 4, min_shared: int = 2,
                          max_df: int | None = 1000,
                          hash_fn: str = "xxhash64") -> DataFrame:
    """Train/eval contamination check: corpus documents sharing >=
    ``min_shared`` winnowing fingerprints with any benchmark document —
    the standard decontamination gate before a corpus becomes training
    data (same guarantee as winnow_overlap_pairs: any shared substring
    of length >= k+w-1 is caught; recall is structural).

    Both sides are fingerprinted once via a tagged union so the
    boilerplate ``max_df`` cap sees combined document frequency (a
    k-gram common across corpus AND benchmark is exactly the hot key
    the cap exists for). The join is benchmark-side-filtered before the
    shuffle; with a small benchmark (the usual case) AQE broadcasts it.
    Returns (id_corpus, id_bench, n_shared).
    """
    from pipelines_rj_sms_spark.functions.text import winnow_fingerprints

    tagged = (
        corpus.select(F.col(id_col), F.col(text_col), F.lit("c").alias("_side"))
        .unionByName(benchmark.select(
            F.col(id_col), F.col(text_col), F.lit("b").alias("_side")))
    )
    fps = tagged.select(
        "_side", F.col(id_col),
        F.explode(winnow_fingerprints(text_col, k=k, w=w, hash_fn=hash_fn))
        .alias("_fp"),
    )
    fps = _parallelize_narrow(fps).persist()
    raw_fps = fps
    if max_df is not None:
        hot = (fps.groupBy("_fp").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_df).select("_fp"))
        fps = fps.join(hot, "_fp", "left_anti").persist()
    c = fps.filter(F.col("_side") == "c").alias("c")
    b = fps.filter(F.col("_side") == "b").alias("b")
    out = (
        c.join(b, F.col("c._fp") == F.col("b._fp"))
        .groupBy(F.col(f"c.{id_col}").alias("id_corpus"),
                 F.col(f"b.{id_col}").alias("id_bench"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return track(out, raw_fps, fps)


def connected_components(edges: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", nodes: DataFrame | None = None,
                         node_col: str | None = None,
                         max_iter: int = 50) -> DataFrame:
    """Collapse duplicate-pair edges into clusters: returns (node,
    component) where component = the smallest node id reachable through
    the pair graph — the canonical representative every dedup pipeline
    keeps while dropping the rest of the cluster.

    Algorithm: synchronous min-label propagation — every node repeatedly
    takes the min of its own label and its neighbors' labels; converges
    in O(graph diameter) rounds (near-dup clusters are shallow, so
    typically 2-5). Each round is one equi-join + one hash aggregation
    on node ids — never materializing the transitive closure, which is
    O(sum of cluster size^2) and the reason the naive all-pairs spelling
    cannot survive a large corpus. Converged state is detected by an
    any-label-changed probe; raises if ``max_iter`` rounds don't settle
    (a diameter-``max_iter`` path graph — not a dedup-shaped input).

    ``nodes``/``node_col`` adds isolated nodes (no edges) as their own
    singleton components.

    EAGER EXECUTION CONTRACT: calling this function runs Spark jobs at
    DataFrame-construction time (the edge projection is eagerly
    ``localCheckpoint``-ed, and each label round runs a convergence
    probe) — it is an executor, not a lazy plan builder. Callers that
    compose plans speculatively should defer the call until the edges
    are final.

    Each round's labels are ``localCheckpoint``-ed: without lineage
    truncation the logical plan doubles per iteration (labels(i) embeds
    the full join tree of labels(i-1)) and plan compilation itself OOMs
    after ~10 rounds — found by the randomized union-find equivalence
    test, not by small fast-converging examples. On a cluster where
    executor loss matters, set a checkpoint dir and swap in reliable
    ``checkpoint()``; the truncation requirement is the same.
    """
    # materialize the caller's edge pipeline ONCE before symmetrizing:
    # the two union branches each embed the full (often expensive —
    # ngram-Jaccard / blocking+scoring) edge computation, and a plain
    # persist cannot dedupe the cold start because AQE materializes the
    # branches' subtrees as concurrent jobs that race the cache. The
    # eager node-pair checkpoint is narrow (two ids per edge) and this
    # operator already runs actions (the per-round convergence probe).
    ed = edges.select(F.col(id_a).alias("src"),
                      F.col(id_b).alias("dst")).localCheckpoint()
    und = (
        ed.unionByName(ed.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    if nodes is not None:
        if node_col is None:
            raise ValueError("node_col required when nodes is given")
        base = nodes.select(F.col(node_col).alias("node")).distinct()
    else:
        base = und.select(F.col("src").alias("node")).distinct()
    labels = base.select("node", F.col("node").alias("label")).persist()

    for _ in range(max_iter):
        nbr = (
            und.join(
                labels.select(F.col("node").alias("dst"),
                              F.col("label").alias("dst_label")),
                "dst")
            .groupBy("src").agg(F.min("dst_label").alias("nbr_min"))
            .select(F.col("src").alias("node"), "nbr_min")
        )
        new_labels = (
            labels.select("node", F.col("label").alias("old_label"))
            .join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("old_label"),
                        F.coalesce("nbr_min", F.col("old_label")))
                .alias("label"),
                "old_label",
            )
            .localCheckpoint()
        )
        changed = (new_labels.filter(F.col("label") != F.col("old_label"))
                   .limit(1).count())
        labels.unpersist()
        labels = new_labels.drop("old_label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds")
    und.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def canonical_per_cluster(components: DataFrame, scored: DataFrame,
                          id_col: str, score_col: str,
                          node_col: str = "node",
                          comp_col: str = "component") -> DataFrame:
    """Pick one representative per dedup cluster: highest ``score_col``
    wins, ties break to the lowest id — the "keep the best copy, not an
    arbitrary one" step after :func:`connected_components` (quality-
    aware canonicalization; min-id keep is what you get if ``scored``
    carries a constant score).

    ``scored`` is (id, score) — typically the quality-score projection
    of the corpus. Returns (component, id, score) of the winners; one
    row per cluster, singletons included.

    Scale: one equi-join on node id + one row_number window keyed on
    the component label. Cluster sizes bound the window partitions and
    near-dup clusters are small by construction, so no skew guard is
    needed beyond AQE.
    """
    from pyspark.sql import Window

    joined = components.join(
        scored, components[node_col] == scored[id_col]
    ).select(comp_col, F.col(id_col), F.col(score_col))
    w = Window.partitionBy(comp_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc())
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def simhash(df: DataFrame, text_col: str, bits: int = 64,
            out_col: str = "simhash", hash_fn: str = "xxhash64") -> DataFrame:
    """64-bit SimHash per document, expression-only.

    Token hash = xxhash64(token); each bit of the fingerprint is the sign
    of the sum over tokens of (+1 if bit set else -1).
    hash_fn='md5' derives a 60-bit token hash from the first 15 md5 hex
    chars (conv base16->10) — slower than xxhash64 but portable to any
    SQL engine, used for oracle-differential testing (fingerprint bits
    60..63 are then deterministically 0 on both sides).

    Single array-state aggregate: one pass over the token array carrying
    an array<long> of per-bit counts, then one fold packing signs into
    the fingerprint. (The earlier shape — ``bits`` separate aggregate()
    expressions — compiled a ~64x larger codegen unit and re-walked the
    token array per bit: 4x slower cold, 2x warm, measured at sf0.1.)
    """
    if hash_fn == "md5":
        def tok_hash(t):
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    else:
        def tok_hash(t):
            return F.xxhash64(t)
    hashed = df.withColumn(
        "_th",
        F.transform(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
            ),
            tok_hash,
        ),
    )
    counts = (
        f"aggregate(_th, array_repeat(0L, {bits}), "
        f"(acc, h) -> zip_with(acc, sequence(0, {bits - 1}), "
        f"(a, b) -> a + IF((shiftright(h, CAST(b AS INT)) & 1) = 1, 1L, -1L)))"
    )
    fingerprint = (
        f"aggregate(zip_with(_counts, sequence(0, {bits - 1}), "
        f"(c, b) -> IF(c > 0, shiftleft(1L, CAST(b AS INT)), 0L)), "
        f"0L, (acc, x) -> acc | x)"
    )
    return (
        hashed.withColumn("_counts", F.expr(counts))
        .withColumn(out_col, F.expr(fingerprint))
        .drop("_th", "_counts")
    )


def simhash_near_dupes(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate generation: split the 64-bit fingerprint into
    (max_hamming+1) 16-bit blocks — by pigeonhole, any pair within the
    distance budget agrees on at least one block, so an equi-join on
    (block_idx, block_value) finds all candidates without a cross join.
    """
    blocks = 4
    sh = simhash(_parallelize_narrow(df.select(id_col, text_col)), text_col,
                 hash_fn=hash_fn)
    parts = sh.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(blocks)
        ])).alias("block_idx", "block_val"),
    )
    parts = parts.persist()  # referenced by both join sides
    a, b = parts.alias("a"), parts.alias("b")
    cand = (
        a.join(b, (F.col("a.block_idx") == F.col("b.block_idx"))
               & (F.col("a.block_val") == F.col("b.block_val"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    out = (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return track(out, parts)


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      shingle_n: int = 3,
                      threshold: float = 0.8,
                      max_df: int | None = 1000) -> DataFrame:
    """Asymmetric shingle containment — the quote/subset detector the
    symmetric Jaccard misses: a short doc fully embedded in a long one
    has tiny Jaccard but containment(short→long) ≈ 1. Broder's
    containment coefficient |A∩B|/|A| (public), both directions per
    pair; pairs qualify when EITHER direction reaches ``threshold``.

    Same execution shape as `ngram_jaccard_pairs` (8-byte shingle-hash
    equi-join, id_a < id_b inside the condition, persisted shingle
    subplan) minus the length-ratio prune — size asymmetry is exactly
    what containment looks for, so that prune would delete the signal.
    The fan-out bound comes from ``max_df`` instead (same cap as
    `winnow_overlap_pairs`): shingle hashes appearing in more than
    ``max_df`` docs are boilerplate, not quotation signal, and are
    dropped BEFORE the self-join — per-shingle pair fan-out is then
    bounded by max_df², where unpruned a single 1M-doc boilerplate
    shingle would emit ~10¹² pairs. Containment stays EXACT over the
    retained shingle vocabulary: the per-doc denominator is recomputed
    as the doc's count of surviving shingles, so both numerator and
    denominator see the same vocabulary (an unbiased restriction, not
    a truncation of the numerator only). ``max_df=None`` disables the
    cap for small corpora. Returns (id_a, id_b, inter, containment_a,
    containment_b) — containment_a = share of A's retained shingles
    inside B.
    """
    sh = df.select(
        F.col(id_col), shingles(text_col, shingle_n).alias("_sh"))
    sh = _parallelize_narrow(sh).persist()
    exploded = sh.select(
        id_col,
        F.explode(F.transform("_sh", lambda s: F.xxhash64(s))).alias("_s"))
    if max_df is not None:
        # shingle arrays are distinct per doc -> count(*) = doc freq
        hot = (exploded.groupBy("_s").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_df).select("_s"))
        exploded = exploded.join(hot, "_s", "left_anti")
    # Materialize EAGERLY: the filtered frame has THREE consumers (the
    # two per-doc size aggs below key on different output aliases, so
    # their exchanges cannot be reused, plus the self-join) and AQE
    # submits their subtree jobs concurrently — with a lazy persist all
    # three raced the cache and re-derived the explode+hash from `sh`
    # (r12 stage profile: three near-identical 6-9 s stages).
    exploded = exploded.persist()
    exploded.count()
    sized = exploded.groupBy(id_col).agg(F.count("*").alias("_n"))
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a._s") == F.col("b._s"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter")))
    out = (
        inter
        .join(sized.select(F.col(id_col).alias("id_a"),
                           F.col("_n").alias("_na")), "id_a")
        .join(sized.select(F.col(id_col).alias("id_b"),
                           F.col("_n").alias("_nb")), "id_b"))
    ca = F.col("inter") / F.col("_na")
    cb = F.col("inter") / F.col("_nb")
    out = (out.filter(F.greatest(ca, cb) >= threshold)
           .select("id_a", "id_b", "inter",
                   F.round(ca, 6).alias("containment_a"),
                   F.round(cb, 6).alias("containment_b")))
    return track(out, sh, exploded)


def _token_windows(df: DataFrame, id_col: str, text_col: str,
                   k: int) -> DataFrame:
    """(id, _pos, _h): one row per k-token window, _pos 1-based over the
    whitespace tokenization, _h a 60-bit portable hash (first 15 md5
    hex chars — replayable by any SQL engine, same construction as
    winnowing's 32-bit variant but wider because span dedup treats a
    collision as a false duplicate, not just a candidate to verify)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""))
    base = df.select(F.col(id_col), toks.alias("_toks"))
    # NB: Spark sequence(1, 0) yields DESCENDING [1, 0], not empty —
    # docs shorter than k tokens must produce an explicit empty array
    n_wins = F.size("_toks") - k + 1
    idx = F.when(n_wins >= 1, F.sequence(F.lit(1), n_wins)) \
        .otherwise(F.array().cast("array<int>"))
    wins = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice("_toks", i, k))),
                        1, 15), 16, 10).cast("long"))
    return base.select(
        id_col, F.posexplode(wins).alias("_pos0", "_h")
    ).select(id_col, (F.col("_pos0") + 1).alias("_pos"), "_h")


def duplicate_token_spans(df: DataFrame, id_col: str, text_col: str,
                          k: int = 8) -> DataFrame:
    """Exact duplicated-substring detection, Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better") in its
    windowed form: every maximal token span whose every k-token window
    occurs MORE THAN ONCE in the corpus (in another document or at
    another position of the same one). The suffix-array construction of
    the paper finds spans >= k exactly; the k-token window form here is
    its shuffle-friendly equivalent — a span of w >= k duplicated
    tokens is covered by w-k+1 duplicated windows, which merge back
    into one maximal span per document.

    Returns one row per (document, maximal span): (id, span_start,
    span_end, n_windows) with 0-based inclusive token positions.

    Scale shape: tokenize once, hash per window (expression-only),
    shuffle ONLY (id, pos, 60-bit hash) triples — never text; the
    duplicate-hash set is a hash-keyed aggregation with map-side
    partial counts; span merge is a per-document window over that
    document's duplicated positions (bounded per-group frame, the
    sanctioned window class). Nothing all-pairs, nothing driver-side.
    """
    wins = _token_windows(df, id_col, text_col, k).persist()
    dup = (wins.groupBy("_h").agg(F.count("*").alias("_c"))
           .filter(F.col("_c") > 1).select("_h"))
    hits = wins.join(dup, "_h", "left_semi")
    w = Window.partitionBy(id_col).orderBy("_pos")
    runs = hits.withColumn("_grp", F.col("_pos") - F.row_number().over(w))
    out = (runs.groupBy(id_col, "_grp")
           .agg(F.min("_pos").alias("_s"), F.max("_pos").alias("_e"),
                F.count("*").alias("n_windows"))
           .select(F.col(id_col),
                   (F.col("_s") - 1).cast("long").alias("span_start"),
                   (F.col("_e") + k - 2).cast("long").alias("span_end"),
                   F.col("n_windows").cast("long").alias("n_windows")))
    return track(out, wins)


def remove_duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                           k: int = 8,
                           out_col: str | None = None) -> DataFrame:
    """Companion cleanup to :func:`duplicate_token_spans`: drop every
    token covered only by duplicated windows, EXCEPT in the occurrence
    holding each window-hash's global first position (min (id, pos) —
    the deterministic "keep one copy" rule), then reassemble each
    document from its surviving tokens in order. Documents reduced to
    nothing drop out (the C4/paragraph_dedup posture).

    Cost note: coverage explodes each duplicated window to its k
    covered positions — k x duplicated-window rows, the direct
    trade for never materializing suffix arrays. Hash-and-position
    triples only; text stays in the final per-document rebuild.
    """
    out_col = out_col or text_col
    # original-case tokens for the rebuild (hashing lowercases inside
    # _token_windows; positions align because the split is identical)
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda x: x != F.lit(""))
    base = df.select(F.col(id_col), toks.alias("_toks")).persist()
    tokens = base.select(
        id_col, F.posexplode("_toks").alias("_tpos0", "_tok")
    ).select(id_col, (F.col("_tpos0") + 1).alias("_tpos"), "_tok")

    wins = _token_windows(df, id_col, text_col, k).persist()
    byh = (wins.groupBy("_h")
           .agg(F.count("*").alias("_c"),
                F.min(F.struct(id_col, "_pos")).alias("_first")))
    dup_wins = (wins.join(byh.filter(F.col("_c") > 1), "_h")
                .withColumn("_keep",
                            (F.col(f"_first.{id_col}") == F.col(id_col))
                            & (F.col("_first._pos") == F.col("_pos"))))
    # positions covered by >=1 removable duplicated window, minus
    # positions covered by any kept (first-occurrence) window
    cover = dup_wins.select(
        id_col, "_keep",
        F.explode(F.sequence(F.col("_pos"),
                             F.col("_pos") + k - 1)).alias("_tpos"))
    removable = (cover.filter(~F.col("_keep"))
                 .select(id_col, "_tpos").distinct()
                 .join(cover.filter(F.col("_keep"))
                       .select(id_col, "_tpos").distinct(),
                       [id_col, "_tpos"], "left_anti"))
    survivors = tokens.join(removable, [id_col, "_tpos"], "left_anti")
    out = (survivors.groupBy(id_col)
           .agg(F.array_sort(F.collect_list(F.struct("_tpos", "_tok")))
                .alias("_ts"))
           .select(F.col(id_col),
                   F.array_join(F.transform("_ts", lambda s: s["_tok"]),
                                " ").alias(out_col)))
    return track(out, base, wins)


def span_hash_store(df: DataFrame, id_col: str, text_col: str,
                    k: int = 8) -> DataFrame:
    """Bootstrap a window-hash store for :func:`incremental_span_dedup`
    from an existing corpus: one row per k-token window hash (column
    ``_h``). Expression-only projection + explode; distinct is left to
    the store writer (the probe side only checks existence)."""
    return _token_windows(df, id_col, text_col, k).select("_h")


def incremental_span_dedup(new_df: DataFrame,
                           span_store: DataFrame | None,
                           id_col: str, text_col: str, k: int = 8,
                           out_col: str | None = None,
                           ) -> tuple[DataFrame, DataFrame]:
    """Exact-substring span dedup of an ingest batch against an
    already-ingested corpus WITHOUT re-reading the corpus — the
    continuous-ingestion form of :func:`remove_duplicate_spans`
    (same shape as :func:`incremental_lsh_dedup`).

    ``span_store`` is the persisted window-hash table of everything
    accepted so far: one 60-bit hash per k-token window in column
    ``_h`` — 8 bytes per window; the corpus text never participates.
    Removal rule (arrival order defines the kept copy): a window whose
    hash exists in the store is removable in EVERY batch occurrence
    (the corpus holds the keeper — a batch-first occurrence does NOT
    protect it); among store-unseen hashes duplicated within the
    batch, the global min (id, pos) occurrence keeps its copy.

    Returns ``(cleaned, new_hashes)`` where ``new_hashes`` are the
    window hashes of the CLEANED text (the store stays an exact image
    of stored content — kept copies re-emit their hashes; removed
    spans' hashes are already in the store or kept elsewhere in the
    batch). Append ``new_hashes`` to the store for the next batch;
    re-appending is harmless (the store is only probed for existence).

    Scale: window hashing is expression-only; the store probe is ONE
    equi-join on the 8-byte hash with the batch's windows as the small
    side; the within-batch pass is the :func:`remove_duplicate_spans`
    machinery on the batch alone. Store growth is O(corpus tokens) of
    8-byte hashes — ~2% of corpus bytes at k=8 whitespace tokens.
    """
    out_col = out_col or text_col
    wins = _token_windows(new_df, id_col, text_col, k).persist()

    if span_store is not None:
        store_h = (span_store.select(F.col("_h")).distinct()
                   .withColumn("_in_store", F.lit(True)))
        marked = wins.join(store_h, "_h", "left")
    else:
        marked = wins.withColumn("_in_store",
                                 F.lit(None).cast("boolean"))
    in_store = F.coalesce(F.col("_in_store"), F.lit(False))

    byh = (wins.groupBy("_h")
           .agg(F.count("*").alias("_c"),
                F.min(F.struct(id_col, "_pos")).alias("_first")))
    dup_wins = (
        marked.join(byh, "_h")
        .filter((F.col("_c") > 1) | in_store)
        .withColumn(
            "_keep",
            (F.col(f"_first.{id_col}") == F.col(id_col))
            & (F.col("_first._pos") == F.col("_pos"))
            & ~in_store)
        .select(id_col, "_pos", "_keep"))

    cover = dup_wins.select(
        id_col, "_keep",
        F.explode(F.sequence(F.col("_pos"),
                             F.col("_pos") + k - 1)).alias("_tpos"))
    removable = (cover.filter(~F.col("_keep"))
                 .select(id_col, "_tpos").distinct()
                 .join(cover.filter(F.col("_keep"))
                       .select(id_col, "_tpos").distinct(),
                       [id_col, "_tpos"], "left_anti"))

    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda x: x != F.lit(""))
    tokens = (new_df.select(F.col(id_col), toks.alias("_toks"))
              .select(id_col,
                      F.posexplode("_toks").alias("_tpos0", "_tok"))
              .select(id_col, (F.col("_tpos0") + 1).alias("_tpos"),
                      "_tok"))
    survivors = tokens.join(removable, [id_col, "_tpos"], "left_anti")
    cleaned = (survivors.groupBy(id_col)
               .agg(F.array_sort(F.collect_list(
                   F.struct("_tpos", "_tok"))).alias("_ts"))
               .select(F.col(id_col),
                       F.array_join(F.transform(
                           "_ts", lambda s: s["_tok"]), " ")
                       .alias(out_col)))
    new_hashes = _token_windows(
        cleaned, id_col, out_col, k).select("_h")
    return track(cleaned, wins), new_hashes
