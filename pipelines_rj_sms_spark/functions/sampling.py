"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is seed-and-partitioning dependent — a
re-run after a repartition yields a different subset, which poisons
train/test hygiene in a pipeline that reprocesses 100 TB incrementally.
These operators derive membership from a *hash of the row key* instead:
assignment is a pure function of the data, so it is stable across runs,
cluster sizes, partitionings, and engines (the md5 variant reproduces
bit-identically in any SQL engine — that is what the DuckDB oracle
checks). This is the standard "salted hash split" used to keep a
training corpus' holdout stable as new data arrives.

Everything is expression-only (codegen'd, no UDF): a split is a
projection, a per-group sample is one window rank — no extra shuffle
beyond the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _key_hash(cols: list[Column], hash_fn: str, salt: str) -> Column:
    """Uniform-ish bigint >= 0 from the key columns. md5 path: first 8
    hex chars as a 32-bit int — portable arithmetic any engine can
    replay; xxhash64 path: fast JVM hash for production."""
    key = F.concat_ws("|", *[c.cast("string") for c in cols])
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8),
                      16, 10).cast("long")
    if hash_fn == "xxhash64":
        return F.abs(F.xxhash64(F.lit(salt), key))
    raise ValueError(f"hash_fn must be xxhash64|md5: {hash_fn}")


def hash_split(df: DataFrame, key_cols: list[str], train_pct: int = 80,
               out_col: str = "split", hash_fn: str = "xxhash64",
               salt: str = "") -> DataFrame:
    """Add a deterministic 'train'/'test' column: bucket = hash(key) %
    100, train iff bucket < ``train_pct``.

    Same key -> same side, always: all rows of one entity (user,
    document) stay on one side of the split when keyed by that entity,
    preventing leakage. ``salt`` re-deals the split without touching
    the data.
    """
    bucket = _key_hash([F.col(c) for c in key_cols], hash_fn, salt) % 100
    return df.withColumn(
        out_col, F.when(bucket < train_pct, "train").otherwise("test"))


def sample_per_group(df: DataFrame, group_cols: list[str],
                     key_cols: list[str], n: int,
                     hash_fn: str = "xxhash64", salt: str = "") -> DataFrame:
    """Deterministic pseudo-random N rows per group: rank rows inside
    each group by hash(key) and keep the first ``n``.

    One window over the group key (single shuffle); the hash order is a
    uniform pseudo-random permutation, so this is reservoir sampling's
    deterministic cousin — same inputs, same sample, any cluster.
    """
    h = _key_hash([F.col(c) for c in key_cols], hash_fn, salt)
    w = Window.partitionBy(*group_cols).orderBy(
        h.asc(), *[F.col(c).asc() for c in key_cols])
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def kfold_assign(df: DataFrame, key_cols: list[str], k: int = 5,
                 out_col: str = "fold", hash_fn: str = "xxhash64",
                 salt: str = "") -> DataFrame:
    """Deterministic k-fold assignment: fold = hash(key) % k. All rows
    of one entity land in one fold (leakage-safe cross-validation, the
    k-way generalization of hash_split); pure projection, engine-
    replayable in the md5 variant."""
    h = _key_hash([F.col(c) for c in key_cols], hash_fn, salt)
    return df.withColumn(out_col, (h % k).cast("int"))


def temporal_split(df: DataFrame, ts_col: str, test_start,
                   embargo_days: int = 0,
                   out_col: str = "split") -> DataFrame:
    """Leakage-safe time split: 'train' strictly before
    ``test_start - embargo_days``, 'test' at/after ``test_start``,
    'embargo' in between (dropped by convention before training —
    the purge window that keeps look-ahead features from leaking
    across the boundary). Pure projection; at 100 TB this is exactly
    the date-partition pruning predicate."""
    t0 = F.lit(test_start).cast("timestamp")
    lo = t0 - F.expr(f"INTERVAL {int(embargo_days)} DAYS")
    c = F.col(ts_col)
    return df.withColumn(
        out_col,
        F.when(c < lo, "train")
        .when(c >= t0, "test")
        .otherwise("embargo"))


def weighted_sample_per_group(df: DataFrame, group_cols: list[str],
                              key_cols: list[str], weight_col: str,
                              n: int, hash_fn: str = "xxhash64",
                              salt: str = "") -> DataFrame:
    """Deterministic weight-proportional N rows per group — the
    Efraimidis–Spirakis A-ES reservoir scheme (public algorithm) with
    the random draw replaced by a key hash: each row gets
    u = (hash(key) mod 2^20 + 0.5) / 2^20 in (0,1) and sort key
    u^(1/weight); the top ``n`` per group are the sample. Selection
    probability is proportional to weight (exactly for n=1), yet the
    sample is a pure function of the data — stable across runs,
    partitionings, and engines, like every sampler here.

    Rows with weight <= 0 or null are excluded (they can never be
    drawn under A-ES semantics). One window over the group key; the
    weighting knob for quality-aware corpus mixing ("prefer long /
    high-quality docs without hard thresholds").
    """
    h = _key_hash([F.col(c) for c in key_cols], hash_fn, salt)
    u = ((h % F.lit(1 << 20)) + 0.5) / F.lit(float(1 << 20))
    wkey = F.pow(u, F.lit(1.0) / F.col(weight_col))
    w = Window.partitionBy(*group_cols).orderBy(
        wkey.desc(), *[F.col(c).asc() for c in key_cols])
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def pack_sequences(df: DataFrame, key_cols: list[str], token_col: str,
                   max_tokens: int, n_shards: int = 1024,
                   hash_fn: str = "xxhash64", salt: str = "",
                   shard_col: str = "shard",
                   bin_col: str = "bin") -> DataFrame:
    """Concatenate-and-chunk sequence packing: assign each document to
    the fixed-token-budget training bin where its starting offset lands.

    The corpus is hash-dealt into ``n_shards`` independent streams
    (deterministic, engine-portable — same `_key_hash` as the split
    operators); within a shard, documents are ordered by (hash, key)
    and the running token total is chunked every ``max_tokens``:
    ``bin = floor((cumsum - tokens) / max_tokens)`` — exactly the
    "concatenate the stream, cut every N tokens" packing used to build
    pretraining batches, expressed as one window cumsum. A document
    longer than ``max_tokens`` contributes at most ``max_tokens``
    (it will be truncated downstream anyway), so bins stay dense.

    Scale: one shuffle on shard; per-shard state is a running sum, so
    shard count — not corpus size — bounds window memory. Pick
    n_shards >= cluster cores; bins are globally identified by
    (shard, bin).
    """
    h = _key_hash([F.col(c) for c in key_cols], hash_fn, salt)
    tok = F.least(F.col(token_col), F.lit(max_tokens))
    shard = (h % n_shards).cast("long")
    w = (Window.partitionBy(shard_col)
         .orderBy(F.col("_h").asc(),
                  *[F.col(c).asc() for c in key_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.withColumn("_h", h)
        .withColumn(shard_col, shard)
        .withColumn("_cum", F.sum(tok).over(w))
        .withColumn(bin_col,
                    F.floor((F.col("_cum") - tok) / max_tokens))
        .drop("_h", "_cum")
    )


def token_budget_sample(df: DataFrame, group_cols: list[str],
                        key_cols: list[str], token_col: str,
                        budget: int, hash_fn: str = "xxhash64",
                        salt: str = "") -> DataFrame:
    """Deterministic per-group corpus sampling by token budget: walk
    each group's documents in hash(key) order and keep rows while the
    running token total stays within ``budget`` (the "N tokens per
    source/language" mixing knob of corpus curation, not N documents —
    doc-count sampling over-represents short-doc sources).

    The first document of a group is always kept even if it alone
    exceeds the budget (a budget must sample *something* to be useful);
    after that the cumulative total gates inclusion. One window over the
    group key — same single-shuffle posture as sample_per_group, and the
    same md5 replayability for cross-engine verification.
    """
    h = _key_hash([F.col(c) for c in key_cols], hash_fn, salt)
    order = [h.asc(), *[F.col(c).asc() for c in key_cols]]
    wsum = (Window.partitionBy(*group_cols).orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # row_number + cumsum share one window spec -> one shuffle, one sort
    keep = (F.sum(F.col(token_col)).over(wsum) <= budget) | (
        F.row_number().over(
            Window.partitionBy(*group_cols).orderBy(*order)) == 1)
    return (df.withColumn("_keep", keep)
            .filter(F.col("_keep")).drop("_keep"))


def sample_by_rates(df: DataFrame, group_col: str, key_cols: list[str],
                    rates: dict[str, float], default_rate: float = 0.0,
                    hash_fn: str = "xxhash64", salt: str = "") -> DataFrame:
    """Deterministic stratified sampling — the corpus-mixing primitive:
    keep each row with its group's rate (e.g. {'web': 0.3, 'wiki': 1.0}
    to downweight common-crawl against curated sources when assembling
    a training mix).

    Membership is hash(key) % 1e6 < rate * 1e6 — a pure projection
    (zero shuffle, no UDF), stable across runs/partitionings/engines
    like every sampler here, and NESTED: raising a group's rate keeps
    every row the lower rate kept (hash buckets are consistent), so
    remixing is monotone — re-runs of a bigger mix are supersets, which
    is what makes incremental corpus rebuilds cheap to diff. Groups
    absent from ``rates`` get ``default_rate``.
    """
    bucket = _key_hash([F.col(c) for c in key_cols], hash_fn, salt) \
        % 1_000_000
    rate = F.lit(int(default_rate * 1_000_000))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g,
                      F.lit(int(r * 1_000_000))).otherwise(rate)
    return df.filter(bucket < rate)


def balanced_sample(df: DataFrame, label_col: str, key_cols: list[str],
                    hash_fn: str = "xxhash64",
                    salt: str = "") -> DataFrame:
    """Deterministic class rebalancing: downsample every class to
    (approximately) the minority class's size — the classifier-prep
    step for skewed labels. Keep probability per class is
    ``min_class_count / class_count``; membership is the same
    hash-draw as every sampler here (pure function of the key —
    replayable, nested, no RNG state).

    The data-dependent rates stay IN-PLAN: class counts are one hash
    aggregation, the global minimum rides back as a broadcast 1-row
    frame, and the filter compares hash(key) % 2^20 against
    rate * 2^20 — no driver collect, no Python. Expected output size is
    |C|·min_count; exact-size guarantees need the window-rank sampler
    (`sample_per_group`) instead.
    """
    counts = df.groupBy(F.col(label_col).alias("_lbl")).agg(
        F.count("*").alias("_nc"))
    min_n = F.broadcast(counts.agg(F.min("_nc").alias("_minn")))
    rates = F.broadcast(counts.crossJoin(min_n))
    h = _key_hash([F.col(c) for c in key_cols], hash_fn, salt)
    return (df.join(rates, F.col(label_col) == F.col("_lbl"))
            .filter((h % 1048576).cast("double")
                    < F.lit(1048576.0) * F.col("_minn") / F.col("_nc"))
            .drop("_lbl", "_nc", "_minn"))


def negative_pairs(df: DataFrame, key_cols: list[str],
                   n_negatives: int = 1, salt: str = "neg",
                   hash_fn: str = "xxhash64") -> DataFrame:
    """Deterministic negative sampling for contrastive training: pair
    every row with ``n_negatives`` pseudo-random OTHER rows, without a
    cross join and without RNG state — the partner is picked by rank:

        partner_rank(row, j) = hash(key, j) % (N - 1),  skipping self

    Ranks come from `operators.ids.dense_global_ids` over the hash of
    the key (an arbitrary-but-fixed total order, assigned WITHOUT a
    single-partition global sort), N rides as a broadcast 1-row
    frame, and the pairing is ONE equi-join on the partner rank —
    uniform-ish over the corpus, md5-replayable in any engine, and
    every row gets exactly ``n_negatives`` partners. Self-pairs are
    skipped by index arithmetic (never filtered, so the count per row
    is exact). Returns the anchor keys + ``neg_`` partner keys + j.
    """
    from pipelines_rj_sms_spark.operators.ids import dense_global_ids
    keys = [F.col(c) for c in key_cols]
    hashed = df.select(*keys).withColumn(
        "_h", _key_hash(keys, hash_fn, salt + "rank"))
    ranked = dense_global_ids(hashed, ["_h", *key_cols],
                              id_col="_rk").drop("_h")
    ranked = ranked.persist()
    n = F.broadcast(ranked.agg(F.count("*").alias("_n")))
    js = F.explode(F.array(*[F.lit(j) for j in range(n_negatives)]))
    anchors = (ranked.crossJoin(n)
               .withColumn("_j", js))
    draw = _key_hash(keys + [F.col("_j")], hash_fn, salt) % (F.col("_n") - 1)
    # indices >= own rank shift up by one: uniform over the N-1 others
    target = F.when(draw >= F.col("_rk"), draw + 1).otherwise(draw)
    anchors = anchors.withColumn("_tgt", target)
    partners = ranked.select(
        *[F.col(c).alias(f"neg_{c}") for c in key_cols],
        F.col("_rk").alias("_tgt"))
    from pipelines_rj_sms_spark.operators.cache import track

    return track(anchors.join(partners, "_tgt")
                 .select(*key_cols, F.col("_j").alias("neg_index"),
                         *[f"neg_{c}" for c in key_cols]), ranked)


def temperature_mix_rates(df: DataFrame, group_col: str,
                          temperature: float = 1.0,
                          target_frac: float = 1.0) -> DataFrame:
    """Exponent-smoothed corpus-mixing rates (the public multilingual
    sampling recipe — sample groups ∝ p_g^(1/T), so high temperature
    flattens the mix toward small groups instead of letting the head
    language/source dominate). Returns one row per group:
    (group, n_rows, mix_rate), where ``mix_rate`` is the per-row keep
    probability that makes the expected mix of ``target_frac * N``
    rows follow the tempered distribution (capped at 1 — a group
    can't be upsampled by a filter). Feed the rates straight into
    :func:`sample_by_rates`.

    Scale shape: one hash aggregation to per-group counts, then two
    1-row broadcast totals over the ≤|groups| rollup — the corpus is
    scanned once, nothing is collected.

    Numeric contract: the only transcendentals (ln, exp) are pinned to
    the shared 1e-6 grid (``det_log_units`` / ``pin_units``) and the
    final rate is an exact integer ratio rounded on the grid
    (``grid_mean``), so rates replay bit-identically across engines —
    and therefore so does the downstream hash sample.
    """
    from pipelines_rj_sms_spark.functions.numeric import (
        det_log_units,
        grid_mean,
        pin_units,
    )

    alpha = 1.0 / float(temperature)
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_rows"))
    tot = F.broadcast(counts.agg(F.sum("n_rows").alias("_N")))
    w = counts.crossJoin(tot).select(
        group_col, "n_rows", "_N",
        pin_units(F.exp(
            (det_log_units(F.col("n_rows") / F.col("_N")) / F.lit(1e6))
            * F.lit(alpha))).alias("_wu"))
    wsum = F.broadcast(w.agg(F.sum("_wu").alias("_ws")))
    n_target = F.floor(F.col("_N") * F.lit(float(target_frac)))
    return w.crossJoin(wsum).select(
        F.col(group_col),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.least(F.lit(1.0), grid_mean(
            F.col("_wu").cast("decimal(38,0)")
            * n_target.cast("decimal(38,0)") * F.lit(1000000),
            # _ws is up to |groups|*1e6 units: the product with n_rows
            # can pass 2^63 on ~1e12-row groups, so multiply in decimal.
            F.col("_ws").cast("decimal(38,0)")
            * F.col("n_rows").cast("decimal(38,0)"))).alias("mix_rate"))
