"""Deterministic sampling: stability across repartitioning and salts."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.sampling import hash_split, sample_per_group


def _users(spark, n=500):
    return spark.range(n).select(F.col("id").alias("user_id"))


def test_hash_split_stable_under_repartition(spark):
    df = _users(spark)
    a = {r["user_id"]: r["split"] for r in
         hash_split(df, ["user_id"]).collect()}
    b = {r["user_id"]: r["split"] for r in
         hash_split(df.repartition(13), ["user_id"]).collect()}
    assert a == b  # membership is a function of the key, not the layout

    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac < 0.9  # ~80/20


def test_hash_split_salt_redeal(spark):
    df = _users(spark)
    a = {r["user_id"]: r["split"] for r in
         hash_split(df, ["user_id"], salt="s1").collect()}
    b = {r["user_id"]: r["split"] for r in
         hash_split(df, ["user_id"], salt="s2").collect()}
    assert a != b  # a new salt re-deals
    for rows in (a, b):
        frac = sum(1 for v in rows.values() if v == "train") / len(rows)
        assert 0.7 < frac < 0.9


def test_hash_split_md5_xxhash_both_uniform(spark):
    df = _users(spark, 2000)
    for fn in ("xxhash64", "md5"):
        out = hash_split(df, ["user_id"], train_pct=50, hash_fn=fn)
        frac = out.filter("split = 'train'").count() / 2000
        assert 0.45 < frac < 0.55, fn


def test_sample_per_group_deterministic_and_sized(spark):
    rows = [(g, i) for g in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, k long")
    s1 = sorted((r["g"], r["k"]) for r in
                sample_per_group(df, ["g"], ["k"], n=10).collect())
    s2 = sorted((r["g"], r["k"]) for r in
                sample_per_group(df.repartition(7), ["g"], ["k"], n=10).collect())
    assert s1 == s2
    assert len(s1) == 20
    ks = [k for _g, k in s1]
    assert ks != sorted(set(ks))[:20] or len(set(ks)) > 10  # not just first-N


def test_sample_per_group_small_group_keeps_all(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, k long")
    assert sample_per_group(df, ["g"], ["k"], n=10).count() == 2


def test_pack_sequences_chunks_running_total(spark):
    from pipelines_rj_sms_spark.functions.sampling import pack_sequences

    # single shard -> one deterministic stream; hash order is fixed by
    # (hash, key) so replaying gives identical bins
    df = spark.createDataFrame(
        [(i, 300) for i in range(10)], ["doc_id", "tok"])
    out = pack_sequences(df, ["doc_id"], "tok", max_tokens=512,
                         n_shards=1, hash_fn="md5")
    rows = {r.doc_id: (r.shard, r.bin) for r in out.collect()}
    assert all(s == 0 for s, _ in rows.values())
    # 10 docs x 300 tok into 512-tok bins: starting offsets 0,300,600...
    # -> bins 0,0,1,1,2,2,... (floor(start/512))
    bins = sorted(b for _, b in rows.values())
    assert bins == sorted((i * 300) // 512 for i in range(10))


def test_pack_sequences_clips_oversized_doc(spark):
    from pipelines_rj_sms_spark.functions.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 10_000), (2, 10), (3, 10)], ["doc_id", "tok"])
    out = pack_sequences(df, ["doc_id"], "tok", max_tokens=512,
                         n_shards=1, hash_fn="md5")
    # the 10k-token doc contributes at most 512, so later docs land in
    # adjacent bins, not 19 bins away
    assert out.agg({"bin": "max"}).collect()[0][0] <= 2


def test_token_budget_sample_gates_and_keeps_first(spark):
    from pipelines_rj_sms_spark.functions.sampling import token_budget_sample

    df = spark.createDataFrame(
        [("a", i, 40) for i in range(10)] + [("b", 100, 999)],
        ["src", "doc_id", "tok"])
    out = token_budget_sample(df, ["src"], ["doc_id"], "tok",
                              budget=100, hash_fn="md5")
    rows = out.collect()
    a = [r for r in rows if r.src == "a"]
    # 40-token docs under a 100 budget -> exactly 2 kept
    assert len(a) == 2
    # group b's only doc exceeds the budget alone but is still kept
    assert [r.doc_id for r in rows if r.src == "b"] == [100]


def test_pack_sequences_stable_under_repartition(spark):
    """The packing claim that matters at scale: assignment is a pure
    function of the data, so any physical partitioning yields the
    identical (shard, bin) map."""
    from pipelines_rj_sms_spark.functions.sampling import pack_sequences

    import random
    rng = random.Random(3)
    df = spark.createDataFrame(
        [(i, rng.randint(1, 900)) for i in range(200)], ["doc_id", "tok"])

    def run(frame):
        out = pack_sequences(frame, ["doc_id"], "tok", max_tokens=512,
                             n_shards=4, hash_fn="md5")
        return sorted((r.doc_id, r.shard, r.bin) for r in out.collect())

    assert run(df) == run(df.repartition(7)) == run(df.coalesce(1))


def test_sample_by_rates_nested_and_stable(spark):
    """Raising a group's rate keeps every previously-kept row (hash
    buckets are consistent), membership survives repartitioning, and
    achieved rates track requested rates."""
    from pipelines_rj_sms_spark.functions.sampling import sample_by_rates

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "wiki")
        .otherwise("books").alias("src"))
    small = {r["doc_id"] for r in sample_by_rates(
        df, "src", ["doc_id"], {"web": 0.2, "wiki": 0.5}).collect()}
    big = {r["doc_id"] for r in sample_by_rates(
        df, "src", ["doc_id"], {"web": 0.6, "wiki": 0.9}).collect()}
    assert small <= big  # monotone: bigger mix is a superset
    re_part = {r["doc_id"] for r in sample_by_rates(
        df.repartition(7), "src", ["doc_id"],
        {"web": 0.2, "wiki": 0.5}).collect()}
    assert re_part == small
    # default_rate=0 drops unlisted groups entirely
    kept_srcs = {r["src"] for r in sample_by_rates(
        df, "src", ["doc_id"], {"web": 0.2}).select("src").distinct()
        .collect()}
    assert kept_srcs == {"web"}
    # achieved ~ requested (1000 rows/group, ±6pp slack)
    n_web = sum(1 for d in big if d % 3 == 0)
    assert abs(n_web / 1000 - 0.6) < 0.06


def test_sample_by_rates_is_a_projection(spark):
    """Zero shuffle, no Python: the mixing filter must not add an
    Exchange or eval node."""
    from pipelines_rj_sms_spark.functions.sampling import sample_by_rates

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("web").alias("src"))
    plan = sample_by_rates(df, "src", ["doc_id"], {"web": 0.5}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_sample_prefers_heavy_weights(spark):
    """With a 1000:1 weight ratio, the A-ES top-1 per group picks the
    heavy row in (nearly) every group — and the draw is deterministic."""
    from pipelines_rj_sms_spark.functions.sampling import (
        weighted_sample_per_group)
    rows = [(g, g * 10 + i, 1000.0 if i == 0 else 1.0)
            for g in range(40) for i in range(5)]
    df = spark.createDataFrame(rows, ["grp", "id", "w"])
    out = weighted_sample_per_group(df, ["grp"], ["id"], "w", 1)
    picked = [r["id"] % 10 for r in out.collect()]
    assert len(picked) == 40
    assert sum(1 for p in picked if p == 0) >= 35  # heavy row dominates


def test_weighted_sample_deterministic_and_filters_nonpositive(spark):
    from pipelines_rj_sms_spark.functions.sampling import (
        weighted_sample_per_group)
    df = spark.createDataFrame(
        [(1, i, float(i % 7) - 1.0) for i in range(50)], ["grp", "id", "w"])
    a = {r["id"] for r in weighted_sample_per_group(
        df, ["grp"], ["id"], "w", 10).collect()}
    b = {r["id"] for r in weighted_sample_per_group(
        df.repartition(7), ["grp"], ["id"], "w", 10).collect()}
    assert a == b and len(a) == 10
    zero_or_neg = {i for i in range(50) if float(i % 7) - 1.0 <= 0}
    assert not (a & zero_or_neg)
    # a different salt re-deals the sample
    c = {r["id"] for r in weighted_sample_per_group(
        df, ["grp"], ["id"], "w", 10, salt="v2").collect()}
    assert c != a


def test_kfold_leakage_safe_and_balanced(spark):
    from pipelines_rj_sms_spark.functions.sampling import kfold_assign
    df = spark.createDataFrame(
        [(u, e) for u in range(200) for e in range(3)], ["user", "ev"])
    out = kfold_assign(df, ["user"], k=5)
    # every entity sits in exactly one fold, regardless of its rows
    per_user = out.groupBy("user").agg(
        F.count_distinct("fold").alias("nf")).collect()
    assert all(r["nf"] == 1 for r in per_user)
    sizes = [r["n"] for r in out.select("user", "fold").distinct()
             .groupBy("fold").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 5 and min(sizes) > 20   # roughly balanced


def test_temporal_split_embargo_band(spark):
    from datetime import datetime

    from pipelines_rj_sms_spark.functions.sampling import temporal_split
    df = spark.createDataFrame(
        [(datetime(2024, 1, d, 12),) for d in range(1, 11)], ["ts"])
    out = {r["ts"].day: r["split"] for r in temporal_split(
        df, "ts", "2024-01-08 00:00:00", embargo_days=2).collect()}
    assert out[5] == "train" and out[6] == "embargo" and out[7] == "embargo"
    assert out[8] == "test" and out[10] == "test"


def test_balanced_sample_downsamples_majority(spark):
    from pipelines_rj_sms_spark.functions.sampling import balanced_sample
    rows = [(i, "big") for i in range(2000)] \
        + [(i + 10000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "lbl"])
    out = balanced_sample(df, "lbl", ["id"], hash_fn="md5")
    got = {r["lbl"]: 0 for r in out.collect()}
    by = out.groupBy("lbl").count().collect()
    counts = {r["lbl"]: r["count"] for r in by}
    # minority kept (rate 1.0 -> all 100); majority ~100 (±sampling)
    assert counts["small"] == 100
    assert 60 <= counts["big"] <= 140
    # deterministic replay
    again = {r["lbl"]: r["count"] for r in balanced_sample(
        df, "lbl", ["id"], hash_fn="md5").groupBy("lbl").count().collect()}
    assert again == counts


def test_balanced_sample_no_collect_in_plan(spark):
    from pipelines_rj_sms_spark.functions.sampling import balanced_sample
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "lbl"])
    plan = balanced_sample(df, "lbl", ["id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_negative_pairs_exact_count_no_self(spark):
    from pipelines_rj_sms_spark.functions.sampling import negative_pairs
    df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    out = negative_pairs(df, ["doc_id"], n_negatives=3, hash_fn="md5")
    rows = out.collect()
    assert len(rows) == 150
    assert all(r["doc_id"] != r["neg_doc_id"] for r in rows)
    per = {}
    for r in rows:
        per[r["doc_id"]] = per.get(r["doc_id"], 0) + 1
    assert set(per.values()) == {3}
    # deterministic replay
    again = negative_pairs(df, ["doc_id"], n_negatives=3,
                           hash_fn="md5").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_negative_pairs_roughly_uniform(spark):
    from pipelines_rj_sms_spark.functions.sampling import negative_pairs
    df = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    out = negative_pairs(df, ["doc_id"], n_negatives=10, hash_fn="md5")
    hits = {}
    for r in out.collect():
        hits[r["neg_doc_id"]] = hits.get(r["neg_doc_id"], 0) + 1
    # 400 draws over 40 targets: each target drawn at least once and
    # no target hoards more than a quarter of the mass
    assert len(hits) >= 35
    assert max(hits.values()) < 100


def test_temperature_mix_rates_t1_is_uniform_downsample(spark):
    """T=1 keeps the raw distribution, so every group's keep rate is
    exactly target_frac (q_g = p_g -> p_g*N_tgt/n_g = N_tgt/N)."""
    from pipelines_rj_sms_spark.functions.sampling import (
        temperature_mix_rates)
    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = {r["src"]: r for r in
           temperature_mix_rates(df, "src", temperature=1.0,
                                 target_frac=0.5).collect()}
    assert out["big"]["n_rows"] == 80 and out["small"]["n_rows"] == 20
    assert out["big"]["mix_rate"] == 0.5
    assert out["small"]["mix_rate"] == 0.5


def test_temperature_mix_rates_flattens_toward_small_groups(spark):
    from pipelines_rj_sms_spark.functions.sampling import (
        temperature_mix_rates)
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = {r["src"]: r["mix_rate"] for r in
           temperature_mix_rates(df, "src", temperature=3.0,
                                 target_frac=0.5).collect()}
    # tempering shifts mass to the small group
    assert out["small"] > 0.5 > out["big"]
    # cap: tiny group + generous budget saturates at 1.0
    full = {r["src"]: r["mix_rate"] for r in
            temperature_mix_rates(df, "src", temperature=100.0,
                                  target_frac=1.0).collect()}
    assert full["small"] == 1.0


def test_temperature_mix_feeds_sample_by_rates(spark):
    from pipelines_rj_sms_spark.functions.sampling import (
        sample_by_rates,
        temperature_mix_rates,
    )
    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, src string")
    rates = {r["src"]: r["mix_rate"] for r in
             temperature_mix_rates(df, "src", temperature=2.0,
                                   target_frac=0.5).collect()}
    kept = sample_by_rates(df, "src", ["id"], rates)
    n = kept.count()
    assert 0 < n < 300
    # deterministic: same rates, same rows
    assert kept.collect() == sample_by_rates(df, "src", ["id"],
                                             rates).collect()
