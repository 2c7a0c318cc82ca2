"""cache.track/release: persisted intermediates are freed on demand."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators import dedup
from pipelines_rj_sms_spark.operators.cache import release, track
from pipelines_rj_sms_spark.operators.curation import curate_documents


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the quick brown fox jumps over doc "),
                 (F.col("id") % 20).cast("string")).alias("text"))


def _n_cached(spark):
    jcm = spark._jsparkSession.sharedState().cacheManager()
    return 0 if jcm.isEmpty() else 1


def test_lsh_release_frees_cache(spark):
    spark.catalog.clearCache()
    pairs = dedup.minhash_lsh_candidates(_docs(spark), "doc_id", "text",
                                         num_hashes=8, bands=4)
    pairs.count()
    assert _n_cached(spark) == 1          # banded subplan is cached
    n = release(pairs)
    assert n >= 1
    assert _n_cached(spark) == 0          # all blocks freed


def test_curation_release_chains_all_intermediates(spark):
    spark.catalog.clearCache()
    curated, report = curate_documents(_docs(spark), with_report=False)
    curated.count()
    released = release(curated)
    # exact, near, lsh-banded, jaccard-sh at minimum
    assert released >= 4
    assert _n_cached(spark) == 0


def test_track_carries_chain(spark):
    a = spark.range(5).persist()
    b = spark.range(5).persist()
    mid = track(a.join(b, "id"), a, b)
    final = track(mid.filter("id >= 0"), mid)
    assert release(final) == 2
