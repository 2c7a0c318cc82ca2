"""URL canonicalization (functions/urls.py)."""

from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.urls import canonicalize_url, url_key


def _canon(spark, *urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonicalize_url("url")).collect()]


def test_canonicalize_full_normalization(spark):
    got = _canon(
        spark,
        "HTTPS://WWW.Example.COM:443/Products/1/?b=2&utm_source=x&a=1#frag",
    )
    assert got == ["https://example.com/Products/1?a=1&b=2"]


def test_canonicalize_equivalence_classes(spark):
    variants = [
        "https://example.com/a?x=1&y=2",
        "https://EXAMPLE.com:443/a/?y=2&x=1",
        "https://www.example.com/a//?x=1&y=2&fbclid=abc#sec",
        "https://example.com/a?utm_campaign=c&utm_medium=m&x=1&y=2",
    ]
    assert len(set(_canon(spark, *variants))) == 1
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    assert df.select(url_key("url")).distinct().count() == 1


def test_canonicalize_preserves_meaningful_differences(spark):
    distinct = [
        "https://example.com/a",       # path case matters
        "https://example.com/A",
        "http://example.com/a",        # scheme matters
        "https://example.com/a?x=1",   # real params matter
        "https://example.com:8443/a",  # non-default port kept
        "https://sub.example.com/a",   # subdomain (non-www) kept
    ]
    got = _canon(spark, *distinct)
    assert len(set(got)) == len(distinct)
    assert "https://example.com:8443/a" in got


def test_canonicalize_port_strip_is_scheme_aware(spark):
    # :443 is only default for https, :80 only for http
    got = _canon(spark, "http://example.com:443/a",
                 "https://example.com:80/a")
    assert got == ["http://example.com:443/a", "https://example.com:80/a"]


def test_canonicalize_keeps_empty_query_clean(spark):
    got = _canon(spark, "https://example.com/a?utm_source=x",
                 "https://example.com/")
    assert got == ["https://example.com/a", "https://example.com"]


def test_canonicalize_plan_stays_codegen(spark):
    df = spark.createDataFrame([("https://x.com/a",)], "url string")
    plan = (df.select(canonicalize_url("url"))
            ._jdf.queryExecution().executedPlan().toString())
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_canonicalize_schemeless_input_is_stable(spark):
    """Relative/schemeless rows are not repaired (it's a dedup key,
    not a validator) — but they must canonicalize deterministically
    and never throw."""
    got = _canon(spark, "example.com/a?utm_source=x&b=1",
                 "EXAMPLE.com/a?b=1")
    assert got[0] == got[1] == "://example.com/a?b=1"


def test_registrable_domain_rules(spark):
    from pipelines_rj_sms_spark.functions.urls import registrable_domain
    cases = [
        ("https://sub.example.co.uk/x", "example.co.uk"),
        ("http://www.example.com/x", "example.com"),
        ("https://a.b.c.example.org:8080/x", "example.org"),
        ("http://example.com.br/x", "example.com.br"),
        ("http://localhost/x", "localhost"),
        ("https://site.io/x", "site.io"),
        ("HTTPS://WWW.EXAMPLE.COM/X", "example.com"),
        # userinfo@ is not part of the host — an attacker-steerable
        # grouping-key hole when used as a frequency-cap key
        ("http://user@example.com/x", "example.com"),
        ("http://user:pw@sub.example.co.uk/x", "example.co.uk"),
        # fragment terminates the authority even with no path
        ("http://example.com#frag", "example.com"),
        ("https://evil.com#@example.com/", "evil.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(registrable_domain("url")).collect()]
    assert got == [d for _, d in cases]


def test_domain_cap_sample_two_stage_equals_global_window(spark):
    """The skew-safe two-stage cut must pick EXACTLY the rows a single
    global per-domain window would, at any partitioning."""
    from pyspark.sql import Window

    from pipelines_rj_sms_spark.functions.sampling import _key_hash
    from pipelines_rj_sms_spark.functions.urls import (
        domain_cap_sample,
        registrable_domain,
    )
    rows = [(i, f"https://www.site{i % 5}.com/p/{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, url string")
    capped = {(r["id"], r["domain"]) for r in domain_cap_sample(
        df.repartition(8), "url", cap=6, key_cols=["id"],
        hash_fn="md5", salt="t").collect()}
    h = _key_hash([F.col("id")], "md5", "t")
    w = Window.partitionBy("domain").orderBy(h.asc(), F.col("id").asc())
    want = {(r["id"], r["domain"]) for r in
            df.withColumn("domain", registrable_domain("url"))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= 6).collect()}
    assert capped == want
    # exactly 6 per domain, 5 domains
    assert len(capped) == 30


def test_domain_cap_sample_partition_invariant(spark):
    from pipelines_rj_sms_spark.functions.urls import domain_cap_sample
    rows = [(i, f"http://d{i % 3}.co.uk/{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, url string")
    a = {tuple(r) for r in domain_cap_sample(
        df.coalesce(1), "url", cap=4, key_cols=["id"],
        hash_fn="md5").collect()}
    b = {tuple(r) for r in domain_cap_sample(
        df.repartition(16), "url", cap=4, key_cols=["id"],
        hash_fn="md5").collect()}
    assert a == b and len(a) == 12
