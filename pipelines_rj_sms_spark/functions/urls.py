"""URL canonicalization — the stage-zero dedup key of web-corpus
curation (URL-level dedup runs before any text is even fetched in
CommonCrawl-style pipelines).

Expression-only (regexp + array builtins, whole-stage codegen, no
UDF), so canonicalization runs at scan speed and the canonical form is
reproducible in any engine — the DuckDB oracle mirrors every step.

Canonical form applied by :func:`canonicalize_url`:
- strip the fragment (``#...``);
- lowercase the scheme and the host;
- drop the scheme's default port (``:80`` for http, ``:443`` for https);
- drop a leading ``www.`` (optional, default on);
- strip trailing slashes from the path (path case is PRESERVED —
  paths are case-sensitive, hosts are not);
- drop tracking parameters (``utm_*`` prefix plus an exact-name list),
  sort the surviving query parameters bytewise, and re-join.

Malformed/relative inputs are not repaired: a row with no
``scheme://`` prefix canonicalizes to an empty-scheme form the caller
should filter beforehand (this is a dedup key, not a validator).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact param names dropped in addition to the ``utm_`` prefix —
#: the common click-tracking set (public convention, e.g. the
#: ClearURLs-style lists).
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid", "ref")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonicalize_url(url: Column | str, drop_www: bool = True,
                     tracking_params: tuple[str, ...] = TRACKING_PARAMS,
                     ) -> Column:
    """Canonical dedup form of an absolute http(s) URL (see module
    docstring for the exact normalization steps)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    if drop_www:
        host = F.regexp_replace(host, r"^www\.", "")
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1),
                            r"/+$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)

    def keep(p: Column) -> Column:
        key = F.split(p, "=").getItem(0)
        cond = (p != "") & ~key.startswith("utm_")
        for name in tracking_params:
            cond = cond & (key != name)
        return cond

    params = F.array_sort(F.filter(F.split(query, "&"), keep))
    qs = F.array_join(params, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)))


def url_key(url: Column | str, **kwargs) -> Column:
    """64-bit dedup key of the canonical URL — join/bucket on this
    instead of the string when only identity matters (8-byte shuffle
    keys instead of URL-length ones)."""
    return F.xxhash64(canonicalize_url(url, **kwargs))


#: common multi-part public suffixes where the registrable domain is
#: THREE labels (a bounded, documented subset of the public-suffix
#: list — the full PSL is a data file, not an algorithm; swap it in
#: for production by passing the complete set).
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.br", "net.br", "org.br",
    "com.au", "net.au", "org.au", "co.jp", "or.jp", "ne.jp", "co.kr",
    "com.mx", "com.ar", "com.cn", "com.tw", "com.tr", "co.in",
    "co.za", "com.sg", "com.hk", "co.nz", "com.my",
)


def registrable_domain(url: Column | str,
                       multi_part: tuple[str, ...] = MULTI_PART_SUFFIXES,
                       ) -> Column:
    """Registrable domain ("example.co.uk", "example.com") of an
    absolute URL — the grouping key of per-domain corpus policies
    (domain frequency caps, domain mix reports, crawl politeness).

    Expression-only: lowercase the host, strip the port, take the last
    two labels — or three when the 2-label tail is a known multi-part
    public suffix. Hosts with <= 2 labels (and IP literals, which
    never match the suffix set) pass through unchanged.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    # authority ends at /, ? OR #; a leading userinfo@ is not part of
    # the host — both were attacker-steerable grouping-key holes
    # (http://user@example.com/, http://example.com#frag)
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    authority = F.regexp_replace(authority, r"^[^/]*@", "")
    host = F.regexp_replace(F.lower(authority), r":\d+$", "")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2),
                        F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3),
                        F.element_at(parts, -2), F.element_at(parts, -1))
    return (F.when(n <= 2, host)
            .when(last2.isin(*multi_part), last3)
            .otherwise(last2))


def domain_cap_sample(df: DataFrame, url_col: str, cap: int,
                      key_cols: list[str], hash_fn: str = "xxhash64",
                      salt: str = "",
                      domain_out: str = "domain") -> DataFrame:
    """Per-domain frequency cap (the RefinedWeb/FineWeb-style curation
    step): keep at most ``cap`` rows per registrable domain, chosen by
    deterministic hash order over ``key_cols`` — same inputs, same
    survivors, on any cluster at any partitioning.

    Scale shape — the hot-domain killer handled: a plain
    row_number-over-domain window sends EVERY row of the biggest
    domain (a crawl's wikipedia.org slice can be 10^8 rows) through
    one reducer. This runs the standard two-stage cut instead: a local
    window over (input-partition, domain) prunes each partition to its
    own top-``cap`` candidates first, so the final per-domain window
    sees at most cap x n_partitions rows per domain, never the
    corpus. Selection equals the single global window's result: any
    row in the global top-cap of its domain is necessarily in the
    top-cap of its own partition.
    """
    from pipelines_rj_sms_spark.functions.sampling import _key_hash

    from pyspark.sql import Window

    h = _key_hash([F.col(c) for c in key_cols], hash_fn, salt)
    keyed = df.withColumn(domain_out, registrable_domain(url_col)) \
              .withColumn("_h", h)
    order = [F.col("_h").asc()] + [F.col(c).asc() for c in key_cols]
    local = Window.partitionBy(F.spark_partition_id(),
                               F.col(domain_out)).orderBy(*order)
    pruned = (keyed.withColumn("_lrk", F.row_number().over(local))
              .filter(F.col("_lrk") <= cap).drop("_lrk"))
    final = Window.partitionBy(F.col(domain_out)).orderBy(*order)
    return (pruned.withColumn("_rk", F.row_number().over(final))
            .filter(F.col("_rk") <= cap).drop("_rk", "_h"))
