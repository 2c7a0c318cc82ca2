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
