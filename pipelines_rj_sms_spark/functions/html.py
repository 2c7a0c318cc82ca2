"""HTML -> text extraction (C23) — the official-gazette scraping
transforms (diario_oficial_rj/utils.py:154-211,
diario_oficial_uniao_api/tasks.py:180-214) without bs4 (absent here).

Two layers:
- expression-only `html_to_text` (regexp chain, JVM-side, codegen'd) for
  the bulk strip — this is the 100 TB path;
- `html_sections` pandas UDF returning array<struct<title,body>> for the
  UDTF-like section split (explode downstream), where stateful parsing
  (heading boundaries) doesn't fit a regex chain.
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK_RE = r"(?is)<(script|style)[^>]*>.*?</\1>"
_TAG_RE = r"(?s)<[^>]+>"
_ENTITIES = {"&nbsp;": " ", "&amp;": "&", "&lt;": "<", "&gt;": ">",
             "&quot;": '"', "&#39;": "'"}


def html_to_text(col: Column | str) -> Column:
    """Strip script/style blocks, then all tags; decode the common
    entities; collapse whitespace. Pure expressions — no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _BLOCK_RE, " ")
    c = F.regexp_replace(c, _TAG_RE, " ")
    for ent, rep in _ENTITIES.items():
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


_HEADING_SPLIT = re.compile(r"(?is)<h([1-6])[^>]*>(.*?)</h\1>")


def _strip(s: str) -> str:
    s = re.sub(_BLOCK_RE, " ", s)
    s = re.sub(_TAG_RE, " ", s)
    s = _html.unescape(s)
    return re.sub(r"\s+", " ", s).strip()


def split_sections(doc: str) -> list[dict]:
    """Split one HTML document into [(title, body)] at heading boundaries;
    content before the first heading gets title ''. Pure function (unit
    testable without Spark)."""
    if doc is None:
        return []
    sections: list[dict] = []
    last_end, title = 0, ""
    for m in _HEADING_SPLIT.finditer(doc):
        body = _strip(doc[last_end:m.start()])
        if body or title:
            sections.append({"title": title, "body": body})
        title = _strip(m.group(2))
        last_end = m.end()
    tail = _strip(doc[last_end:])
    if tail or title:
        sections.append({"title": title, "body": tail})
    return sections


def html_sections_udf():
    """pandas UDF factory: html string -> array<struct<title,body>>
    (explode downstream for the one-row-per-section shape, §2.12)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<title: string, body: string>>")
    def _sections(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for docs in it:
            yield docs.map(split_sections)

    return _sections
