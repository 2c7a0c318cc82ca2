"""PII scrubbing — expression-only masking for free-text columns.

The reference moves patient-level health data (CPF and CNS identifiers,
contact fields) through every pipeline; its cleaning layer normalizes
them (`pipelines/utils/data_cleaning.py`) but free-text columns headed
for analytics/LLM corpora need the opposite: redaction. These are the
standard Brazilian-registry patterns as pure `regexp_replace` chains —
JVM-side, codegen'd, no Python in the row path, and written in the
regex subset (no lookarounds/backrefs) that Java, RE2 and DuckDB all
agree on, so the DuckDB oracle replays them byte-exact.

Masking order matters: CPF/CNS first (digit-dense), then phone, then
email — so a broader pattern never consumes a narrower one's digits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 000.000.000-00 (formatted) or 11 bare digits bounded by non-digits
CPF_PATTERN = r"[0-9]{3}\.[0-9]{3}\.[0-9]{3}-[0-9]{2}"
# CNS (Cartão Nacional de Saúde): 15 digits, often space-grouped 3-4-4-4
CNS_PATTERN = r"[0-9]{3} [0-9]{4} [0-9]{4} [0-9]{4}"
# BR phone: optional (DD), 4-5 digit prefix, dash, 4 digits
PHONE_PATTERN = r"(?:\(?[0-9]{2}\)? ?)?[0-9]{4,5}-[0-9]{4}"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def mask_cpf(col: str | Column, repl: str = "[CPF]") -> Column:
    return F.regexp_replace(col, CPF_PATTERN, repl)


def mask_cns(col: str | Column, repl: str = "[CNS]") -> Column:
    return F.regexp_replace(col, CNS_PATTERN, repl)


def mask_phone(col: str | Column, repl: str = "[TEL]") -> Column:
    return F.regexp_replace(col, PHONE_PATTERN, repl)


def mask_email(col: str | Column, repl: str = "[EMAIL]") -> Column:
    return F.regexp_replace(col, EMAIL_PATTERN, repl)


def scrub_pii(col: str | Column) -> Column:
    """All masks, narrowest-first. One nested expression — Catalyst
    folds the chain into a single projection pass over the column."""
    return mask_email(mask_phone(mask_cns(mask_cpf(col))))
