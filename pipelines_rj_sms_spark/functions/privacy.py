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


def replayable_noisy_counts(df, group_cols: list[str], epsilon: float,
                            sensitivity: float = 1.0, salt: str = "dp",
                            clamp_nonnegative: bool = True):
    """Laplace-SHAPED noisy counts with REPLAYABLE noise — NOT a
    differential-privacy release. The noise is a deterministic md5
    function of the released group key and ``salt``: anyone who knows
    (or guesses) the salt recomputes the noise from the released row
    itself and recovers the exact count. Privacy with a known or
    default salt is therefore ZERO — this exists for pipeline testing
    and oracle parity (the noise distribution and plan shape are the
    real mechanism's), never for protecting data. For an actual ε-DP
    release use :func:`dp_noisy_counts`, which demands a secret seed.

    Mechanics: u = (h%2^20 + 0.5)/2^20 from the md5 hash-draw (same
    discipline as the sampling operators), noise =
    -(s/ε)·sign(u-½)·ln(1-2|u-½|) — the exact Laplace inverse-CDF
    transform. One hash aggregation; the noise projection is
    expression-only. Returns group cols + `noisy_count` rounded to 6,
    clamped at 0 by default.
    """
    gcols = [F.col(c) for c in group_cols]
    counts = df.groupBy(*gcols).agg(F.count("*").alias("_n"))
    key = F.concat_ws("|", *[c.cast("string") for c in gcols])
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8),
               16, 10).cast("long")
    u = ((h % 1048576) + 0.5) / 1048576.0
    b = float(sensitivity) / float(epsilon)
    noise = (F.lit(-b) * F.signum(u - 0.5)
             * F.log(1.0 - 2.0 * F.abs(u - 0.5)))
    noisy = F.col("_n") + noise
    if clamp_nonnegative:
        noisy = F.greatest(noisy, F.lit(0.0))
    return counts.select(*group_cols,
                         F.round(noisy, 6).alias("noisy_count"))


def dp_noisy_counts(df, group_cols: list[str], epsilon: float,
                    secret_seed: str, sensitivity: float = 1.0,
                    clamp_nonnegative: bool = True):
    """Laplace-mechanism noisy counts per group — the release-side
    companion to the k-anonymity/l-diversity gates: counts leave with
    Lap(sensitivity/epsilon) noise (the standard ε-DP counting
    mechanism, public).

    The noise draw is seeded by ``secret_seed`` — REQUIRED, no
    default, because the draw is a deterministic function of
    (seed, group key): if the seed is known, the noise is recomputable
    from the released row and the release has ZERO privacy, not merely
    weak randomness. The seed must be high-entropy (≥16 chars
    enforced), held out-of-band, and — since reusing one across
    releases of the same groups repeats the noise — fresh per release
    (per-release ε still composes across releases as usual). Hash-
    seeded noise is pseudo-random, not cryptographic: for releases
    where an adversary may attack the PRF itself, draw real CSPRNG
    noise per group outside Spark and join it in; this function's
    plan (one hash agg + expression-only projection) stays the same.
    """
    seed = (secret_seed or "").strip()
    if len(seed) < 16 or seed.lower() in {"dp", "salt", "secret",
                                          "changeme", "default"}:
        raise ValueError(
            "dp_noisy_counts needs a high-entropy secret_seed "
            "(>=16 chars, out-of-band). With a known/guessable seed "
            "the noise is recomputable from the released rows and the "
            "release has no privacy. For deterministic test releases "
            "use replayable_noisy_counts, which is explicit about "
            "being non-private.")
    return replayable_noisy_counts(
        df, group_cols, epsilon, sensitivity=sensitivity,
        salt=seed, clamp_nonnegative=clamp_nonnegative)
