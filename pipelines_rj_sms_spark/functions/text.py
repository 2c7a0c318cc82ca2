"""Text-analysis operators for training-data pipelines.

Beyond the reference's regex surface (P8, C4 — e.g. the stigma-regex scan
in transform/gemini/pacientes_restritos/tasks.py:30-35), these are the
text-quality operators a 100 TB document pipeline needs: language ID,
quality scoring, token counting, fingerprinting. All expression-only
(split / regexp / aggregate) so they stay in WholeStageCodegen — no
Python in the hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language ID. Deliberately small: the point is the *operator shape*
# (score-per-language -> argmax), not lexicon quality.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to", "in", "that", "it"],
    "pt": ["de", "que", "nao", "uma", "para", "com", "os", "das"],
    "es": ["el", "la", "los", "por", "una", "para", "del", "como"],
    "fr": ["le", "la", "les", "des", "est", "pour", "dans", "une"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
}

# Whitespace tokenization base; BPE-ish regex splits punctuation runs and
# numbers off words, approximating subword-ish counts.
_BPE_ISH = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a lowercased document (empty strings removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: words + number runs + punctuation marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_ISH), F.lit(0)))


def _bind(value: Column, build) -> Column:
    """Evaluate ``value`` once and feed it to ``build`` as a lambda
    variable (transform over a 1-element array). Spark inlines plain
    column references per use site, so an expression referenced N times
    runs N times per row — this is the expression-level `let`."""
    return F.element_at(F.transform(F.array(value), build), 1)


def _score_from_tokens(t: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
    hits = F.size(F.filter(t, lambda x: F.array_contains(markers, x)))
    return hits / F.greatest(F.size(t), F.lit(1))


def lang_score(col: Column | str, lang: str) -> Column:
    """Fraction of tokens that are markers of ``lang``."""
    return _bind(tokens(col), lambda t: _score_from_tokens(t, lang))


def lang_id(col: Column | str) -> Column:
    """Argmax language over the marker sets; 'und' when nothing matches.

    Expression-only argmax: build array<struct<score,neg_ord,lang>> and
    take array_max (struct ordering compares fields in order, so ties
    break toward the earliest-declared language deterministically).
    Tokens bound once — 5 languages x 2 references would otherwise
    re-tokenize 10x per row.
    """
    def build(t: Column) -> Column:
        scored = F.array(*[
            F.struct(
                _score_from_tokens(t, lang).alias("score"),
                F.lit(-i).alias("neg_ord"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(_LANG_MARKERS)
        ])
        best = F.array_max(scored)
        return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))

    return _bind(tokens(col), build)


def quality_score(col: Column | str) -> Column:
    """Composite document-quality score in [0,1]:

    mean of (a) length adequacy (>=20 tokens), (b) alphabetic ratio,
    (c) non-excessive punctuation, (d) mean-word-length sanity (2..12).
    The shape mirrors C4-style heuristics; weights are engine policy.
    """
    c = F.col(col) if isinstance(col, str) else col

    def build(n_tok: Column) -> Column:
        n_chars = F.greatest(F.length(c), F.lit(1))
        alpha_ratio = F.length(F.regexp_replace(c, r"[^a-zA-Z]", "")) / n_chars
        punct_ratio = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")) / n_chars
        mean_word = n_chars / F.greatest(n_tok, F.lit(1))
        return (
            F.least(n_tok / F.lit(20.0), F.lit(1.0))
            + alpha_ratio
            + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
            + F.when((mean_word >= 2) & (mean_word <= 12), 1.0).otherwise(0.0)
        ) / 4

    return _bind(token_count(c), build)


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the dedup/minhash unit).

    The token array is bound once as a lambda variable (transform over a
    1-element array) — naively inlining ``tokens(col)`` at each of its 4
    reference sites re-runs split+filter per site per row (9x slower,
    measured at sf0.1)."""
    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
        grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)))
        return F.array_distinct(
            F.when(F.size(t) >= n, grams).otherwise(F.array(F.concat_ws(" ", t)))
        )

    return F.element_at(F.transform(F.array(tokens(col)), build), 1)


def dup_token_fraction(col: Column | str) -> Column:
    """Gopher-style repetition signal: 1 - distinct_tokens/total_tokens
    (0.0 for empty docs). Pure array expressions — one pass per row."""
    return _bind(tokens(col), lambda t: F.when(
        F.size(t) > 0,
        F.lit(1.0) - F.size(F.array_distinct(t)) / F.size(t),
    ).otherwise(F.lit(0.0)))


def token_bigrams(col: Column | str) -> Column:
    """Adjacent word pairs ("a b") of the whitespace tokens; empty array
    below 2 tokens. zip_with over two offset slices — no explode here,
    so callers choose where the fan-out lands in the plan."""
    return _bind(tokens(col), lambda t: F.when(
        F.size(t) > 1,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b)),
    ).otherwise(F.array().cast("array<string>")))


def token_ngrams(col: Column | str, n: int) -> Column:
    """Adjacent word n-grams ("a b c") of the whitespace tokens; empty
    array below ``n`` tokens. Like :func:`token_bigrams`, no explode
    here — callers choose where the fan-out lands in the plan."""
    if n < 1:
        raise ValueError("token_ngrams needs n >= 1")
    return _bind(tokens(col), lambda t: F.when(
        F.size(t) >= n,
        F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)),
                    lambda i: F.array_join(F.slice(t, i, n), " ")),
    ).otherwise(F.array().cast("array<string>")))


def rolling_fingerprint(col: Column | str, hash_fn: str = "xxhash64",
                        modulus: int = 1_000_000_007,
                        multiplier: int = 31) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over the token stream, ``h = (h*m + hash(tok)) % p`` folded left to
    right with ``aggregate`` — expression-only, stays in codegen.

    Unlike the min-shingle ``fingerprint`` (order-insensitive set
    semantics), this detects *exact sequence* duplicates: two documents
    collide only if their token sequences match (mod collisions).

    ``hash_fn='xxhash64'`` (default) is the fast JVM path;
    ``'md5'`` derives a 32-bit token hash from the first 8 md5 hex
    chars — portable arithmetic any engine reproduces exactly (the
    DuckDB oracle spelling is ``list_reduce(list_prepend(0, ...))``).
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be xxhash64|md5: {hash_fn}")

    def tok_hash(x: Column) -> Column:
        if hash_fn == "md5":
            return F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
        # keep the folded value non-negative so % behaves identically
        # to the md5 path (Java % keeps the dividend's sign)
        return F.pmod(F.xxhash64(x), F.lit(modulus))

    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * multiplier + tok_hash(x)) % modulus,
    )


def fingerprint(col: Column | str, window: int = 8) -> Column:
    """Document fingerprint: min xxhash64 over character 8-gram windows
    (rolling-hash winnowing reduced to global-min — one pass, no UDF)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - window + 1, F.lit(1)))
    hashes = F.transform(idx, lambda i: F.xxhash64(c.substr(i, F.lit(window))))
    return F.array_min(hashes)


def winnow_fingerprints(col: Column | str, k: int = 8, w: int = 4,
                        hash_fn: str = "xxhash64") -> Column:
    """Full winnowing (Schleimer/Wilkerson/Aiken, the MOSS algorithm):
    hash every character k-gram, slide a window of ``w`` consecutive
    hashes, keep each window's minimum — the distinct set is the
    document's fingerprint sketch (sorted array<bigint>).

    Guarantees: any shared substring of length >= k + w - 1 between two
    documents yields at least one shared fingerprint, while only
    ~2/(w+1) of positions are kept — the sketch is a guaranteed-recall,
    tunable-size plagiarism/overlap detector that ``fingerprint``'s
    single global min cannot provide. Sharing detection is then an
    equi-join on exploded fingerprints (shuffle of 8-byte keys).

    Expression-only (two transform passes over index ranges, no UDF);
    ``hash_fn='md5'`` is the portable-arithmetic variant any SQL engine
    replays exactly (32-bit int from the first 8 md5 hex chars).
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be xxhash64|md5: {hash_fn}")
    c = F.lower(F.col(col) if isinstance(col, str) else col)

    def gram_hash(i: Column) -> Column:
        gram = c.substr(i, F.lit(k))
        if hash_fn == "md5":
            return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        return F.xxhash64(gram)

    def build(hashes: Column) -> Column:
        n_wins = F.greatest(F.size(hashes) - w + 1, F.lit(1))
        wins = F.transform(
            F.sequence(F.lit(1), n_wins),
            lambda j: F.array_min(F.slice(hashes, j, w)))
        return F.array_sort(F.array_distinct(wins))

    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - k + 1, F.lit(1)))
    return _bind(F.transform(idx, gram_hash), build)


def token_chunks(col: Column | str, size: int, stride: int | None = None,
                 id_within: str = "chunk_idx",
                 text_out: str = "chunk_text") -> Column:
    """Sliding token windows over a document — the pretraining context
    chunker (size tokens per chunk, step ``stride``; stride < size
    gives overlapping windows, stride == size is plain chunking).

    Returns an array of structs (chunk_idx, chunk_text, n_tokens) to be
    ``inline``d / exploded by the caller: expression-only, so a corpus
    chunking pass is one narrow projection — no shuffle, no Python.
    The final window may be shorter than ``size``; every token lands in
    at least one chunk.
    """
    if stride is None:
        stride = size
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    t = tokens(col)

    def build(toks: Column) -> Column:
        n = F.size(toks)
        starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))

        # two-arg lambda IS the (element, index) form — deliberately:
        # the array index is the chunk number
        def chunk(s: Column, i: Column) -> Column:
            piece = F.slice(toks, s, size)
            return F.struct(
                i.cast("long").alias(id_within),
                F.array_join(piece, " ").alias(text_out),
                F.size(piece).cast("long").alias("n_tokens"),
            )

        return F.transform(starts, chunk)

    return _bind(t, build)


def flesch_reading_ease(col: Column | str) -> Column:
    """Flesch reading-ease heuristic (public formula:
    206.835 - 1.015·words/sentences - 84.6·syllables/words), with the
    standard cheap proxies: sentences = runs of [.!?], syllables =
    vowel-group runs of the lowercased text. Expression-only regexp
    counting — stays in codegen, replays identically in any engine with
    RE2-class regexps. Returns a struct (n_sentences, n_words,
    n_syllables, score); score is null for empty docs, rounded to 6.
    """
    c = F.col(col) if isinstance(col, str) else col
    sents = F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0)))
    words = F.size(tokens(c))
    sylls = F.size(F.regexp_extract_all(
        F.lower(c), F.lit(r"[aeiouy]+"), F.lit(0)))
    score = F.when(
        words > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * words / F.greatest(sents, F.lit(1))
            - F.lit(84.6) * sylls / words, 6))
    return F.struct(sents.alias("n_sentences"), words.alias("n_words"),
                    sylls.alias("n_syllables"), score.alias("score"))


def compression_ratio_udf():
    """Arrow-batched pandas UDF computing the zlib compression ratio
    (compressed bytes / raw bytes, level 6) of a text column — the
    Gopher-style redundancy signal: highly repetitive boilerplate
    compresses far below natural prose (~0.3), random noise refuses to
    compress (~1.0). Deterministic for a fixed zlib version, but not
    expressible in SQL — the contract gate for it is rows-only.

    This is the sanctioned Python slow path (ArrowEvalPython, never
    row-at-a-time): one C-speed zlib call per document inside the Arrow
    batch loop; null/empty texts yield null.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)
        return texts.map(one)

    return _ratio


def char_entropy(col: Column | str) -> Column:
    """Per-document character-level Shannon entropy in NATS — the
    oracle-expressible sibling of the zlib `compression_ratio_udf`
    redundancy signal (low entropy = repetitive/templated text, high =
    diverse prose or noise), usable wherever an exact cross-engine
    gate is needed.

    EXPRESSION-ONLY and per-row: H = ln(n) − Σ_c cnt_c·ln(cnt_c) / n
    over the row's own characters, built from array ops (distinct
    chars × count-filter) — O(distinct·len) per row, NO explode, NO
    shuffle: at corpus scale this is a projection, where a
    char-explode + groupBy would shuffle one row per character.

    Determinism: ln(cnt) is pinned to the shared 1e-6 grid BEFORE the
    count multiply (functions/numeric.py "pinned transcendental
    values") and the cnt·units products fold as exact BIGINTs, so the
    value is bit-identical in any engine; ties in nothing, order in
    nothing. Empty/null texts yield null.
    """
    from pipelines_rj_sms_spark.functions.numeric import LOG_SCALE
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda x: x != F.lit(""))

    def _h(ch):
        n = F.size(ch)

        def term(u):
            # cnt * pinned-ln(cnt): ln pinned to the shared 1e-6 grid
            # BEFORE the count multiply, so a cross-engine libm ulp
            # cannot be amplified past a quantization boundary
            # (functions/numeric.py "pinned transcendental values")
            cnt = F.size(F.filter(ch, lambda x: x == u))
            lnp = F.floor(F.log(cnt.cast("double"))
                          * F.lit(float(LOG_SCALE)) + F.lit(0.5))
            return cnt.cast("long") * lnp

        su = F.aggregate(
            F.transform(F.array_distinct(ch), term),
            F.lit(0).cast("long"), lambda acc, v: acc + v)
        return F.when(
            n > 0,
            F.log(n.cast("double"))
            - (su.cast("double") / float(LOG_SCALE)) / n)

    return _bind(chars, _h)
