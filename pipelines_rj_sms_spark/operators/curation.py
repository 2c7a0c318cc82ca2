"""Document-corpus curation — the end-to-end training-data pipeline.

Composes the engine's text/dedup operators into the standard curation
funnel (the shape of C4/RefinedWeb-style pipelines, built entirely from
the operators this engine already gates individually):

    1. exact dedup        (hash-groupBy, keeps min-id per identical text)
    2. near-dedup         (MinHash-LSH candidates -> exact Jaccard verify
                           -> drop the higher-id member of each dup pair)
    3. quality filter     (composite score >= threshold)
    4. language filter    (argmax lang-id in an allowlist)

Every stage is expression-only / equi-join based (SCALE.md: no cross
products, no Python in the hot path), so the funnel scales with the
cluster. Returns (curated_df, report) where report counts per-stage
survivors — the reference's alert-style observability (Q1 posture).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.text import lang_id, quality_score
from pipelines_rj_sms_spark.operators import dedup
from pipelines_rj_sms_spark.operators.cache import track


@dataclass
class CurationReport:
    n_input: int
    n_after_exact: int
    n_after_near: int
    n_after_quality: int
    n_after_lang: int


def curate_documents(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     jaccard_threshold: float = 0.8,
                     quality_threshold: float = 0.5,
                     langs: tuple[str, ...] = ("en",),
                     minhash_hashes: int = 32, minhash_bands: int = 8,
                     hash_fn: str = "xxhash64", with_report: bool = True,
                     ) -> tuple[DataFrame, CurationReport | None]:
    # 1. exact — persisted: consumed by the LSH self-join (twice via its
    # own persist), the anti-join probe side, and the survivor count
    exact = dedup.dedup_exact(df, text_col, id_col).persist()

    # 2. near: LSH candidates -> verify -> drop higher-id duplicate
    cands = dedup.minhash_lsh_candidates(
        exact, id_col, text_col,
        num_hashes=minhash_hashes, bands=minhash_bands, hash_fn=hash_fn)
    dupes = dedup.ngram_jaccard_pairs(
        exact, id_col, text_col,
        threshold=jaccard_threshold, candidates=cands)
    drop = dupes.select(F.col("id_b").alias(id_col)).distinct()
    near = exact.join(drop, id_col, "left_anti").persist()

    # 3. quality
    q = near.filter(quality_score(text_col) >= quality_threshold)

    # 4. language
    curated = q.filter(lang_id(text_col).isin(*langs))
    # carry every persisted intermediate (exact, near, and whatever the
    # LSH/jaccard stages registered on `dupes`) for cache.release()
    curated = track(curated, exact, dupes, near)

    if not with_report:
        return curated, None
    # per-stage survivor counts (the reference's Q1-style observability);
    # stages 3-4 are filters over the persisted `near`, so the extra
    # actions rescan cached partitions, not the raw corpus
    report = CurationReport(
        n_input=df.count(),
        n_after_exact=exact.count(),
        n_after_near=near.count(),
        n_after_quality=q.count(),
        n_after_lang=curated.count(),
    )
    return curated, report
