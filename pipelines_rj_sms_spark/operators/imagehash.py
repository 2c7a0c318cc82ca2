"""Perceptual image hashing + Hamming-distance near-duplicate detection.

The multimodal extension of the dedup family (`operators/dedup.py`):
where MinHash buckets *text*, a perceptual hash buckets *pixels*. The
reference pipeline stores binary media columns (SURVEY §2 multimodal
rows); at training-data-lake scale the standard curation step over
those columns is near-duplicate image removal (dHash / aHash family —
public difference-hash construction, e.g. the widely documented
"dHash" gradient hash), which this module provides end to end:

  bytes -> decode (BMP/JPEG/PNG, `operators/multimodal.py` /
  `operators/jpeg.py` native decoders) -> integer luma -> exact
  box-downsample -> 63/64-bit gradient hash -> pigeonhole banded
  self-join -> exact Hamming verify.

Design notes for scale:
- Decode + hash run inside one Arrow-batched `mapInPandas` kernel
  (bytes never reach the driver; one batch of images in flight per
  task — the `extract_features` memory contract).
- EVERY arithmetic step is integer-exact (floor-division luma and
  box means), so hashes are bit-identical across engines and
  partitionings — the property the DuckDB oracle checks.
- Near-dup candidate generation is a *banded equi-join* (pigeonhole:
  two hashes within Hamming distance d agree exactly on at least one
  of d+1 disjoint bit-bands), never an O(n²) cross product — the same
  posture as MinHash-LSH banding. Exact `bit_count(a XOR b)` runs
  only on candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from pipelines_rj_sms_spark.operators.cache import track

_DHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("dhash", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
])


def _decode_pixels(content: bytes):
    """Magic-byte-routed image decode -> (w, h, HxWx3 RGB uint8).

    Same routing table as `multimodal._real_features`; raises at the
    codec slot for formats that need PIL/ffmpeg.
    """
    from pipelines_rj_sms_spark.operators.multimodal import decode_bmp

    if content is None:
        raise ValueError("NULL image payload")
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:2] == b"\xff\xd8":
        from pipelines_rj_sms_spark.operators.jpeg import decode_jpeg
        return decode_jpeg(content)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        from pipelines_rj_sms_spark.operators.jpeg import decode_png
        return decode_png(content)
    raise NotImplementedError(
        "perceptual hashing decodes BMP, baseline JPEG and PNG "
        "natively; this payload needs a PIL/ffmpeg codec")


def pack_gradient_bits(blocks, hash_w: int, hash_h: int) -> int:
    """Pack a (hash_h, hash_w+1) integer grid into the gradient hash:
    bit ``row*hash_w + col`` set when the right cell is larger.
    Shared core of the image dHash and the audio envelope hash —
    values >= 2^63 wrap into a signed 64-bit long."""
    import numpy as np

    blocks = np.asarray(blocks)
    bits = (blocks[:, 1:] > blocks[:, :-1]).astype(object)
    pos = np.arange(hash_w * hash_h).reshape(hash_h, hash_w)
    val = int((bits << pos).sum())
    if val >= 1 << 63:                       # two's-complement wrap
        val -= 1 << 64
    return val


def dhash_bits(px, hash_w: int = 9, hash_h: int = 7) -> int:
    """Difference hash of an HxWx3 uint8 RGB array: `hash_h` rows ×
    `hash_w` horizontal-gradient bits, packed LSB-first at position
    ``row*hash_w + col`` (bit set when the right block is brighter).

    Integer-exact by construction, so the same image always produces
    the same hash on any engine:
    - luma = (299·R + 587·G + 114·B) // 1000 (integer ITU-R 601);
    - the luma plane is reduced to a (hash_h, hash_w+1) block grid by
      exact integer box means (floor of block sum / block area) when
      the dimensions divide evenly, else by nearest-grid-point
      sampling (the `resize_images` index map).

    hash_w*hash_h > 63 wraps into a signed 64-bit long (two's
    complement) so the result always fits a Spark LongType.
    """
    import numpy as np

    h, w = px.shape[:2]
    gw, gh = hash_w + 1, hash_h
    p = px.astype(np.int64)
    luma = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    if h % gh == 0 and w % gw == 0:
        bh, bw = h // gh, w // gw
        blocks = luma.reshape(gh, bh, gw, bw).sum(axis=(1, 3)) // (bh * bw)
    else:
        # Integer-exact nearest-grid sampling (floor of i*h/gh) — float
        # math here could flip an index at large dims and break the
        # bit-identical-across-engines contract.
        ys = np.arange(gh) * h // gh
        xs = np.arange(gw) * w // gw
        blocks = luma[ys][:, xs]
    return pack_gradient_bits(blocks, hash_w, hash_h)


def dhash_images(df: DataFrame, content_col: str = "content",
                 id_col: str = "media_id",
                 hash_w: int = 9, hash_h: int = 7) -> DataFrame:
    """Per-image dHash via mapInPandas -> (media_id, dhash, width,
    height). The default 9×7 = 63-bit grid keeps the packed hash a
    positive BIGINT (no sign games in band math or oracles); pass
    8×8 for the classic 64-bit dHash (sign-wrapped, still exact)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "dhash": [], "width": [], "height": []}
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                w, h, px = _decode_pixels(content)
                out["media_id"].append(mid)
                out["dhash"].append(dhash_bits(px, hash_w, hash_h))
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(kernel, _DHASH_SCHEMA)


def envelope_bits(samples, hash_w: int = 9, hash_h: int = 7,
                  block: int = 16) -> int:
    """Gradient hash of a PCM clip's time-energy envelope: the first
    ``hash_h * (hash_w+1) * block`` samples form a
    (hash_h, hash_w+1) grid of absolute-amplitude block energies,
    packed by the same gradient rule as the image dHash (the
    energy-envelope analog of the public Haitsma-Kalker band-energy
    fingerprint, with time segments instead of spectral bands so the
    math stays integer-exact and oracle-replayable).

    ``samples`` is decode_wav's [-1, 1] float output; 16-bit PCM
    levels are dyadic rationals, so scaling back by 32768 recovers
    the exact integers and every energy is an exact integer sum.
    Raises on clips shorter than the grid."""
    import numpy as np

    gw, gh = hash_w + 1, hash_h
    need = gw * gh * block
    if samples.shape[0] < need:
        raise ValueError(
            f"clip has {samples.shape[0]} samples; envelope grid needs "
            f"{need} ({gh}x{gw} cells x {block})")
    s = np.abs(np.rint(np.asarray(samples[:need]) * 32768.0)) \
        .astype(np.int64)
    grid = s.reshape(gh, gw, block).sum(axis=2)
    return pack_gradient_bits(grid, hash_w, hash_h)


def wav_envelope_hash(df: DataFrame, content_col: str = "content",
                      id_col: str = "media_id", hash_w: int = 9,
                      hash_h: int = 7, block: int = 16) -> DataFrame:
    """Per-clip envelope hash via mapInPandas -> (media_id, dhash,
    sample_rate, n_samples). Same Arrow-batch contract and the same
    downstream :func:`hamming_near_dupes` banding as images — the
    audio leg of multimodal near-dup removal."""
    from pipelines_rj_sms_spark.operators.multimodal import decode_wav

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "dhash": [],
                   "sample_rate": [], "n_samples": []}
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                rate, n, x = decode_wav(content)
                out["media_id"].append(mid)
                out["dhash"].append(envelope_bits(x, hash_w, hash_h, block))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(kernel, schema)


def wav_windowed_envelope_hash(df: DataFrame, content_col: str = "content",
                               id_col: str = "media_id", hash_w: int = 9,
                               hash_h: int = 7, block: int = 16,
                               n_windows: int = 4,
                               stride: int | None = None) -> DataFrame:
    """Offset-robust envelope fingerprints: one gradient hash per time
    window -> (media_id, win_idx, dhash, sample_rate, n_samples).

    :func:`wav_envelope_hash` fingerprints only the first
    ``gh*gw*block`` samples, so a leading-silence pad or a one-block
    offset defeats it. This variant hashes up to ``n_windows``
    overlapping grids per clip — window ``w`` covers samples
    ``[w*stride, w*stride + grid_len)`` (default stride = one energy
    block) and is emitted only when it fits entirely inside the clip,
    so every hash is a full-grid hash on both engines. A clip shifted
    by k <= n_windows-1 blocks still collides with the original on
    the window pair (k, 0) — the same pigeonhole posture as image
    banding, applied on the time axis. Feed the output to
    :func:`windowed_near_dupes` for clip-level pairs.

    Offset contract: with the default ``stride=block``, only shifts
    that are an exact multiple of ``block`` samples are caught. Pass
    a smaller ``stride`` (e.g. ``block // 4``) to catch sub-block
    offsets that are multiples of that stride, at proportionally more
    hashes per clip (cost x block/stride); shifts that are not a
    multiple of the chosen stride remain out of contract (they
    re-phase every energy block), as does resampling.

    Amplitude contract: the hash compares block energies pairwise, so
    any positive rescale that maps the 16-bit integer samples to
    integers (x2, /2 on even samples, ...) preserves every strict
    inequality AND every tie — the rescaled duplicate hashes
    identically. Non-integer rescales perturb each energy by <1 LSB
    per sample and can flip near-tie gradient bits; pair with
    :func:`windowed_near_dupes`'s ``max_dist`` tolerance for those.
    """
    from pipelines_rj_sms_spark.operators.multimodal import decode_wav

    stride = block if stride is None else stride
    need = (hash_w + 1) * hash_h * block
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("dhash", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "win_idx": [], "dhash": [],
                   "sample_rate": [], "n_samples": []}
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                rate, n, x = decode_wav(content)
                for w in range(n_windows):
                    lo = w * stride
                    if lo + need > n:
                        break
                    out["media_id"].append(mid)
                    out["win_idx"].append(w)
                    out["dhash"].append(
                        envelope_bits(x[lo:], hash_w, hash_h, block))
                    out["sample_rate"].append(rate)
                    out["n_samples"].append(n)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(kernel, schema)


def windowed_near_dupes(win_hashes: DataFrame, id_col: str = "media_id",
                        win_col: str = "win_idx", hash_col: str = "dhash",
                        max_dist: int = 4, n_bits: int = 63,
                        n_bands: int | None = None,
                        max_windows: int = 64) -> DataFrame:
    """Clip-level near-dup pairs from windowed hashes: (id_a, id_b,
    min_hamming) with id_a < id_b, where two clips match when ANY
    window pair agrees within ``max_dist``.

    Runs the standard banded :func:`hamming_near_dupes` over composite
    (clip, window) ids — ``clip_id * max_windows + win_idx`` (ids must
    be non-negative and win_idx < max_windows) — then collapses window
    pairs back to clip pairs with a min-distance agg. Same-clip window
    pairs (adjacent windows of one clip are often similar) are dropped
    before the agg. Cost shape is unchanged from the unwindowed path:
    the explode factor is windows x bands, still never all-pairs.
    """
    comp = win_hashes.select(
        (F.col(id_col) * max_windows + F.col(win_col)).alias("_wid"),
        F.col(hash_col))
    pairs = hamming_near_dupes(comp, id_col="_wid", hash_col=hash_col,
                               max_dist=max_dist, n_bits=n_bits,
                               n_bands=n_bands)
    a_clip = F.expr(f"id_a div {max_windows}")
    b_clip = F.expr(f"id_b div {max_windows}")
    return (pairs
            .select(a_clip.alias("_a"), b_clip.alias("_b"), "hamming_dist")
            .filter(F.col("_a") != F.col("_b"))
            .select(F.least("_a", "_b").alias("id_a"),
                    F.greatest("_a", "_b").alias("id_b"),
                    "hamming_dist")
            .groupBy("id_a", "id_b")
            .agg(F.min("hamming_dist").alias("min_hamming")))


def hamming_near_dupes(hashes: DataFrame, id_col: str = "media_id",
                       hash_col: str = "dhash", max_dist: int = 4,
                       n_bits: int = 63,
                       n_bands: int | None = None) -> DataFrame:
    """All pairs within Hamming distance ``max_dist`` of each other,
    as (id_a, id_b, hamming_dist) with id_a < id_b.

    Pigeonhole banding: the ``n_bits`` hash is cut into ``n_bands``
    disjoint contiguous bit-bands (default ``max_dist + 1``); two
    hashes with at most ``max_dist`` differing bits must agree
    *exactly* on at least one band, so an equi-join on
    (band_idx, band_val) finds every qualifying pair — recall 1.0 by
    construction, verified by `bit_count(a XOR b) <= max_dist` on the
    (much smaller) candidate set. The join key is a short (int, long)
    pair; the corpus never cross-joins.

    Scale: one explode (×n_bands), one self-equi-join on banded keys,
    one distinct. Hot band values (e.g. all-zero bands from flat
    images) bound candidate blowup by band-value group size — cap
    upstream with a frequency filter if a corpus is degenerate.
    """
    if n_bands is None:
        n_bands = max_dist + 1
    if n_bands < max_dist + 1:
        raise ValueError(
            f"n_bands={n_bands} < max_dist+1={max_dist + 1}: pigeonhole "
            "recall guarantee needs at least max_dist+1 bands")
    if n_bands > n_bits:
        raise ValueError(
            f"n_bands={n_bands} > n_bits={n_bits}: every band needs at "
            "least one bit or its band value is a constant and the "
            "banded join degenerates to an all-pairs cross product")
    # Balanced widths (n_bits//n_bands, +1 for the first n_bits%n_bands
    # bands) so no band is ever zero-width: with ceil widths a config
    # like n_bits=64, n_bands=9 put band 8 past bit 64 with mask 0 — a
    # constant band value that silently cross-joined the whole corpus.
    widths = [n_bits // n_bands + (1 if b < n_bits % n_bands else 0)
              for b in range(n_bands)]
    offsets = [sum(widths[:b]) for b in range(n_bands)]
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftrightunsigned(F.col(hash_col), offsets[b])
            .bitwiseAND(F.lit((1 << widths[b]) - 1))
            .alias("band_val"),
        )
        for b in range(n_bands)
    ])
    banded = track(
        hashes.select(
            F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"),
            F.explode(bands).alias("_b"))
        .select("_id", "_h", "_b.band_idx", "_b.band_val")
        .persist())
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                F.col("a._h").alias("_ha"), F.col("b._h").alias("_hb"))
        .distinct()
        .withColumn("hamming_dist",
                    F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))))
        .filter(F.col("hamming_dist") <= max_dist)
        .drop("_ha", "_hb")
    )
    return track(pairs, banded)


def dedup_clusters(hashes: DataFrame, id_col: str = "media_id",
                   hash_col: str = "dhash", max_dist: int = 4,
                   n_bits: int = 63,
                   n_bands: int | None = None) -> DataFrame:
    """Near-dup cluster labels (id, component) with component = the
    smallest member id — the degenerate-proof form of
    ``hamming_near_dupes`` + connected components.

    A real media corpus has huge exact-duplicate groups (solid-color
    thumbnails, retransmitted files): pairing them directly is
    O(group²) in the PAIR OUTPUT itself, before any join strategy can
    help. This operator collapses each distinct hash to one
    representative (min id — one hash agg), runs the banded Hamming
    join over DISTINCT hashes only, labels representative clusters
    with O(diameter) min-label rounds, and joins membership back — so
    a million identical images cost one representative row in the
    quadratic stage and the output stays O(n).

    The labeling equals running components over all-member pairs:
    every member of a hash group is trivially distance-0 from its
    representative, and min-over-cluster = min-over-representatives
    because each representative is already its group's min.
    """
    from pipelines_rj_sms_spark.operators.dedup import connected_components

    reps = track(
        hashes.groupBy(hash_col).agg(F.min(id_col).alias("_rep"))
        .persist())
    rep_pairs = hamming_near_dupes(
        reps.select(F.col("_rep").alias(id_col), F.col(hash_col)),
        id_col=id_col, hash_col=hash_col, max_dist=max_dist,
        n_bits=n_bits, n_bands=n_bands)
    comp = connected_components(
        rep_pairs, nodes=reps.select(F.col("_rep").alias(id_col)),
        node_col=id_col)
    out = (hashes.select(id_col, hash_col)
           .join(reps, hash_col)
           .join(comp.select(F.col("node").alias("_rep"), "component"),
                 "_rep")
           .select(F.col(id_col).alias("node"), "component"))
    return track(out, reps)
