"""Perceptual dHash + Hamming near-dup (operators/imagehash.py)."""

import numpy as np
from pyspark.sql import functions as F
import pytest

from pipelines_rj_sms_spark.operators.imagehash import (
    dhash_bits,
    dhash_images,
    hamming_near_dupes,
)
from pipelines_rj_sms_spark.operators.multimodal import encode_bmp


def _grad_image(blocks, scale=2):
    """(gh, gw) int block grid -> HxWx3 gray RGB uint8 at scale."""
    px = np.repeat(np.repeat(np.asarray(blocks), scale, 0), scale, 1)
    return np.stack([px, px, px], axis=-1).astype(np.uint8)


def test_dhash_hand_computed_bits():
    # 2 rows x 3 block-cols -> hash_w=2, hash_h=2: 4 bits.
    # row 0: 10 < 20 (bit0=1), 20 > 5 (bit1=0)
    # row 1: 7 > 3 (bit2=0),  3 < 9 (bit3=1)
    img = _grad_image([[10, 20, 5], [7, 3, 9]])
    assert dhash_bits(img, hash_w=2, hash_h=2) == 0b1001


def test_dhash_brightness_invariance():
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 200, size=(7, 10))
    base = dhash_bits(_grad_image(blocks))
    assert dhash_bits(_grad_image(blocks + 30)) == base
    assert base != dhash_bits(_grad_image(blocks[::-1]))


def test_dhash_64bit_sign_wrap_fits_long():
    # Monotonically increasing blocks -> every bit set -> with an
    # 8x8 grid the packed value wraps to -1 (all 64 bits on).
    blocks = np.arange(8 * 9).reshape(8, 9) * 2
    val = dhash_bits(_grad_image(blocks), hash_w=8, hash_h=8)
    assert val == -1
    assert -(1 << 63) <= val < (1 << 63)


def test_dhash_nearest_grid_fallback_non_divisible():
    # 15x21 image does not divide the 7x10 grid evenly -> sampling
    # path; still deterministic and brightness-invariant.
    rng = np.random.default_rng(3)
    px = rng.integers(0, 200, size=(15, 21))
    img = np.stack([px, px, px], -1).astype(np.uint8)
    v1 = dhash_bits(img)
    v2 = dhash_bits(np.clip(img.astype(int) + 20, 0, 255).astype(np.uint8))
    assert v1 == v2


def test_dhash_images_spark_matches_local(spark):
    rng = np.random.default_rng(11)
    rows, want = [], {}
    for mid in range(20):
        blocks = rng.integers(0, 200, size=(7, 10))
        content = encode_bmp(_grad_image(blocks))
        rows.append((mid, bytearray(content)))
        want[mid] = dhash_bits(_grad_image(blocks))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: (r["dhash"], r["width"], r["height"])
           for r in dhash_images(df).collect()}
    assert {k: v[0] for k, v in got.items()} == want
    assert got[0][1:] == (20, 14)


def test_hamming_near_dupes_recall_vs_brute_force(spark):
    # Random 63-bit hashes + planted near pairs; banded join must
    # find EXACTLY the brute-force pair set (pigeonhole recall 1.0).
    rng = np.random.default_rng(23)
    hs = [int(x) for x in rng.integers(0, 1 << 63, size=60, dtype=np.uint64)]
    for i in range(0, 20, 2):              # plant near pairs
        flip = 0
        for bit in rng.choice(63, size=int(rng.integers(0, 5)),
                              replace=False):
            flip |= 1 << int(bit)
        hs[i + 1] = hs[i] ^ flip
    brute = {
        (a, b, bin(hs[a] ^ hs[b]).count("1"))
        for a in range(60) for b in range(a + 1, 60)
        if bin(hs[a] ^ hs[b]).count("1") <= 4
    }
    df = spark.createDataFrame(list(enumerate(hs)), "media_id long, dhash long")
    got = {(r["id_a"], r["id_b"], r["hamming_dist"])
           for r in hamming_near_dupes(df, max_dist=4).collect()}
    assert got == brute
    assert brute                           # planted pairs really exist


def test_hamming_near_dupes_plan_no_cartesian(spark):
    df = spark.createDataFrame([(1, 5), (2, 7)], "media_id long, dhash long")
    plan = hamming_near_dupes(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_hamming_near_dupes_rejects_too_few_bands():
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_dupes(None, max_dist=4, n_bands=3)


def test_envelope_bits_matches_grid_formula():
    import io
    import wave

    from pipelines_rj_sms_spark.operators.imagehash import (
        envelope_bits,
        pack_gradient_bits,
    )
    from pipelines_rj_sms_spark.operators.multimodal import decode_wav

    rng = np.random.default_rng(13)
    grid = rng.integers(-300, 300, size=(7, 10))
    s = np.repeat(grid.reshape(-1), 16).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(s.tobytes())
    _, _, x = decode_wav(buf.getvalue())
    # energies are |value| * 16 -> gradient bits follow |grid|
    want = pack_gradient_bits(np.abs(grid) * 16, 9, 7)
    assert envelope_bits(x) == want


def test_envelope_bits_rejects_short_clip():
    with pytest.raises(ValueError, match="envelope grid"):
        from pipelines_rj_sms_spark.operators.imagehash import envelope_bits
        envelope_bits(np.zeros(100))


def test_wav_envelope_hash_spark_roundtrip(spark):
    import io
    import wave

    from pipelines_rj_sms_spark.operators.imagehash import (
        envelope_bits,
        wav_envelope_hash,
    )
    rng = np.random.default_rng(29)
    rows, want = [], {}
    for mid in range(8):
        s = rng.integers(-2000, 2000, size=1120).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(s.tobytes())
        rows.append((mid, bytearray(buf.getvalue())))
        want[mid] = envelope_bits(s.astype(np.float64) / 32768.0)
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: (r["dhash"], r["sample_rate"], r["n_samples"])
           for r in wav_envelope_hash(df).collect()}
    assert {k: v[0] for k, v in got.items()} == want
    assert got[0][1:] == (16000, 1120)


def test_dedup_clusters_matches_all_pairs_components(spark):
    from pipelines_rj_sms_spark.operators.dedup import connected_components
    from pipelines_rj_sms_spark.operators.imagehash import dedup_clusters

    rng = np.random.default_rng(41)
    hs = [int(x) for x in rng.integers(0, 1 << 63, size=30, dtype=np.uint64)]
    hs[1] = hs[0]                     # exact dup group
    hs[2] = hs[0]
    hs[3] = hs[0] ^ 0b11              # near dup of the group
    hs[11] = hs[10] ^ (1 << 40)       # separate near pair
    df = spark.createDataFrame(list(enumerate(hs)),
                               "media_id long, dhash long")
    fast = {(r["node"], r["component"])
            for r in dedup_clusters(df, max_dist=4).collect()}
    pairs = hamming_near_dupes(df, max_dist=4)
    slow = {(r["node"], r["component"]) for r in connected_components(
        pairs, nodes=df.select("media_id"), node_col="media_id").collect()}
    assert fast == slow
    comp = dict(fast)
    assert comp[0] == comp[1] == comp[2] == comp[3] == 0
    assert comp[11] == comp[10]


def test_dedup_clusters_degenerate_corpus_bands_once(spark):
    """1000 identical images = ONE distinct hash: the banded stage
    sees one representative row, not 10^6 pairs."""
    from pipelines_rj_sms_spark.operators.imagehash import dedup_clusters
    df = spark.range(1000).select(
        F.col("id").alias("media_id"), F.lit(12345).alias("dhash"))
    out = dedup_clusters(df)
    assert out.count() == 1000
    assert out.select("component").distinct().collect()[0][0] == 0


def test_hamming_near_dupes_sign_wrapped_64bit(spark):
    """64-bit hashes with the top bit set are NEGATIVE longs; the
    unsigned band shifts and xor/bit_count must still be exact."""
    rng = np.random.default_rng(53)
    hs = []
    for x in rng.integers(0, 1 << 64, size=40, dtype=np.uint64):
        v = int(x)
        hs.append(v - (1 << 64) if v >= 1 << 63 else v)
    hs[1] = hs[0] ^ 0b101              # near pair across the sign bit
    hs[3] = hs[2] ^ (1 << 63)          # differs ONLY in the sign bit
    if hs[3] >= 1 << 63:
        hs[3] -= 1 << 64
    brute = {
        (a, b, bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1"))
        for a in range(40) for b in range(a + 1, 40)
        if bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1") <= 4
    }
    df = spark.createDataFrame(list(enumerate(hs)),
                               "media_id long, dhash long")
    got = {(r["id_a"], r["id_b"], r["hamming_dist"])
           for r in hamming_near_dupes(df, max_dist=4,
                                       n_bits=64).collect()}
    assert got == brute
    assert any(p[:2] == (2, 3) for p in got)   # sign-bit-only pair found


def test_hamming_bands_never_zero_width(spark):
    """The ADVICE regression: classic 64-bit dHash (8x8) with
    max_dist=8 gives 9 bands over 64 bits — ceil-banding put band 8
    past bit 64 with a constant-zero mask, silently cross-joining the
    corpus. Balanced widths must keep every band >= 1 bit AND keep
    exact recall."""
    rng = np.random.default_rng(61)
    hs = []
    for x in rng.integers(0, 1 << 64, size=40, dtype=np.uint64):
        v = int(x)
        hs.append(v - (1 << 64) if v >= 1 << 63 else v)
    hs[1] = hs[0] ^ 0xFF                  # dist 8 pair (the max)
    brute = {
        (a, b, bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1"))
        for a in range(40) for b in range(a + 1, 40)
        if bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1") <= 8
    }
    df = spark.createDataFrame(list(enumerate(hs)),
                               "media_id long, dhash long")
    got = {(r["id_a"], r["id_b"], r["hamming_dist"])
           for r in hamming_near_dupes(df, max_dist=8,
                                       n_bits=64).collect()}
    assert got == brute
    assert any(p[:2] == (0, 1) for p in got)


def test_hamming_rejects_more_bands_than_bits():
    with pytest.raises(ValueError, match="at least one bit"):
        hamming_near_dupes(None, max_dist=70, n_bits=63)


def test_dhash_fallback_index_math_is_integer_exact():
    """Nearest-grid sampling must use floor(i*h/gh) in INTEGER math —
    compare against the pure-integer reference on awkward dims."""
    rng = np.random.default_rng(67)
    h, w = 1021, 1471                      # primes: worst-case strides
    px = rng.integers(0, 255, size=(h, w))
    img = np.stack([px, px, px], -1).astype(np.uint8)
    gh, gw = 7, 10
    ys = [i * h // gh for i in range(gh)]
    xs = [j * w // gw for j in range(gw)]
    from pipelines_rj_sms_spark.operators.imagehash import (
        pack_gradient_bits,
    )
    want = pack_gradient_bits(
        [[int(px[y][x]) for x in xs] for y in ys], 9, 7)
    assert dhash_bits(img) == want


def _wav_bytes(samples_i2):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(np.asarray(samples_i2, dtype="<i2").tobytes())
    return bytearray(buf.getvalue())


def test_windowed_hashes_catch_time_shifted_duplicate(spark):
    """A clip prefixed with 2 blocks of silence defeats the single
    fixed-origin hash but MUST be caught by the windowed variant:
    window 2 of the padded clip == window 0 of the original."""
    from pipelines_rj_sms_spark.operators.imagehash import (
        wav_envelope_hash,
        wav_windowed_envelope_hash,
        windowed_near_dupes,
    )
    rng = np.random.default_rng(71)
    sig = rng.integers(50, 2000, size=1120)
    pad = np.concatenate([np.zeros(32, dtype=int), sig])
    other = rng.integers(50, 2000, size=1120)
    df = spark.createDataFrame(
        [(0, _wav_bytes(sig)), (1, _wav_bytes(pad)), (2, _wav_bytes(other))],
        "media_id long, content binary")

    single = {r["media_id"]: r["dhash"]
              for r in wav_envelope_hash(df).collect()}
    assert single[0] != single[1]          # fixed-origin hash defeated

    wh = wav_windowed_envelope_hash(df, n_windows=4)
    rows = wh.collect()
    # clip 0 fits 1 window (exactly grid-length), clip 1 fits 3
    assert sum(1 for r in rows if r["media_id"] == 0) == 1
    assert sum(1 for r in rows if r["media_id"] == 1) == 3
    by_key = {(r["media_id"], r["win_idx"]): r["dhash"] for r in rows}
    assert by_key[(1, 2)] == by_key[(0, 0)]

    pairs = {(r["id_a"], r["id_b"]): r["min_hamming"]
             for r in windowed_near_dupes(wh, max_dist=4).collect()}
    assert pairs.get((0, 1)) == 0          # shifted duplicate caught
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_amplitude_scaled_duplicate_hashes_identically(spark):
    """Amplitude contract: a positive integer-exact rescale (x2, and
    /2 on even samples) preserves every strict gradient inequality AND
    every tie, so the duplicate's hash is bit-identical — including a
    pinned tie row (two equal-energy cells stay equal under scaling
    and keep their gradient bit at 0)."""
    from pipelines_rj_sms_spark.operators.imagehash import (
        envelope_bits,
        wav_envelope_hash,
    )
    rng = np.random.default_rng(13)
    sig = rng.integers(25, 1000, size=1120) * 2     # even: /2 stays exact
    # pin a tie: make cells (0,0) and (0,1) equal-energy — blocks of
    # constant amplitude 100 -> equal sums; the (row 0, col 0)
    # gradient bit must be 0 (right cell NOT larger) at every scale
    sig[:32] = 100
    doubled = sig * 2                                # max 4000 << 32767
    halved = sig // 2
    df = spark.createDataFrame(
        [(0, _wav_bytes(sig)), (1, _wav_bytes(doubled)),
         (2, _wav_bytes(halved))],
        "media_id long, content binary")
    got = {r["media_id"]: r["dhash"] for r in wav_envelope_hash(df).collect()}
    assert got[0] == got[1] == got[2]
    # the tie bit is genuinely exercised and pinned to 0
    assert envelope_bits(sig / 32768.0) & 1 == 0
    grid0 = np.abs(sig[:1120]).reshape(7, 10, 16).sum(axis=2)
    assert grid0[0, 0] == grid0[0, 1]                # the tie is real


def test_sub_block_stride_catches_sub_block_offset(spark):
    """A clip padded by HALF an energy block (8 samples) evades the
    default stride=block windows but is caught with stride=8: window 1
    of the padded clip realigns exactly with window 0 of the
    original."""
    from pipelines_rj_sms_spark.operators.imagehash import (
        wav_windowed_envelope_hash,
        windowed_near_dupes,
    )
    rng = np.random.default_rng(29)
    sig = rng.integers(50, 2000, size=1200)
    pad = np.concatenate([np.zeros(8, dtype=int), sig])
    df = spark.createDataFrame(
        [(0, _wav_bytes(sig)), (1, _wav_bytes(pad))],
        "media_id long, content binary")

    block_stride = wav_windowed_envelope_hash(df, n_windows=4)
    coarse = {(r["media_id"], r["win_idx"]): r["dhash"]
              for r in block_stride.collect()}
    assert not any(coarse.get((1, w)) == coarse[(0, 0)]
                   for w in range(4))      # default stride: evaded

    fine = wav_windowed_envelope_hash(df, n_windows=8, stride=8)
    by_key = {(r["media_id"], r["win_idx"]): r["dhash"]
              for r in fine.collect()}
    assert by_key[(1, 1)] == by_key[(0, 0)]
    pairs = {(r["id_a"], r["id_b"]): r["min_hamming"]
             for r in windowed_near_dupes(fine, max_dist=0,
                                          max_windows=8).collect()}
    assert pairs.get((0, 1)) == 0


def test_windowed_near_dupes_plan_no_cartesian(spark):
    from pipelines_rj_sms_spark.operators.imagehash import (
        windowed_near_dupes,
    )
    df = spark.createDataFrame([(1, 0, 5), (2, 0, 7)],
                               "media_id long, win_idx long, dhash long")
    plan = windowed_near_dupes(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
