"""FLAC decoder (operators/flac.py).

The fixture generator is a MINIMAL FLAC writer living only in the
test: STREAMINFO + frames with CONSTANT / VERBATIM / FIXED(order 1-2)
subframes and Rice-coded residuals. FLAC is lossless, so every test
demands bit-exact sample recovery — no tolerance.
"""

import struct

import numpy as np
import pytest

from pipelines_rj_sms_spark.operators.flac import decode_flac


class _BitW:
    def __init__(self):
        self.bits: list[int] = []

    def w(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def w_signed(self, value: int, n: int) -> None:
        self.w(value & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        self.bits.extend([0] * q + [1])

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i: i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _streaminfo(rate: int, nch: int, bps: int, total: int) -> bytes:
    bw = _BitW()
    bw.w(4096, 16); bw.w(4096, 16)   # min/max blocksize
    bw.w(0, 24); bw.w(0, 24)         # min/max framesize (unknown)
    bw.w(rate, 20)
    bw.w(nch - 1, 3)
    bw.w(bps - 1, 5)
    bw.w(total, 36)
    body = bw.bytes() + b"\x00" * 16   # + md5
    return (b"\x80" + struct.pack(">I", len(body))[1:] + body)


def _rice_encode(bw: _BitW, resid: list[int], param: int) -> None:
    bw.w(0, 2)        # method 0 (4-bit rice)
    bw.w(0, 4)        # partition order 0
    bw.w(param, 4)
    for r in resid:
        zz = (r << 1) if r >= 0 else ((-r) << 1) - 1
        bw.unary(zz >> param)
        if param:
            bw.w(zz & ((1 << param) - 1), param)


def _frame(samples_per_ch: list[list[int]], bps: int,
           subframe_types: list[tuple], frame_no: int = 0) -> bytes:
    n = len(samples_per_ch[0])
    bw = _BitW()
    bw.w(0x3FFE, 14)
    bw.w(0, 1)        # reserved
    bw.w(0, 1)        # fixed blocksize strategy
    bw.w(7, 4)        # blocksize = 16-bit value - 1 follows
    bw.w(0, 4)        # sample rate from STREAMINFO
    bw.w(len(samples_per_ch) - 1, 4)   # independent channels
    bw.w(4, 3)        # 16 bps code
    bw.w(0, 1)
    assert frame_no < 0x80
    bw.w(frame_no, 8)                  # UTF-8 single byte
    bw.w(n - 1, 16)                    # blocksize value
    bw.w(0, 8)                         # header CRC-8 (unchecked)
    for ch, (stype, *args) in zip(samples_per_ch, subframe_types):
        bw.w(0, 1)                     # subframe sync
        if stype == "constant":
            bw.w(0, 6); bw.w(0, 1)
            bw.w_signed(ch[0], bps)
        elif stype == "verbatim":
            bw.w(1, 6); bw.w(0, 1)
            for s in ch:
                bw.w_signed(s, bps)
        elif stype == "fixed":
            order, param = args
            bw.w(8 + order, 6); bw.w(0, 1)
            for s in ch[:order]:
                bw.w_signed(s, bps)
            coefs = {1: [1], 2: [2, -1]}[order]
            resid = [ch[i] - sum(c * ch[i - j - 1]
                                 for j, c in enumerate(coefs))
                     for i in range(order, n)]
            _rice_encode(bw, resid, param)
        else:
            raise ValueError(stype)
    bw.align()
    bw.w(0, 16)       # frame CRC-16 (unchecked)
    return bw.bytes()


def _mk_flac(samples_per_ch, subframe_types, rate=8000, bps=16):
    total = len(samples_per_ch[0])
    return (b"fLaC"
            + _streaminfo(rate, len(samples_per_ch), bps, total)
            + _frame(samples_per_ch, bps, subframe_types))


def test_flac_verbatim_and_constant_exact():
    rng = np.random.default_rng(3)
    a = rng.integers(-2000, 2000, size=64).tolist()
    b = [123] * 64
    rate, n, x = decode_flac(_mk_flac(
        [a, b], [("verbatim",), ("constant",)]))
    assert (rate, n) == (8000, 64)
    expect = (np.array(a, dtype=np.float64)
              + np.array(b, dtype=np.float64)) / 2.0 / 32768.0
    assert np.array_equal(x, expect)


def test_flac_fixed_predictors_exact():
    # a slow ramp + noise: order-2 prediction leaves small residuals
    rng = np.random.default_rng(5)
    sig = (np.cumsum(rng.integers(-8, 9, size=96))
           + np.arange(96) * 3).astype(int).tolist()
    rate, n, x = decode_flac(_mk_flac(
        [sig], [("fixed", 2, 5)]))
    assert n == 96
    assert np.array_equal(x, np.array(sig, dtype=np.float64) / 32768.0)
    # order-1 too
    _, _, y = decode_flac(_mk_flac([sig], [("fixed", 1, 6)]))
    assert np.array_equal(y, x)


def test_flac_rejects_non_flac():
    with pytest.raises(ValueError):
        decode_flac(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")        # too short


def test_flac_features_route_in_multimodal():
    """The multimodal kernel routes fLaC magic through the same audio
    feature recipe as WAV: identical samples => identical features."""
    import io
    import wave

    from pipelines_rj_sms_spark.operators.multimodal import (
        _real_features)
    rng = np.random.default_rng(11)
    sig = rng.integers(-3000, 3000, size=128).tolist()
    flac = _mk_flac([sig], [("verbatim",)], rate=8000)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(np.array(sig, dtype="<i2").tobytes())
    kind_f, feats_f = _real_features(flac)
    kind_w, feats_w = _real_features(buf.getvalue())
    assert kind_f == kind_w == "audio"
    assert feats_f == feats_w


def _frame_stereo_decorr(left, right, mode: str) -> bytes:
    """Frame with a stereo decorrelation channel assignment; both
    stored subframes VERBATIM. mode: left_side|right_side|mid_side."""
    n = len(left)
    code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]
    side = [a - b for a, b in zip(left, right)]
    if mode == "left_side":
        stored = [(left, 16), (side, 17)]
    elif mode == "right_side":
        stored = [(side, 17), (right, 16)]
    else:
        mid = [(a + b) >> 1 for a, b in zip(left, right)]
        stored = [(mid, 16), (side, 17)]
    bw = _BitW()
    bw.w(0x3FFE, 14)
    bw.w(0, 1); bw.w(0, 1)
    bw.w(7, 4)          # 16-bit blocksize follows
    bw.w(0, 4)          # rate from STREAMINFO
    bw.w(code, 4)
    bw.w(4, 3)          # 16 bps
    bw.w(0, 1)
    bw.w(0, 8)          # frame number
    bw.w(n - 1, 16)
    bw.w(0, 8)          # CRC-8
    for ch, bps in stored:
        bw.w(0, 1)
        bw.w(1, 6); bw.w(0, 1)   # VERBATIM
        for s in ch:
            bw.w_signed(s, bps)
    bw.align()
    bw.w(0, 16)
    return bw.bytes()


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_flac_stereo_decorrelation_exact(mode):
    rng = np.random.default_rng(17)
    left = rng.integers(-5000, 5000, size=48).tolist()
    right = rng.integers(-5000, 5000, size=48).tolist()
    data = (b"fLaC" + _streaminfo(8000, 2, 16, 48)
            + _frame_stereo_decorr(left, right, mode))
    rate, n, x = decode_flac(data)
    expect = (np.array(left, dtype=np.float64)
              + np.array(right, dtype=np.float64)) / 2.0 / 32768.0
    assert n == 48
    assert np.array_equal(x, expect), mode


def test_flac_lpc_subframe_exact():
    """LPC subframe: order-2, precision 4, shift 1 — residuals built
    with the decoder's own prediction formula, so recovery is exact."""
    rng = np.random.default_rng(23)
    sig = (np.cumsum(rng.integers(-30, 31, size=80)) + 500).astype(int)
    sig = sig.tolist()
    order, precision, shift = 2, 4, 1
    coefs = [3, -1]          # pred = (3*prev - prev2) >> 1
    resid = [sig[i] - ((coefs[0] * sig[i - 1]
                        + coefs[1] * sig[i - 2]) >> shift)
             for i in range(order, len(sig))]
    n = len(sig)
    bw = _BitW()
    bw.w(0x3FFE, 14); bw.w(0, 1); bw.w(0, 1)
    bw.w(7, 4); bw.w(0, 4); bw.w(0, 4); bw.w(4, 3); bw.w(0, 1)
    bw.w(0, 8); bw.w(n - 1, 16); bw.w(0, 8)
    bw.w(0, 1)
    bw.w(32 + order - 1, 6)   # LPC subframe type = 0b100000 | order-1
    bw.w(0, 1)
    for s in sig[:order]:
        bw.w_signed(s, 16)
    bw.w(precision - 1, 4)
    bw.w_signed(shift, 5)
    for c in coefs:
        bw.w_signed(c, precision)
    _rice_encode(bw, resid, 6)
    bw.align(); bw.w(0, 16)
    data = b"fLaC" + _streaminfo(8000, 1, 16, n) + bw.bytes()
    rate, got_n, x = decode_flac(data)
    assert got_n == n
    assert np.array_equal(x, np.array(sig, dtype=np.float64) / 32768.0)
