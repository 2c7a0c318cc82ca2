"""Baseline JPEG decoder (operators/jpeg.py).

The fixture generator below is a MINIMAL baseline-JPEG writer living
only in the test: grayscale, 8x8-block-aligned images whose blocks are
uniform, so every block is DC-only and — with an all-ones quant table
and DC values that are multiples of 8 — the DCT round-trip is EXACT
(pixel = DC/8 + 128 under the orthonormal IDCT). That gives the
decoder a bit-exact expectation without any native codec, and lets the
feature-parity test demand strict equality with the BMP path.
"""

import struct

import numpy as np
import pytest

from pipelines_rj_sms_spark.operators.jpeg import decode_jpeg


def _huff_spec_dc():
    # 12 DC categories, all at code length 4 (canonical, fits in 16)
    counts = [0, 0, 0, 12] + [0] * 12
    symbols = bytes(range(12))
    return counts, symbols


def _huff_spec_ac():
    # single AC symbol: 0x00 = EOB, length 2
    counts = [0, 1] + [0] * 14
    symbols = bytes([0x00])
    return counts, symbols


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= (8 - self.n)
            self.acc |= (1 << (8 - self.n)) - 1   # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _canonical_codes(counts):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[k] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def encode_gray_jpeg(pixels: np.ndarray) -> bytes:
    """Encode an 8x8-block-aligned grayscale image whose blocks are
    uniform, DC-only, quant all-ones. Exact when (pixel-128)*8 is
    integral."""
    h, w = pixels.shape
    assert h % 8 == 0 and w % 8 == 0
    dc_counts, dc_syms = _huff_spec_dc()
    ac_counts, ac_syms = _huff_spec_ac()
    dc_codes = _canonical_codes(dc_counts)
    ac_codes = _canonical_codes(ac_counts)
    bw = _BitWriter()
    pred = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = pixels[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            assert (block == block[0, 0]).all(), "fixture: uniform blocks"
            dc = int(round((float(block[0, 0]) - 128.0) * 8.0))
            diff = dc - pred
            pred = dc
            t = diff.bit_length() if diff != 0 else 0
            length, code = dc_codes[t]
            bw.write(code, length)
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                bw.write(v, t)
            el, ec = ac_codes[0]   # EOB
            bw.write(ec, el)
    body = bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
              + bytes([1, 1, 0x11, 0]))
    dht = (seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
           + seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + body + b"\xff\xd9")


def _fixture_pixels():
    px = np.zeros((16, 16), dtype=np.uint8)
    for (by, bx), v in zip([(0, 0), (0, 1), (1, 0), (1, 1)],
                           [128, 130, 100, 200]):
        px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = v
    return px


def test_decode_jpeg_exact_pixels():
    px = _fixture_pixels()
    jpg = encode_gray_jpeg(px)
    w, h, rgb = decode_jpeg(jpg)
    assert (w, h) == (16, 16)
    assert rgb.shape == (16, 16, 3)
    for c in range(3):
        assert (rgb[:, :, c] == px).all()


def test_decode_jpeg_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"BMnot-a-jpeg")
    # flip SOF0 -> SOF2 (progressive): honest gate, not silent garbage
    jpg = bytearray(encode_gray_jpeg(_fixture_pixels()))
    i = jpg.index(bytes([0xFF, 0xC0]))
    jpg[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(jpg))


def test_jpeg_features_match_bmp_path_exactly():
    """The done-criterion: the SAME pixels through the JPEG fixture
    and through encode_bmp produce the SAME feature vector."""
    from pipelines_rj_sms_spark.operators.multimodal import (
        _real_features, encode_bmp)
    px = _fixture_pixels()
    rgb = np.stack([px, px, px], axis=2)
    kind_j, feats_j = _real_features(encode_gray_jpeg(px))
    kind_b, feats_b = _real_features(encode_bmp(rgb))
    assert kind_j == kind_b == "image"
    assert feats_j == feats_b


def test_decode_jpeg_restart_markers():
    """DRI/RSTn handling: re-encode the fixture with a restart after
    every MCU and verify identical pixels."""
    px = _fixture_pixels()
    base = encode_gray_jpeg(px)
    # rebuild with DRI=1 and RST markers between MCUs: re-encode
    # manually — each MCU's entropy data restarts byte-aligned with a
    # fresh DC predictor
    dc_counts, dc_syms = _huff_spec_dc()
    ac_counts, ac_syms = _huff_spec_ac()
    dc_codes = _canonical_codes(dc_counts)
    ac_codes = _canonical_codes(ac_counts)
    chunks = []
    for (by, bx) in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        bw = _BitWriter()
        dc = int(round((float(px[by * 8, bx * 8]) - 128.0) * 8.0))
        t = dc.bit_length() if dc != 0 else 0
        length, code = dc_codes[t]
        bw.write(code, length)
        if t:
            v = dc if dc >= 0 else dc + (1 << t) - 1
            bw.write(v, t)
        el, ec = ac_codes[0]
        bw.write(ec, el)
        chunks.append(bw.flush())
    body = b""
    for i, ch in enumerate(chunks):
        body += ch
        if i < len(chunks) - 1:
            body += bytes([0xFF, 0xD0 + (i % 8)])

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    jpg = (b"\xff\xd8"
           + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
           + seg(0xC0, bytes([8]) + struct.pack(">HH", 16, 16)
                 + bytes([1, 1, 0x11, 0]))
           + seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
           + seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)
           + seg(0xDD, struct.pack(">H", 1))
           + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
           + body + b"\xff\xd9")
    w, h, rgb = decode_jpeg(jpg)
    for c in range(3):
        assert (rgb[:, :, c] == px).all()
    # sanity: the non-restart encoding agrees
    _, _, rgb2 = decode_jpeg(base)
    assert (rgb2 == rgb).all()


def test_decode_jpeg_color_444():
    """3-component 4:4:4 interleave: per-component Huffman selection
    and DC predictors, plus the BT.601 inverse transform checked
    against an independent per-pixel computation."""
    blocks = [(160, 128, 128), (128, 136, 120),
              (100, 120, 140), (200, 128, 136)]  # (Y, Cb, Cr)
    dc_counts, dc_syms = _huff_spec_dc()
    ac_counts, ac_syms = _huff_spec_ac()
    dc_codes = _canonical_codes(dc_counts)
    ac_codes = _canonical_codes(ac_counts)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for (yv, cb, cr) in blocks:
        for ci, val in enumerate((yv, cb, cr)):
            dc = int(round((float(val) - 128.0) * 8.0))
            diff = dc - pred[ci]
            pred[ci] = dc
            t = diff.bit_length() if diff != 0 else 0
            length, code = dc_codes[t]
            bw.write(code, length)
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                bw.write(v, t)
            el, ec = ac_codes[0]
            bw.write(ec, el)
    body = bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    jpg = (b"\xff\xd8"
           + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
           + seg(0xC0, bytes([8]) + struct.pack(">HH", 16, 16)
                 + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
           + seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
           + seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)
           + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
           + body + b"\xff\xd9")
    w, h, rgb = decode_jpeg(jpg)
    assert (w, h) == (16, 16)
    for (by, bx), (yv, cb, cr) in zip(
            [(0, 0), (0, 1), (1, 0), (1, 1)], blocks):
        cbp, crp = cb - 128.0, cr - 128.0
        exp = np.clip(np.round([yv + 1.402 * crp,
                                yv - 0.344136 * cbp - 0.714136 * crp,
                                yv + 1.772 * cbp]), 0, 255)
        got = rgb[by * 8 + 3, bx * 8 + 3]
        assert (got == exp.astype(np.uint8)).all(), (got, exp)


# ---------------------------------------------------------------- PNG

def encode_png(rgb: np.ndarray, color: int = 2,
               filters=None) -> bytes:
    """Minimal PNG writer for fixtures (stdlib zlib; filter per row).
    color=2 RGB, color=0 grayscale (rgb[:, :, 0] used), color=6 RGBA
    (alpha=255)."""
    import zlib

    h, w = rgb.shape[:2]
    if color == 0:
        plane = rgb[:, :, 0:1]
    elif color == 2:
        plane = rgb
    else:
        plane = np.concatenate(
            [rgb, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2)
    nch = plane.shape[2]
    fp = nch
    filters = filters or [0] * h
    raw = bytearray()
    prior = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        line = plane[y].reshape(-1)
        f = filters[y]
        raw.append(f)
        if f == 0:
            enc = line
        elif f == 1:   # Sub
            enc = line.astype(np.int16).copy()
            enc[fp:] -= line[:-fp]
            enc = (enc % 256).astype(np.uint8)
        elif f == 2:   # Up
            enc = ((line.astype(np.int16) - prior) % 256).astype(np.uint8)
        elif f == 3:   # Average
            enc = np.zeros_like(line)
            for i in range(len(line)):
                left = int(line[i - fp]) if i >= fp else 0
                enc[i] = (int(line[i])
                          - ((left + int(prior[i])) >> 1)) & 0xFF
        elif f == 4:   # Paeth
            enc = np.zeros_like(line)
            for i in range(len(line)):
                a = int(line[i - fp]) if i >= fp else 0
                b = int(prior[i])
                c = int(prior[i - fp]) if i >= fp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                enc[i] = (int(line[i]) - pred) & 0xFF
        else:
            raise ValueError(f)
        raw += enc.tobytes()
        prior = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import zlib as _z
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", _z.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _png_pixels():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)


def test_decode_png_all_filters_exact():
    from pipelines_rj_sms_spark.operators.jpeg import decode_png
    px = _png_pixels()
    # exercise all five filter types across rows
    filters = [(0, 1, 2, 3, 4)[y % 5] for y in range(px.shape[0])]
    w, h, rgb = decode_png(encode_png(px, filters=filters))
    assert (w, h) == (9, 13)
    assert (rgb == px).all()


def test_decode_png_gray_and_rgba():
    from pipelines_rj_sms_spark.operators.jpeg import decode_png
    px = _png_pixels()
    gray = px.copy()
    gray[:, :, 1] = gray[:, :, 0]
    gray[:, :, 2] = gray[:, :, 0]
    _, _, g = decode_png(encode_png(gray, color=0))
    assert (g == gray).all()
    _, _, a = decode_png(encode_png(px, color=6))
    assert (a == px).all()


def test_png_features_match_bmp_path_exactly():
    from pipelines_rj_sms_spark.operators.multimodal import (
        _real_features, encode_bmp)
    px = _png_pixels()
    kind_p, feats_p = _real_features(encode_png(px))
    kind_b, feats_b = _real_features(encode_bmp(px))
    assert kind_p == kind_b == "image"
    assert feats_p == feats_b
