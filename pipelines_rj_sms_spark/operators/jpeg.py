"""Pure-Python baseline JPEG decoder (ITU-T T.81 sequential DCT).

Fills the jpeg slot in `operators/multimodal._real_features` without
native dependencies: marker parse (DQT/DHT/SOF0/DRI/SOS), Huffman
entropy decode (DC diff + AC run/size with EOB/ZRL), dequantize,
zigzag, numpy IDCT (orthonormal DCT-III as a matrix product),
chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0, and the BT.601
YCbCr→RGB transform from the JFIF spec. Restart markers honored.

Scope is BASELINE ONLY — SOF0, 8-bit, Huffman. Progressive (SOF2),
arithmetic coding, and 12-bit inputs raise NotImplementedError at the
same slot a full codec would plug into. That matches the tier the
module header of `multimodal.py` promises: a real decoder for the
common case, honest gates elsewhere.

All tables and constants below (zigzag order, marker codes, the
YCbCr matrix) are public format-specification values, identical in
every implementation.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index in the 64-coefficient stream -> (row, col)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal 8-point DCT-III basis; IDCT(block) = C.T @ block @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-stuffing removal; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None:
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: recorded, consumed by reset()
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return out

    def reset_at_restart(self) -> None:
        """Byte-align and consume the pending RSTn marker."""
        self.nbits = 0
        self.acc = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


def _build_huffman(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman per T.81 annex C: (length, code) -> symbol."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lut[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _decode_symbol(br: _BitReader, lut: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension of a t-bit magnitude value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(content: bytes):
    """Decode a baseline JPEG; returns (width, height, HxWx3 uint8 RGB).

    Raises ValueError on non-JPEG bytes, NotImplementedError on
    progressive/arithmetic/12-bit streams.
    """
    if content is None or len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    pos = 2
    data = content
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:       # EOI
            break
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2: pos + seg_len]
        if marker == 0xDB:       # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64)
                for j in range(64):
                    tbl[ZIGZAG[j] // 8 * 8 + ZIGZAG[j] % 8] = \
                        seg[i + 1 + j]
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:     # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1: i + 17])
                n = sum(counts)
                syms = seg[i + 17: i + 17 + n]
                huff[(tc, th)] = _build_huffman(counts, syms)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci: 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended JPEG (non-SOF0) needs a full "
                "codec — plug it into this slot")
        elif marker == 0xDD:     # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:     # SOS — entropy-coded data follows
            ns = seg[0]
            scan = {}
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si: 3 + 2 * si]
                scan[cs] = (tdta >> 4, tdta & 0xF)
            if frame is None:
                raise ValueError("SOS before SOF")
            # clean gates instead of raw KeyErrors mid-decode: every
            # frame component must appear in this scan (a scan subset
            # = non-interleaved multi-scan baseline, which this
            # single-scan decoder doesn't implement), and every
            # referenced Huffman/quant table must have been defined
            for c in frame["comps"]:
                if c["id"] not in scan:
                    raise NotImplementedError(
                        "non-interleaved scan (component "
                        f"{c['id']} absent from SOS)")
                td, ta = scan[c["id"]]
                if (0, td) not in huff or (1, ta) not in huff:
                    raise ValueError(
                        f"SOS references undefined Huffman table "
                        f"(dc={td}, ac={ta})")
                if c["tq"] not in qt:
                    raise ValueError(
                        f"frame references undefined quant table "
                        f"{c['tq']}")
            return _decode_scan(data, pos + seg_len, frame, scan, qt,
                                huff, restart_interval)
        pos += seg_len
    raise ValueError("no scan data in JPEG")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                br.reset_at_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_lut = huff[(0, scan[c["id"]][0])]
                ac_lut = huff[(1, scan[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64)
                        t = _decode_symbol(br, dc_lut)
                        diff = _extend(br.bits(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, ac_lut)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:   # ZRL
                                    k += 16
                                    continue
                                break         # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coeffs[k] = _extend(br.bits(s), s)
                            k += 1
                        block = np.zeros((8, 8))
                        for j in range(64):
                            block[ZIGZAG[j] // 8, ZIGZAG[j] % 8] = \
                                coeffs[j]
                        block *= q
                        px = _C.T @ block @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample chroma to full resolution and crop to (h, w)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255)
        rgb = np.stack([y, y, y], axis=2).astype(np.uint8)
        return w, h, rgb
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    # JFIF / BT.601 inverse transform (public constants)
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                  255).astype(np.uint8)
    return w, h, rgb


# --------------------------------------------------------------------
# PNG — kept in this module as the second pure-Python image codec
# (shared consumer: multimodal._real_features). The hard half of PNG
# (DEFLATE) is stdlib zlib; what's implemented here is the container
# and pixel reconstruction: chunk walk + IHDR parse, IDAT concat +
# inflate, per-scanline unfiltering (None/Sub/Up/Average/Paeth — the
# five public filter types of RFC 2083), and layout to HxWx3 RGB.
# Supported: 8-bit gray (0), RGB (2), palette (3, via PLTE), gray+
# alpha (4) and RGBA (6) — alpha dropped, non-8-bit depths and
# interlacing honestly gated.
# --------------------------------------------------------------------

def decode_png(content: bytes):
    """Decode a PNG; returns (width, height, HxWx3 uint8 RGB)."""
    import zlib

    if content is None or len(content) < 8 \
            or content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(content):
        (clen,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4: pos + 8]
        data = content[pos + 8: pos + 8 + clen]
        pos += 12 + clen   # len + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth}")
            if interlace != 0:
                raise NotImplementedError("interlaced (Adam7) PNG")
            if color not in (0, 2, 3, 4, 6):
                raise ValueError(f"PNG color type {color}")
            ihdr = (w, h, color)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8) \
                .reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, color = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    # unfilter scanlines (RFC 2083 §6); prior = reconstructed row above
    out = np.zeros((h, stride), dtype=np.uint8)
    fp = nch   # filter unit = bytes per pixel at 8-bit depth
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=off + 1).copy()
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            rec = line
        elif ftype == 1:      # Sub
            rec = line
            for i in range(fp, stride):
                rec[i] = (int(rec[i]) + int(rec[i - fp])) & 0xFF
        elif ftype == 2:      # Up
            rec = (line.astype(np.int16) + prior) % 256
            rec = rec.astype(np.uint8)
        elif ftype == 3:      # Average
            rec = line
            for i in range(stride):
                left = int(rec[i - fp]) if i >= fp else 0
                rec[i] = (int(rec[i])
                          + ((left + int(prior[i])) >> 1)) & 0xFF
        elif ftype == 4:      # Paeth
            rec = line
            for i in range(stride):
                a = int(rec[i - fp]) if i >= fp else 0
                b = int(prior[i])
                c = int(prior[i - fp]) if i >= fp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                rec[i] = (int(rec[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = rec
    px = out.reshape(h, w, nch)
    if color == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif color == 2:
        rgb = px
    elif color == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = palette[px[:, :, 0]]
    elif color == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:  # 6: RGBA
        rgb = px[:, :, :3]
    return w, h, np.ascontiguousarray(rgb)
