"""PKWare DCL "implode" decompression, pure Python — the codec inside
DATASUS ``.dbc`` files (reference consumes them via pyreaddbc:
datalake/utils/data_transformations.py:121-125; here the format itself
is implemented so the reader has no native dependency).

The DCL format is public: a 2-byte header (literal coding mode, log2
dictionary size), then an LSB-first bitstream of flagged items — flag 0
a literal (raw 8 bits or Huffman-coded), flag 1 a length/distance copy
with fixed Huffman tables for lengths and distance high-bits; length
519 terminates. The three fixed code tables below are the format's
specification data (identical in every implementation, e.g. zlib's
contrib "blast"); ``_Huffman`` checks each expands to a COMPLETE
canonical code over the right symbol count, so a transcription error
cannot decode silently.

``.dbc`` container layout: the first ``H`` bytes (H = little-endian
uint16 at offset 8, i.e. the dBase header length) are the plain DBF
header, followed by a 4-byte CRC32, followed by the DCL-imploded
record section. ``dbc_to_dbf_bytes`` reassembles the plain DBF.

Scale posture: DBC files arrive via FTP at single-digit-MB scale
(fetch stage), so decoding is per-file driver/executor-local Python —
the distributed part is the downstream DBF parse (read_dbf's
binaryFile + mapInPandas).
"""

from __future__ import annotations

import struct

__all__ = ["explode", "implode_literal", "dbc_to_dbf_bytes"]

_MAXBITS = 13

# Fixed code tables, compact form: low nibble = code length, high
# nibble = repeat count - 1 (format spec data).
_LITLEN = [
    11, 124, 8, 7, 28, 7, 188, 13, 76, 4, 10, 8, 12, 10, 12, 10, 8, 23,
    8, 9, 7, 6, 7, 8, 7, 6, 55, 8, 23, 24, 12, 11, 7, 9, 11, 12, 6, 7,
    22, 5, 7, 24, 6, 11, 9, 6, 7, 22, 7, 11, 38, 7, 9, 8, 25, 11, 8,
    11, 9, 12, 8, 12, 5, 38, 5, 38, 5, 11, 7, 5, 6, 21, 6, 10, 53, 8,
    7, 24, 10, 27, 44, 253, 253, 253, 252, 252, 252, 13, 12, 45, 12,
    45, 12, 61, 12, 45, 44, 173,
]
_LENLEN = [2, 35, 36, 53, 38, 23]
_DISTLEN = [2, 20, 53, 230, 247, 151, 248]
_LENBASE = [3, 2, 4, 5, 6, 7, 8, 9, 10, 12, 16, 24, 40, 72, 136, 264]
_LENEXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8]
_END_LEN = 519  # length symbol 15 + all-ones extra terminates


def _expand(compact: list[int]) -> list[int]:
    out: list[int] = []
    for b in compact:
        out.extend([b & 15] * ((b >> 4) + 1))
    return out


class _Huffman:
    """Canonical Huffman decode tables (count-per-length + symbols in
    canonical order), built from a code-length list."""

    def __init__(self, lengths: list[int]):
        self.nsyms = len(lengths)
        self.count = [0] * (_MAXBITS + 1)
        for ln in lengths:
            self.count[ln] += 1
        left = 1  # completeness check: one codespace unit
        for ln in range(1, _MAXBITS + 1):
            left <<= 1
            left -= self.count[ln]
            if left < 0:
                raise ValueError("over-subscribed code table")
        if left != 0:
            raise ValueError("incomplete code table")
        offs = [0] * (_MAXBITS + 2)
        for ln in range(1, _MAXBITS + 1):
            offs[ln + 1] = offs[ln] + self.count[ln]
        self.symbol = [0] * self.nsyms
        for sym, ln in enumerate(lengths):
            if ln:
                self.symbol[offs[ln]] = sym
                offs[ln] += 1


_LIT_H = _Huffman(_expand(_LITLEN))
_LEN_H = _Huffman(_expand(_LENLEN))
_DIST_H = _Huffman(_expand(_DISTLEN))
assert _LIT_H.nsyms == 256 and _LEN_H.nsyms == 16 and _DIST_H.nsyms == 64


class _BitReader:
    """LSB-first bit reader over the compressed byte stream."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.bitcnt = 0

    def bits(self, need: int) -> int:
        val = self.bitbuf
        while self.bitcnt < need:
            if self.pos >= len(self.data):
                raise ValueError("truncated DCL stream")
            val |= self.data[self.pos] << self.bitcnt
            self.pos += 1
            self.bitcnt += 8
        self.bitbuf = val >> need
        self.bitcnt -= need
        return val & ((1 << need) - 1)

    def decode(self, h: _Huffman) -> int:
        """Decode one symbol: DCL stores Huffman code bits INVERTED and
        MSB-of-code-first relative to the LSB-first bit order."""
        code = first = index = 0
        for ln in range(1, _MAXBITS + 1):
            code |= self.bits(1) ^ 1
            count = h.count[ln]
            if code - first < count:
                return h.symbol[index + (code - first)]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise ValueError("invalid Huffman code in DCL stream")


def explode(data: bytes, max_out: int | None = None) -> bytes:
    """Decompress a complete PKWare DCL stream. ``max_out`` optionally
    caps the output (corruption guard)."""
    br = _BitReader(data)
    lit = br.bits(8)
    if lit > 1:
        raise ValueError(f"bad DCL literal mode {lit}")
    dict_bits = br.bits(8)
    if not 4 <= dict_bits <= 6:
        raise ValueError(f"bad DCL dictionary size {dict_bits}")
    out = bytearray()
    while True:
        if br.bits(1):
            sym = br.decode(_LEN_H)
            length = _LENBASE[sym] + br.bits(_LENEXTRA[sym])
            if length == _END_LEN:
                break
            low = 2 if length == 2 else dict_bits
            dist = (br.decode(_DIST_H) << low) + br.bits(low) + 1
            if dist > len(out):
                raise ValueError("DCL distance before start of output")
            for _ in range(length):  # overlapped copy, byte-at-a-time
                out.append(out[-dist])
        else:
            out.append(br.decode(_LIT_H) if lit else br.bits(8))
        if max_out is not None and len(out) > max_out:
            raise ValueError("DCL output exceeds declared size")
    return bytes(out)


def _canonical_codes(h: _Huffman, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code value, length) in the decoder's convention."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    index = 0
    first = 0
    for ln in range(1, _MAXBITS + 1):
        for i in range(h.count[ln]):
            codes[h.symbol[index + i]] = (first + i, ln)
        index += h.count[ln]
        first = (first + h.count[ln]) << 1
    del code
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bitbuf = 0
        self.bitcnt = 0

    def put(self, val: int, n: int) -> None:  # LSB-first
        self.bitbuf |= (val & ((1 << n) - 1)) << self.bitcnt
        self.bitcnt += n
        while self.bitcnt >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.bitcnt -= 8

    def put_code(self, code: int, ln: int) -> None:
        # decoder reads MSB-of-code-first, each bit inverted
        for i in range(ln - 1, -1, -1):
            self.put(((code >> i) & 1) ^ 1, 1)

    def finish(self) -> bytes:
        if self.bitcnt:
            self.out.append(self.bitbuf & 0xFF)
        return bytes(self.out)


def implode_literal(data: bytes, dict_bits: int = 4) -> bytes:
    """Produce a VALID (if non-compressing) DCL stream: uncoded
    literals only, terminated with the end-of-stream length code.
    Exists so round-trip tests and fixture generation need no external
    compressor; real archives decode through the same `explode`."""
    w = _BitWriter()
    w.put(0, 8)           # uncoded literals
    w.put(dict_bits, 8)
    for b in data:
        w.put(0, 1)       # literal flag
        w.put(b, 8)
    lcodes = _canonical_codes(_LEN_H, _expand(_LENLEN))
    w.put(1, 1)           # length/distance flag
    code, ln = lcodes[15]  # base 264 + 8 extra bits of 255 = 519
    w.put_code(code, ln)
    w.put(0xFF, 8)
    return w.finish()


def dbc_to_dbf_bytes(dbc: bytes) -> bytes:
    """Reassemble the plain DBF from a DATASUS ``.dbc``: copy the
    uncompressed dBase header, skip the 4-byte CRC field (every known
    consumer skips it unverified — interpretations differ between
    producers, and a decode error surfaces as a malformed DBF anyway),
    explode the record section."""
    if len(dbc) < 12:
        raise ValueError("truncated DBC file")
    header_len = struct.unpack_from("<H", dbc, 8)[0]
    if header_len < 32 or header_len + 4 > len(dbc):
        raise ValueError(f"bad DBC header length {header_len}")
    header = dbc[:header_len]
    body = explode(dbc[header_len + 4:])
    return header + body
