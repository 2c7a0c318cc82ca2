"""PKWare DCL (implode) codec + DBC container tests."""

import random
import struct

import pytest

from pipelines_rj_sms_spark.sources.pkdcl import (
    _BitWriter, _DIST_H, _DISTLEN, _LEN_H, _LENLEN, _canonical_codes,
    _expand, dbc_to_dbf_bytes, explode, implode_literal)


def test_fixed_tables_are_complete_codes():
    """The spec tables must expand to complete canonical codes over
    exactly 256 literals, 16 lengths, 64 distances — _Huffman raises
    otherwise, so constructing at import already proved it; assert the
    symbol counts here for the record."""
    assert len(_expand(_LENLEN)) == 16
    assert len(_expand(_DISTLEN)) == 64


def test_literal_roundtrip_random_bytes():
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(4096))
    assert explode(implode_literal(data)) == data
    assert explode(implode_literal(b"")) == b""


def _match_stream(literals: bytes, length: int, dist: int,
                  dict_bits: int = 4) -> bytes:
    """Hand-built DCL stream: literals, one length/distance copy, end."""
    from pipelines_rj_sms_spark.sources.pkdcl import (
        _LENBASE, _LENEXTRA)
    w = _BitWriter()
    w.put(0, 8)
    w.put(dict_bits, 8)
    for b in literals:
        w.put(0, 1)
        w.put(b, 8)
    lcodes = _canonical_codes(_LEN_H, _expand(_LENLEN))
    dcodes = _canonical_codes(_DIST_H, _expand(_DISTLEN))
    # length symbol with base <= length and extra covering the delta
    sym = max(i for i, b in enumerate(_LENBASE)
              if b <= length and length - b < (1 << _LENEXTRA[i]))
    w.put(1, 1)
    w.put_code(*lcodes[sym])
    w.put(length - _LENBASE[sym], _LENEXTRA[sym])
    low = 2 if length == 2 else dict_bits
    d = dist - 1
    w.put_code(*dcodes[d >> low])
    w.put(d & ((1 << low) - 1), low)
    # end-of-stream
    w.put(1, 1)
    w.put_code(*lcodes[15])
    w.put(0xFF, 8)
    return w.finish()


def test_match_copy():
    assert explode(_match_stream(b"abc", 3, 3)) == b"abcabc"


def test_overlapped_copy_rle():
    # distance 1, length 7: classic RLE through the window
    assert explode(_match_stream(b"x", 7, 1)) == b"x" * 8


def test_length_two_uses_two_low_bits():
    assert explode(_match_stream(b"ab", 2, 2)) == b"abab"


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):
        explode(b"\x07\x04\x00")          # bad literal mode
    with pytest.raises(ValueError):
        explode(b"\x00\x09\x00")          # bad dict size
    with pytest.raises(ValueError):
        explode(implode_literal(b"abc")[:-2])  # truncated
    with pytest.raises(ValueError):
        explode(_match_stream(b"", 3, 5))  # distance before start


def test_dbc_container_roundtrip(tmp_path):
    from tests.test_listing_formats_resthub import _write_dbf
    fields = [("CNES", 7), ("NOME", 10)]
    _write_dbf(tmp_path / "f.dbf", fields,
               [["1234567", "POSTO A"], ["7654321", "POSTO B"]])
    dbf = (tmp_path / "f.dbf").read_bytes()
    hlen = struct.unpack_from("<H", dbf, 8)[0]
    dbc = dbf[:hlen] + b"\x00\x00\x00\x00" + implode_literal(dbf[hlen:])
    assert dbc_to_dbf_bytes(dbc) == dbf
