"""Vendored pure-Python LZ4 block codec (functions/lz4block.py).

Validation strategy, since the native lib may be absent: hand-built
golden vectors from the PUBLIC block-format spec pin the DECODER
independently of our compressor; the pinned decoder then validates the
COMPRESSOR via round-trips (including a hypothesis sweep); when the
native lz4 package IS installed, both directions are additionally
cross-checked against it (see also test_sinks.test_lz4_codec_profiles'
in-situ checks)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dwp_hbase_to_mongo_export_spark.functions.lz4block import (
    compress_block,
    decompress_block,
)

try:
    import lz4.block as native_lz4  # type: ignore

    HAVE_NATIVE = True
except ImportError:
    HAVE_NATIVE = False


def test_decoder_golden_literal_plus_match():
    """Hand-assembled from the spec: token 0x48 = 4 literals + match
    length 8+4; literals 'abcd'; offset 4 (little-endian) copies the
    literals three more times; final literals-only sequence 'XYZZZ'."""
    golden = bytes([0x48]) + b"abcd" + bytes([0x04, 0x00]) + bytes([0x50]) + b"XYZZZ"
    assert decompress_block(golden) == b"abcd" * 4 + b"XYZZZ"


def test_decoder_golden_overlapping_rle_match():
    """Offset 1 with length 29 is the RLE idiom — the match overlaps
    its own output, so a naive slice copy would corrupt it. Match
    length 29 = 15 (token) + 4 (base) + 10 (continuation byte)."""
    golden = (
        bytes([0x1F]) + b"A" + bytes([0x01, 0x00]) + bytes([10])
        + bytes([0x50]) + b"BCDEF"
    )
    assert decompress_block(golden) == b"A" * 30 + b"BCDEF"


def test_decoder_golden_length_continuation_saturation():
    """A 270-byte literal run encodes as 15 (token) + 255 + 0 — the
    saturated continuation-byte chain."""
    golden = bytes([0xF0, 255, 0]) + b"x" * 270
    assert decompress_block(golden) == b"x" * 270


def test_decoder_rejects_corruption():
    with pytest.raises(ValueError):  # zero offset
        decompress_block(bytes([0x10]) + b"a" + bytes([0x00, 0x00]))
    with pytest.raises(ValueError):  # offset before block start
        decompress_block(bytes([0x10]) + b"a" + bytes([0x05, 0x00]))
    with pytest.raises(ValueError):  # literal run past input end
        decompress_block(bytes([0xF0, 255, 0]) + b"x" * 10)
    with pytest.raises(ValueError):  # declared size mismatch
        decompress_block(bytes([0x20]) + b"ab", uncompressed_size=99)
    # truncation mid-sequence is ValueError, never a bare IndexError
    with pytest.raises(ValueError):  # cut inside the 2-byte offset
        decompress_block(bytes([0x14]) + b"a" + bytes([0x04]))
    with pytest.raises(ValueError):  # cut inside a length continuation
        decompress_block(bytes([0xF0, 255]))
    with pytest.raises(ValueError):  # empty-input token read
        decompress_block(bytes([0x14]) + b"a" + bytes([0x04, 0x00, 255]))


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"x",
        b"short<13",
        b"abcd" * 100,                      # match-heavy
        b"A" * 5000,                        # RLE / overlapping matches
        bytes(range(256)) * 2,              # matches at offset 256
        b"{\"id\":1}\n" * 400,              # line-JSON, the sink's shape
        bytes([7]) * 14,                    # just over the MFLIMIT edge
    ],
)
def test_roundtrip(data):
    comp = compress_block(data)
    assert decompress_block(comp, uncompressed_size=len(data)) == data
    # store_size=False framing: no little-endian size prefix
    assert comp[:4] != struct.pack("<I", len(data)) or len(data) == 0
    if HAVE_NATIVE:
        assert native_lz4.decompress(comp, uncompressed_size=max(len(data), 1)) == data
        assert (
            decompress_block(
                native_lz4.compress(data, store_size=False),
                uncompressed_size=len(data),
            )
            == data
        )


def test_compression_actually_compresses():
    data = b"{\"db\":\"database\",\"collection\":\"collection\"}\n" * 1000
    comp = compress_block(data)
    assert len(comp) < len(data) // 5


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=4096))
def test_roundtrip_hypothesis(data):
    assert decompress_block(compress_block(data), uncompressed_size=len(data)) == data
