"""Pure-Python LZ4 *block* codec (the raw block format, no frame).

Why this exists: the snapshot sink's ``lz4_block`` profile mirrors the
reference's BlockLZ4CompressorOutputStream byte format (reference:
src/main/kotlin/app/configuration/ContextConfiguration.kt:31-38) —
a raw LZ4 block stream with NO size prefix and NO frame header. The
native ``lz4`` package is an optional extra; without this module the
profile could never execute (or be byte-verified) in environments
lacking it. This implements the PUBLIC LZ4 block format specification
(lz4.github.io/lz4/lz4_Block_format.md) from scratch:

  sequence := token (hi nibble literal-length, lo nibble match-length-4)
              [length continuation bytes of 255 while saturated]
              literals
              2-byte little-endian match offset (1..65535)
              [match length continuation]
  The block ends with a literals-only sequence; the last 5 bytes are
  always literals and no match may start within the last 12 bytes.

The compressor is a greedy hash-table match finder — format-identical
to (not byte-identical with) native implementations; any compliant LZ4
block decoder (including the reference's commons-compress one) decodes
its output. Pure Python is ~3 orders slower than the native codec, so
the sink uses it only as a fallback when ``lz4`` is absent; a real
deployment installs the native package (requirements-extras.txt) and
never runs this path. Raw blocks are not self-describing: callers pass
the uncompressed size out-of-band (the sink records it per-file as
batch_size_bytes).
"""

from __future__ import annotations

_MINMATCH = 4
# Spec end-conditions: the last match must start >= 12 bytes before the
# block end, and the last 5 bytes are always literals.
_MFLIMIT = 12
_LASTLITERALS = 5
_MAX_OFFSET = 65535


def decompress_block(data: bytes, uncompressed_size: int | None = None) -> bytes:
    """Decode one raw LZ4 block. ``uncompressed_size``, when given, is
    validated against the decoded length (raw blocks don't store it).
    Every malformed input — including truncation mid-sequence — raises
    ValueError."""
    try:
        return _decompress_block(data, uncompressed_size)
    except IndexError:
        # a length-continuation or offset read ran past the input end
        raise ValueError("corrupt LZ4 block: truncated input") from None


def _decompress_block(data: bytes, uncompressed_size: int | None) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        token = data[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = data[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise ValueError("corrupt LZ4 block: literal run past input end")
        out += data[i : i + lit_len]
        i += lit_len
        if i == n:
            break  # final literals-only sequence
        offset = data[i] | (data[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero match offset")
        if offset > len(out):
            raise ValueError("corrupt LZ4 block: offset before block start")
        mlen = (token & 0xF) + _MINMATCH
        if (token & 0xF) == 15:
            while True:
                b = data[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        src = len(out) - offset
        if offset >= mlen:
            out += out[src : src + mlen]
        else:
            # overlapping match (offset < length) repeats recent bytes —
            # must copy byte-wise (RLE-style), a slice would read bytes
            # not yet written
            for _ in range(mlen):
                out.append(out[src])
                src += 1
    if uncompressed_size is not None and len(out) != uncompressed_size:
        raise ValueError(
            f"LZ4 block decoded to {len(out)} bytes, expected {uncompressed_size}"
        )
    return bytes(out)


def _emit_length(out: bytearray, rem: int) -> None:
    while rem >= 255:
        out.append(255)
        rem -= 255
    out.append(rem)


def _emit_sequence(
    out: bytearray, literals: memoryview, offset: int, mlen: int
) -> None:
    lit_len = len(literals)
    ml = mlen - _MINMATCH
    out.append((min(lit_len, 15) << 4) | min(ml, 15))
    if lit_len >= 15:
        _emit_length(out, lit_len - 15)
    out += literals
    out.append(offset & 0xFF)
    out.append(offset >> 8)
    if ml >= 15:
        _emit_length(out, ml - 15)


def _emit_final_literals(out: bytearray, literals: memoryview) -> None:
    lit_len = len(literals)
    out.append(min(lit_len, 15) << 4)
    if lit_len >= 15:
        _emit_length(out, lit_len - 15)
    out += literals


def compress_block(data: bytes) -> bytes:
    """Encode ``data`` as one spec-compliant raw LZ4 block (greedy
    4-byte-hash match finder, matches within the 64 KiB offset window).
    No size prefix is written — the BlockLZ4 store_size=False framing."""
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)  # empty literals-only sequence
        return bytes(out)
    view = memoryview(data)
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    match_end_limit = n - _LASTLITERALS
    while i < n - _MFLIMIT:
        key = bytes(view[i : i + _MINMATCH])
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > _MAX_OFFSET:
            i += 1
            continue
        mlen = _MINMATCH
        max_len = match_end_limit - i
        while mlen < max_len and data[cand + mlen] == data[i + mlen]:
            mlen += 1
        _emit_sequence(out, view[anchor:i], i - cand, mlen)
        i += mlen
        anchor = i
    _emit_final_literals(out, view[anchor:n])
    return bytes(out)
