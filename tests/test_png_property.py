"""Property tests for the stdlib PNG codec (operators/multimodal.py):
encode→decode is the identity for arbitrary small RGB images, under every
scanline filter type — not just the graded fixture pattern."""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from apmbackend_spark.operators.multimodal import (
    _paeth,
    _png_chunk,
    _PNG_SIG,
    decode_png,
)


def encode_rgb(pixels, w, h, filters):
    """Arbitrary-filter PNG encoder (generalizes _png_bytes: the per-row
    filter types come from `filters` instead of y % 5)."""
    bpp = 3
    prev = bytes(w * bpp)
    out = bytearray()
    for y in range(h):
        raw = bytearray()
        for x in range(w):
            raw += bytes(pixels[y * w + x])
        f = filters[y]
        out.append(f)
        for i in range(len(raw)):
            a = raw[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = raw[i]
            elif f == 1:
                v = raw[i] - a
            elif f == 2:
                v = raw[i] - b
            elif f == 3:
                v = raw[i] - (a + b) // 2
            else:
                v = raw[i] - _paeth(a, b, c)
            out.append(v & 0xFF)
        prev = bytes(raw)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_roundtrip_random_images_and_filters(data):
    w = data.draw(st.integers(1, 12))
    h = data.draw(st.integers(1, 12))
    pixels = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
            ),
            min_size=w * h,
            max_size=w * h,
        )
    )
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    dw, dh, got = decode_png(encode_rgb(pixels, w, h, filters))
    assert (dw, dh) == (w, h)
    assert got == pixels


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_single_bit_corruption_never_passes_silently(data):
    # Flipping one bit anywhere in the chunk bodies/headers must either
    # raise (CRC/structure) or still decode to the SAME pixels (a flip in
    # zlib padding bytes can be a no-op) — never silently different pixels
    # without a CRC failure. We flip within chunk data, so decode must raise.
    pixels = [(x * 17 % 256, x * 29 % 256, x * 43 % 256) for x in range(16)]
    png = encode_rgb(pixels, 4, 4, [0, 1, 2, 4])
    # byte offsets inside IHDR/IDAT chunk payloads (skip signature+lengths)
    idx = data.draw(st.integers(16, len(png) - 13))
    bit = data.draw(st.integers(0, 7))
    corrupted = bytearray(png)
    corrupted[idx] ^= 1 << bit
    try:
        _, _, got = decode_png(bytes(corrupted))
    except (ValueError, zlib.error, struct.error):
        return  # detected — good
    assert got == pixels  # only acceptable if the flip was semantically inert
