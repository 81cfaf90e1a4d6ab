"""Property tests for the stdlib PNG codec (operators/multimodal.py):
encode→decode is the identity for arbitrary small RGB images, under every
scanline filter type — not just the graded fixture pattern."""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from apmbackend_spark.operators.multimodal import decode_png, encode_png


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
    dw, dh, got = decode_png(encode_png(pixels, w, h, filters))
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
    png = encode_png(pixels, 4, 4, [0, 1, 2, 4])
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
