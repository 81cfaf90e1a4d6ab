"""Real-codec multimodal paths: WAV audio end-to-end (no stub) and the
PIL availability gate for image decode."""

from __future__ import annotations

import importlib.util
import math

import pytest


def test_audio_features_real_wav_roundtrip(spark):
    """The WAV bytes are a real RIFF container and the features come from a
    real demux — cross-check a few rows against direct Python DSP."""
    from apmbackend_spark.operators.multimodal import (
        WAV_RATE,
        _wav_samples,
        audio_features,
        synth_wav_media,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (0, 7, 123, 299)], "doc_id long, text string"
    )
    got = {
        r["media_id"]: r.asDict()
        for r in audio_features(synth_wav_media(spark, docs)).collect()
    }
    assert set(got) == {0, 7, 123, 299}
    for mid, r in got.items():
        samples = _wav_samples(mid)
        assert r["n_samples"] == len(samples) == 200 + mid % 300
        assert r["framerate"] == WAV_RATE
        assert r["duration_ms"] == len(samples) * 1000 // WAV_RATE
        assert r["peak"] == max(abs(s) for s in samples)
        assert r["rms"] == math.sqrt(
            sum(s * s for s in samples) / len(samples)
        )


def test_wav_bytes_are_a_real_container():
    """The synthesized bytes must parse with the stdlib demuxer and round-
    trip the exact PCM samples (i.e. this is NOT a stub payload)."""
    import io
    import struct
    import wave

    from apmbackend_spark.operators.multimodal import _wav_bytes, _wav_samples

    samples = _wav_samples(42)
    blob = _wav_bytes(samples)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    with wave.open(io.BytesIO(blob), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        back = struct.unpack(f"<{w.getnframes()}h", w.readframes(w.getnframes()))
    assert list(back) == samples


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None,
    reason="PIL not installed — image decode stays stubbed in this environment",
)
def test_decode_image_real_with_pil():
    import io

    from PIL import Image

    from apmbackend_spark.operators.multimodal import decode_image_real

    img = Image.new("L", (4, 3), color=128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    pixels, w, h = decode_image_real(buf.getvalue())
    assert (w, h) == (4, 3)
    assert len(pixels) == 12
    assert all(p == 128 / 256.0 for p in pixels)


class TestRealPng:
    def test_roundtrip_exact_all_filters(self):
        from apmbackend_spark.operators.multimodal import (
            _png_bytes,
            _png_dims,
            _png_pixel,
            decode_png,
        )

        for mid in (0, 7, 123, 499):
            w, h, px = decode_png(_png_bytes(mid))
            assert (w, h) == _png_dims(mid)
            assert h >= 5  # every filter type 0..4 exercised
            assert px == [
                _png_pixel(mid, x, y) for y in range(h) for x in range(w)
            ]

    def test_corrupt_crc_raises(self):
        from apmbackend_spark.operators.multimodal import _png_bytes, decode_png

        b = bytearray(_png_bytes(5))
        b[20] ^= 0xFF
        import pytest as _pytest

        with _pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(b))

    def test_truncated_raises(self):
        from apmbackend_spark.operators.multimodal import _png_bytes, decode_png

        import pytest as _pytest

        with _pytest.raises(ValueError):
            decode_png(_png_bytes(5)[:10])

    def test_image_features_end_to_end(self, spark):
        from apmbackend_spark.operators.multimodal import (
            _png_dims,
            _png_pixel,
            image_features,
            synth_png_media,
        )

        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        got = {r["media_id"]: r for r in image_features(
            synth_png_media(spark, docs)
        ).collect()}
        for mid in range(6):
            w, h = _png_dims(mid)
            px = [_png_pixel(mid, x, y) for y in range(h) for x in range(w)]
            r = got[mid]
            assert (r["width"], r["height"]) == (w, h)
            assert r["sum_r"] == sum(p[0] for p in px)
            assert r["sum_b"] == sum(p[2] for p in px)


class TestY4MVideo:
    def test_encode_decode_roundtrip(self):
        from apmbackend_spark.operators.multimodal import (
            _y4m_dims,
            _y4m_frames,
            _y4m_plane_val,
            decode_y4m,
            encode_y4m,
        )

        for mid in range(8):
            w, h, num, den, frames = decode_y4m(encode_y4m(mid))
            assert (w, h) == _y4m_dims(mid)
            assert (num, den) == (25, 1)
            assert len(frames) == _y4m_frames(mid)
            # spot-check plane bytes against the deterministic pattern
            yp, up, vp = frames[0]
            assert yp[0] == _y4m_plane_val(mid, 0, 0, 0, 0)
            assert up[w + 1] == _y4m_plane_val(mid, 1, 0, 1, 1)
            assert vp[-1] == _y4m_plane_val(mid, 2, 0, w - 1, h - 1)

    def test_bad_magic_raises(self):
        import pytest as _pytest

        from apmbackend_spark.operators.multimodal import decode_y4m

        with _pytest.raises(ValueError, match="not a Y4M"):
            decode_y4m(b"RIFFxxxx\nFRAME\n")

    def test_subsampled_colorspace_rejected(self):
        import pytest as _pytest

        from apmbackend_spark.operators.multimodal import decode_y4m

        with _pytest.raises(ValueError, match="C420"):
            decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n" + b"\0" * 24)

    def test_truncated_frame_raises(self):
        import pytest as _pytest

        from apmbackend_spark.operators.multimodal import decode_y4m, encode_y4m

        with _pytest.raises(ValueError, match="truncated"):
            decode_y4m(encode_y4m(3)[:-5])

    def test_frame_marker_params_tolerated(self):
        from apmbackend_spark.operators.multimodal import decode_y4m

        # per-frame parameters after FRAME are legal Y4M; 2x1, one frame
        raw = b"YUV4MPEG2 W2 H1 F25:1 C444\nFRAME Ip\n" + bytes(range(6))
        w, h, _, _, frames = decode_y4m(raw)
        assert (w, h) == (2, 1)
        assert frames == [(bytes([0, 1]), bytes([2, 3]), bytes([4, 5]))]

    def test_video_features_end_to_end(self, spark):
        from apmbackend_spark.operators.multimodal import (
            _y4m_dims,
            _y4m_frames,
            _y4m_plane_val,
            synth_y4m_media,
            video_features,
        )

        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        got = {r["media_id"]: r for r in video_features(
            synth_y4m_media(spark, docs)
        ).collect()}
        for mid in range(6):
            w, h = _y4m_dims(mid)
            n = _y4m_frames(mid)
            want_y = sum(
                _y4m_plane_val(mid, 0, f, x, y)
                for f in range(n) for y in range(h) for x in range(w)
            )
            r = got[mid]
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
            assert r["y_sum"] == want_y
            assert r["duration_ms"] == n * 40


# ---------------------------------------------------------------------------
# BMP (second real image container)


def test_bmp_roundtrip_both_orientations_and_padding():
    from apmbackend_spark.operators.multimodal import (
        _bmp_dims,
        _bmp_pixel,
        decode_bmp,
        encode_bmp,
    )

    # widths 5..16 cover all four stride paddings; both row orders
    for mid in range(24):
        w, h = _bmp_dims(mid)
        px = [_bmp_pixel(mid, x, y) for y in range(h) for x in range(w)]
        for td in (False, True):
            got = decode_bmp(encode_bmp(px, w, h, top_down=td))
            assert got == (w, h, px), (mid, td)


def test_bmp_decoder_rejects_malformed():
    import pytest

    from apmbackend_spark.operators.multimodal import (
        _bmp_bytes,
        decode_bmp,
    )

    good = _bmp_bytes(7)
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-8])
    # flip bpp to 32 in the info header (offset 14+14=28, '<h')
    import struct

    bad = bytearray(good)
    bad[28:30] = struct.pack("<h", 32)
    with pytest.raises(ValueError, match="variant"):
        decode_bmp(bytes(bad))


def test_bmp_features_matches_reference_sums(spark):
    from apmbackend_spark.operators.multimodal import (
        _bmp_dims,
        _bmp_pixel,
        bmp_features,
        synth_bmp_media,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    got = {
        r["media_id"]: (r["width"], r["height"], r["sum_r"], r["sum_g"], r["sum_b"])
        for r in bmp_features(synth_bmp_media(spark, docs)).collect()
    }
    for mid in range(12):
        w, h = _bmp_dims(mid)
        px = [_bmp_pixel(mid, x, y) for y in range(h) for x in range(w)]
        want = (w, h, sum(p[0] for p in px), sum(p[1] for p in px),
                sum(p[2] for p in px))
        assert got[mid] == want


# ---------------------------------------------------------------------------
# GIF89a: full LZW codec + container
# ---------------------------------------------------------------------------


def _lzw_codes(data, mcs=8):
    """Tiny LSB-first code reader replaying the decoder's width schedule —
    used to assert structural facts (width growth, CLEAR resets) about the
    encoder's output, independent of the decoder under test."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    n_table = eoi + 1
    acc = nacc = pos = 0
    first_after_clear = True
    codes = []
    while True:
        while nacc < width:
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        codes.append((code, width))
        if code == eoi:
            return codes
        if code == clear:
            width, n_table, first_after_clear = mcs + 1, eoi + 1, True
            continue
        if first_after_clear:
            first_after_clear = False
            continue
        if n_table < 4096:
            n_table += 1
            if n_table == (1 << width) and width < 12:
                width += 1


def test_gif_lzw_roundtrip_adversarial_streams():
    from apmbackend_spark.operators.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    streams = [
        [0],
        [7] * 1,
        [5] * 300,                      # long single-symbol run (KwKwK chains)
        [1, 1, 1, 1, 2, 2, 2, 2, 1, 1, 1, 1],
        list(range(256)) * 4,           # steady dictionary growth
        [(i * 37 + (i * i) % 251) % 256 for i in range(6000)],
        [(i * 97) % 256 for i in range(5000)],
        [0, 1] * 2500,                  # highly compressible long stream
    ]
    for s in streams:
        assert _lzw_decode_gif(_lzw_encode_gif(s)) == s, s[:8]


def test_gif_lzw_width_growth_and_clear_reset_happen():
    from apmbackend_spark.operators.multimodal import _lzw_encode_gif

    # incompressible stream long enough to fill the 4096-entry dictionary:
    # the encoder MUST emit a mid-stream CLEAR and re-grow from 9 bits
    s = [(i * 37 + (i * i) % 251) % 256 for i in range(6000)]
    codes = _lzw_codes(_lzw_encode_gif(s))
    clears = [i for i, (c, _) in enumerate(codes) if c == 256]
    assert len(clears) >= 2, "no mid-stream CLEAR despite dictionary fill"
    assert clears[0] == 0
    widths = {w for _, w in codes}
    assert widths == {9, 10, 11, 12}, widths
    # short stream: one leading CLEAR, 9-bit codes only
    codes = _lzw_codes(_lzw_encode_gif([3, 1, 4, 1, 5]))
    assert [c for c, _ in codes][0] == 256
    assert {w for _, w in codes} == {9}


def test_gif_container_roundtrip_and_structure():
    from apmbackend_spark.operators.multimodal import (
        _gif_bytes,
        _gif_dims,
        _gif_index,
        _gif_palette_rgb,
        decode_gif,
    )

    for mid in (0, 1, 7, 49, 50, 123, 999):
        raw = _gif_bytes(mid)
        assert raw[:6] == b"GIF89a" and raw[-1:] == b"\x3b"
        w, h, idx, pal = decode_gif(raw)
        assert (w, h) == _gif_dims(mid)
        assert idx == [
            _gif_index(mid, x, y) for y in range(h) for x in range(w)
        ]
        assert pal == [_gif_palette_rgb(mid, i) for i in range(256)]


def test_gif_decoder_skips_extensions_and_rejects_malformed():
    import pytest

    from apmbackend_spark.operators.multimodal import (
        _gif_bytes,
        decode_gif,
    )

    raw = bytearray(_gif_bytes(3))
    # splice a Graphic Control Extension before the image descriptor —
    # a spec-real file layout the decoder must skip over
    img_at = raw.index(0x2C, 13 + 768)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = bytes(raw[:img_at]) + gce + bytes(raw[img_at:])
    assert decode_gif(spliced)[:2] == decode_gif(bytes(raw))[:2]

    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + bytes(100))
    # interlace flag set -> unsupported, not silently wrong
    bad = bytearray(_gif_bytes(3))
    at = bad.index(0x2C, 13 + 768)
    bad[at + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(bad))
    # truncated LZW payload -> hard error
    with pytest.raises(ValueError):
        decode_gif(bytes(raw[: len(raw) // 2]))


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None,
    reason="PIL not installed — cross-codec validation runs in rich envs",
)
def test_gif_encoder_readable_by_pil():
    import io

    from PIL import Image

    from apmbackend_spark.operators.multimodal import (
        _gif_bytes,
        _gif_index,
        _gif_palette_rgb,
        decode_gif,
    )

    for mid in (2, 50, 77):
        raw = _gif_bytes(mid)
        img = Image.open(io.BytesIO(raw))
        w, h, idx, pal = decode_gif(raw)
        assert (img.width, img.height) == (w, h)
        rgb = list(img.convert("RGB").getdata())
        assert rgb == [pal[i] for i in idx]


def test_gif_features_matches_reference_sums(spark):
    from apmbackend_spark.operators.multimodal import (
        _gif_dims,
        _gif_index,
        _gif_palette_rgb,
        gif_features,
        synth_gif_media,
    )

    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 5, 50, 51)], "doc_id long"
    )
    got = {
        r["media_id"]: (
            r["width"], r["height"], r["n_distinct_idx"],
            r["sum_r"], r["sum_g"], r["sum_b"],
        )
        for r in gif_features(synth_gif_media(spark, docs)).collect()
    }
    for mid in (0, 1, 5, 50, 51):
        w, h = _gif_dims(mid)
        idx = [_gif_index(mid, x, y) for y in range(h) for x in range(w)]
        pal = [_gif_palette_rgb(mid, i) for i in range(256)]
        want = (
            w, h, len(set(idx)),
            sum(pal[i][0] for i in idx),
            sum(pal[i][1] for i in idx),
            sum(pal[i][2] for i in idx),
        )
        assert got[mid] == want


def test_gif_lzw_roundtrip_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from apmbackend_spark.operators.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 255), min_size=1, max_size=2000))
    def check(stream):
        assert _lzw_decode_gif(_lzw_encode_gif(stream)) == stream

    check()


def test_gif_every_truncation_offset_raises_valueerror():
    # exhaustive hostile-input sweep: a cut at ANY byte offset must raise
    # ValueError (never IndexError/struct.error escaping the parser)
    from apmbackend_spark.operators.multimodal import _gif_bytes, decode_gif

    raw = _gif_bytes(3)
    for cut in range(1, len(raw)):
        try:
            decode_gif(raw[:cut])
        except ValueError:
            pass


def test_audio_vad_matches_python_reference_and_block_structure(spark):
    # the detected segments must equal a pure-Python VAD over the same
    # decoded samples AND reproduce the synth's voiced-block runs exactly
    # (energy separates sawtooth blocks from near-silence by ~10^5x)
    from apmbackend_spark.operators.multimodal import (
        VAD_FRAME,
        VAD_THRESH,
        _speech_samples,
        audio_vad,
        synth_speech_media,
    )

    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(40)
    got = {}
    for r in audio_vad(synth_speech_media(spark, df)).collect():
        got.setdefault(r["media_id"], []).append(
            (r["seg"], r["start_ms"], r["end_ms"], r["n_frames"],
             r["energy"], r["peak"])
        )
    for mid in [r["doc_id"] for r in df.select("doc_id").collect()]:
        samples = _speech_samples(int(mid))
        segs, cur = [], None
        for f0 in range(0, len(samples), VAD_FRAME):
            chunk = samples[f0 : f0 + VAD_FRAME]
            e = sum(s * s for s in chunk)
            p = max(abs(s) for s in chunk)
            if e >= VAD_THRESH:
                if cur is None:
                    cur = [f0 // VAD_FRAME, f0 // VAD_FRAME, 0, 0, 0]
                cur[1] = f0 // VAD_FRAME
                cur[2] += 1
                cur[3] += e
                cur[4] = max(cur[4], p)
            elif cur is not None:
                segs.append(cur)
                cur = None
        if cur is not None:
            segs.append(cur)
        want = [
            (i + 1, s[0] * 10, (s[1] + 1) * 10, s[2], s[3], s[4])
            for i, s in enumerate(segs)
        ]
        assert sorted(got.get(mid, [])) == want, mid
        # block-structure cross-check: voiced frames = the synth rule
        voiced_frames = {
            b
            for b in range((len(samples) + VAD_FRAME - 1) // VAD_FRAME)
            if (mid * 7 + b * 13) % 5 < 2
        }
        covered = set()
        for _, s_ms, e_ms, _, _, _ in want:
            covered.update(range(s_ms // 10, e_ms // 10))
        assert covered == voiced_frames, mid


def test_audio_vad_hangover_bridges_and_reduces_to_plain(spark):
    # hangover=0 must reproduce audio_vad's segments exactly (modulo the
    # n_voiced/n_bridged column split), hangover=1 must merge across
    # single-frame gaps (fewer segments, n_bridged > 0 somewhere), and
    # a pure-Python smoother must agree bit-exact at hangover=1
    from apmbackend_spark.operators.multimodal import (
        VAD_FRAME,
        VAD_THRESH,
        _speech_samples,
        audio_vad,
        audio_vad_hangover,
        synth_speech_media,
    )

    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(40)
    media = synth_speech_media(spark, df)
    plain = audio_vad(media).collect()
    h0 = audio_vad_hangover(media, hangover=0).collect()
    key = lambda r: (r["media_id"], r["seg"])  # noqa: E731
    assert {
        key(r): (r["start_ms"], r["end_ms"], r["energy"], r["peak"])
        for r in plain
    } == {
        key(r): (r["start_ms"], r["end_ms"], r["energy"], r["peak"])
        for r in h0
    }
    assert all(r["n_bridged"] == 0 for r in h0)

    h1 = audio_vad_hangover(media, hangover=1).collect()
    assert len(h1) < len(plain)
    assert any(r["n_bridged"] > 0 for r in h1)

    # python reference at hangover=1
    want = {}
    for r in df.select("doc_id").collect():
        mid = int(r["doc_id"])
        samples = _speech_samples(mid)
        fr = []
        for f0 in range(0, len(samples), VAD_FRAME):
            chunk = samples[f0 : f0 + VAD_FRAME]
            fr.append(
                (f0 // VAD_FRAME, sum(s * s for s in chunk),
                 max(abs(s) for s in chunk))
            )
        voiced = [f for f in fr if f[1] >= VAD_THRESH]
        seg_id, prev = 0, None
        segs = {}
        for f, e, p in voiced:
            if prev is None or f - prev > 2:
                seg_id += 1
            segs.setdefault(seg_id, []).append((f, e, p))
            prev = f
        for sid, fs in segs.items():
            f0s, f1s = fs[0][0], fs[-1][0]
            want[(mid, sid)] = (
                f0s * 10, (f1s + 1) * 10, len(fs),
                f1s - f0s + 1 - len(fs),
                sum(e for _, e, _ in fs), max(p for _, _, p in fs),
            )
    got = {
        key(r): (r["start_ms"], r["end_ms"], r["n_voiced"],
                 r["n_bridged"], r["energy"], r["peak"])
        for r in h1
    }
    assert got == want
