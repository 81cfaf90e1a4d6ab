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
