"""Audio spectral features (extensions/multimodal.py:audio_features):
the FFT kernel must recover known signal properties from synthesized
wavs — a pure tone's centroid lands on its frequency, noise spreads
the bandwidth, silence gates to zero energy — and non-wav payloads
are skipped, not fatal."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from urban_mobility_data_pipeline_spark.extensions.multimodal import (
    audio_features,
)

SR = 8000


def _wav(samples: np.ndarray, sr: int = SR) -> bytes:
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def feats(spark):
    t = np.arange(SR) / SR  # 1 second
    rng = np.random.default_rng(3)
    clips = {
        1: 0.5 * np.sin(2 * np.pi * 440.0 * t),     # A4 tone
        2: 0.5 * np.sin(2 * np.pi * 1760.0 * t),    # A6 tone
        3: 0.3 * rng.standard_normal(SR),           # noise
        4: np.zeros(SR),                            # silence
    }
    rows = [
        (mid, bytearray(_wav(x)), {"format": "wav"}) for mid, x in clips.items()
    ] + [(9, bytearray(b"notaudio"), {"format": "png"})]
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, meta map<string,string>",
    )
    return {r["media_id"]: r.asDict() for r in audio_features(df).collect()}


def test_pure_tone_centroid_is_its_frequency(feats):
    assert feats[1]["spectral_centroid_hz"] == pytest.approx(440.0, abs=5.0)
    assert feats[2]["spectral_centroid_hz"] == pytest.approx(1760.0, abs=5.0)
    # a pure tone's energy is concentrated: tiny bandwidth, rolloff at f
    assert feats[1]["spectral_bandwidth_hz"] < 50.0
    assert feats[1]["spectral_rolloff_hz"] == pytest.approx(440.0, abs=10.0)


def test_zero_crossing_tracks_frequency(feats):
    # a sine at f crosses zero 2f times/sec => rate ~ 2f/sr
    assert feats[1]["zero_crossing_rate"] == pytest.approx(
        2 * 440.0 / SR, rel=0.05
    )
    assert feats[2]["zero_crossing_rate"] == pytest.approx(
        2 * 1760.0 / SR, rel=0.05
    )


def test_noise_is_broadband(feats):
    assert feats[3]["spectral_bandwidth_hz"] > 800.0
    assert feats[3]["spectral_rolloff_hz"] > 2500.0


def test_silence_gates_to_zero(feats):
    s = feats[4]
    assert s["rms"] == 0.0
    assert s["spectral_centroid_hz"] == 0.0


def test_non_wav_payloads_skipped(feats):
    assert 9 not in feats
    assert set(feats) == {1, 2, 3, 4}
