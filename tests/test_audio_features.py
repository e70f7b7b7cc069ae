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


# ---------------------------------------------------------------------------
# perceptual fingerprint
# ---------------------------------------------------------------------------
def _ham(a, b):
    return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")


def test_audio_fingerprint_gain_invariant_and_discriminative(spark):
    """Gain scaling cancels exactly (energy ratios drive the bits); a
    structurally different melody lands far away."""
    from urban_mobility_data_pipeline_spark.extensions.multimodal import (
        audio_fingerprint,
    )

    t = np.arange(SR) / SR
    rng = np.random.default_rng(11)
    # a "melody": frequency stepping per 1/9th-second slice
    steps_a = [300, 500, 400, 800, 350, 900, 450, 700, 600]
    steps_b = [900, 300, 700, 350, 800, 400, 600, 500, 450]

    def melody(steps, gain):
        x = np.concatenate(
            [
                np.sin(2 * np.pi * f * t[: SR // 9])
                for f in steps
            ]
        )
        return gain * (x + 0.01 * rng.standard_normal(x.size))

    rows = [
        (1, bytearray(_wav(melody(steps_a, 0.5))), {"format": "wav"}),
        (2, bytearray(_wav(melody(steps_a, 0.5) * 0.3)), {"format": "wav"}),
        (3, bytearray(_wav(melody(steps_b, 0.5))), {"format": "wav"}),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, meta map<string,string>"
    )
    fp = {
        r["media_id"]: (r["afp_lo"], r["afp_hi"])
        for r in audio_fingerprint(df).collect()
    }
    assert _ham(fp[1], fp[2]) <= 2   # gain-scaled copy
    assert _ham(fp[1], fp[3]) > 12   # different melody
