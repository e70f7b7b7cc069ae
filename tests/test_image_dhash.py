"""Perceptual image dHash + Hamming near-dup candidates
(extensions/multimodal.py): a brightened or resized copy must land
within a few bits of its original (the exact payload digest sees them
as unrelated), structurally different images far away, and the banded
pair join must surface exactly the near-dup pair."""

from __future__ import annotations

import numpy as np
import pytest

from urban_mobility_data_pipeline_spark.extensions.multimodal import (
    image_dhash,
    image_near_dup_pairs,
)


def _ppm(px: np.ndarray) -> bytearray:
    h, w, _ = px.shape
    return bytearray(
        f"P6\n{w} {h}\n255\n".encode()
        + px.astype(np.uint8).tobytes()
    )


def _gradient(w: int, h: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 200, w)[None, :, None]
    y = np.linspace(0, 55, h)[:, None, None]
    base = x + y + rng.integers(0, 8, size=(h, w, 3))
    return np.clip(base, 0, 255)


@pytest.fixture(scope="module")
def codes(spark):
    base = _gradient(64, 48, seed=1)
    brightened = np.clip(base + 30, 0, 255)          # tone shift
    resized = base[::2, ::2]                         # 2x downsample
    other = _gradient(64, 48, seed=99)[::-1, ::-1]   # different structure
    rows = [
        (1, _ppm(base), {"format": "ppm"}),
        (2, _ppm(brightened), {"format": "ppm"}),
        (3, _ppm(resized), {"format": "ppm"}),
        (4, _ppm(other), {"format": "ppm"}),
        (9, bytearray(b"na"), {"format": "wav"}),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, meta map<string,string>"
    )
    out = image_dhash(df)
    return out, {r["media_id"]: (r["dhash_lo"], r["dhash_hi"]) for r in out.collect()}


def _ham(a, b):
    return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")


def test_tone_shift_preserves_hash(codes):
    _, h = codes
    # dHash compares neighbors, so a uniform brightness shift is a no-op
    assert _ham(h[1], h[2]) == 0


def test_downsample_stays_close(codes):
    _, h = codes
    assert _ham(h[1], h[3]) <= 8


def test_different_image_is_far(codes):
    _, h = codes
    assert _ham(h[1], h[4]) > 16


def test_non_ppm_skipped(codes):
    _, h = codes
    assert set(h) == {1, 2, 3, 4}


def test_near_dup_pair_join(codes):
    df, _ = codes
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(df, max_hamming=8).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (1, 3) in pairs or (2, 3) in pairs
    assert all(4 not in p for p in pairs)
