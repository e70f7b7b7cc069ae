"""Real frame sampling over the concatenated-PPM container and video
near-dup detection: a trimmed copy shares its sampled frames' dHashes
with the original; unrelated footage shares none; the container split
must recover exact frame boundaries."""

from __future__ import annotations

import numpy as np
import pytest

from urban_mobility_data_pipeline_spark.extensions.multimodal import (
    _split_ppms,
    frame_sample_ppms,
    video_near_dup_pairs,
)


def _frame(seed: int) -> bytes:
    # each frame renders its seed's sha256 bits as a 9x8 block pattern
    # aligned with the dHash grid, so distinct seeds get distinct
    # hashes BY CONSTRUCTION and identical seeds identical ones —
    # plain noise would not move the neighbor comparisons at all
    import hashlib

    bits = np.unpackbits(
        np.frombuffer(
            hashlib.sha256(str(seed).encode()).digest(), dtype=np.uint8
        )
    )[:72].reshape(8, 9)
    cells = np.where(bits == 1, 220.0, 25.0)
    px = np.kron(cells, np.ones((3, 4)))  # 9*4 x 8*3 = 36x24
    px = np.stack([px] * 3, axis=2)
    h, w = px.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def _video(seeds) -> bytearray:
    return bytearray(b"".join(_frame(s) for s in seeds))


def test_container_split_roundtrip():
    frames = [_frame(s) for s in (1, 2, 3)]
    got = _split_ppms(b"".join(frames))
    assert got == frames


@pytest.fixture(scope="module")
def sampled(spark):
    original = _video(range(0, 20))          # 20 frames
    trimmed = _video(range(5, 20))           # same footage, first 5 cut
    unrelated = _video(range(100, 120))
    rows = [
        (1, original, {"format": "ppms"}),
        (2, trimmed, {"format": "ppms"}),
        (3, unrelated, {"format": "ppms"}),
        (9, bytearray(b"x"), {"format": "wav"}),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, meta map<string,string>"
    )
    return frame_sample_ppms(df, every_n=5, max_frames=4)


def test_sampling_contract(sampled):
    rows = sampled.collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r["frame_index"])
    assert sorted(by_vid[1]) == [0, 5, 10, 15]
    assert sorted(by_vid[2]) == [0, 5, 10]  # 15 frames -> 3 samples
    assert 9 not in by_vid


def test_trimmed_copy_detected(sampled):
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_frames"]
        for r in video_near_dup_pairs(sampled, min_shared=2).collect()
    }
    # original samples frames 0,5,10,15 (seeds 0,5,10,15); the trim
    # samples its frames 0,5,10 = seeds 5,10,15 -> 3 shared hashes
    assert pairs.get((1, 2)) == 3
    assert all(3 not in p for p in pairs)
