"""Multimodal column plumbing (SURVEY.md §7 phase 6).

Images/audio/video are opaque ``binary`` columns + a typed metadata
struct; heavy per-item work (decode, feature-extract, resize,
frame-sample) runs as Arrow-batched pandas iterators via
``mapInPandas`` — the only place this engine leaves the JVM, and it does
so in columnar batches, never per-row.

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this
container, so the decode kernels are stubbed: ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic pseudo-decoder (seeded from the payload bytes) produces
stable features. The Spark-side plumbing — schema, partition sizing,
UDF signature, batch shape — is real and tested; swapping in a real
codec changes only the inner function body.

Scale notes: payloads should be size-bucketed before ``mapInPandas``
(``spark.sql.files.maxPartitionBytes`` governs scan partitions, but a
repartition by a size-aware key prevents one 4K-video partition from
straggling); metadata-only predicates (format, duration, width) must be
pushed down BEFORE the decode stage so the binary column is never even
read for filtered rows (parquet column pruning does this for free when
the filter projects only metadata).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Feature schema produced by the (fake) decoder.
MEDIA_FEATURES_SCHEMA = (
    "media_id long, format string, n_bytes int, width int, height int, "
    "mean_intensity double, phash string"
)

#: Frame-sample output: one row per sampled frame.
FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_index int, frame_phash string"
)

_DECODABLE = {"png", "jpeg", "wav", "mp4"}


def attach_binary_payload(
    df: DataFrame, src_col: str, media_id_col: str, fmt: str
) -> DataFrame:
    """Build a multimodal table shape from any source column: opaque
    ``payload`` binary + typed metadata struct. (In production the
    payload comes from object storage; the schema contract is what
    matters here.)"""
    payload = F.col(src_col).cast("binary")
    return df.select(
        F.col(media_id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, fmt: str) -> dict:
    """Deterministic pseudo-decode seeded from the payload digest —
    stands in for PIL/ffmpeg so the distributed plumbing is testable in
    this container."""
    digest = hashlib.sha256(payload).digest()
    return {
        "n_bytes": len(payload),
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "mean_intensity": round(sum(digest[:16]) / (16 * 255), 6),
        "phash": digest[:8].hex(),
    }


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract every payload via ``mapInPandas`` (Arrow
    batches). ``fake=False`` requires real codecs — not available here:
    raises ``NotImplementedError`` at plan-build time, by design."""
    if not fake:
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg) are not installed in this "
            "environment; call decode_media(df, fake=True) for the "
            "deterministic test decoder"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                fmt = meta["format"] if isinstance(meta, dict) else meta.format
                if fmt not in _DECODABLE:
                    continue  # undecodable formats are dropped, not fatal
                d = _fake_decode(bytes(payload), fmt)
                feats.append(
                    {
                        "media_id": media_id,
                        "format": fmt,
                        "n_bytes": d["n_bytes"],
                        "width": d["width"],
                        "height": d["height"],
                        "mean_intensity": d["mean_intensity"],
                        "phash": d["phash"],
                    }
                )
            yield pd.DataFrame(
                feats,
                columns=[
                    "media_id",
                    "format",
                    "n_bytes",
                    "width",
                    "height",
                    "mean_intensity",
                    "phash",
                ],
            )

    return df.mapInPandas(decode_batches, MEDIA_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame, every_n: int = 10, max_frames: int = 3, fake: bool = False
) -> DataFrame:
    """Sample frames from video payloads (1 row in → k rows out). The
    fake decoder derives a deterministic frame count from the payload
    digest; a real implementation swaps in ffmpeg keyframe extraction."""
    if not fake:
        raise NotImplementedError(
            "ffmpeg is not installed; call frame_sample(df, fake=True)"
        )

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.sha256(bytes(payload)).digest()
                n_frames = 1 + digest[2] % (max_frames * every_n)
                for idx, frame in enumerate(range(0, n_frames, every_n)):
                    if idx >= max_frames:
                        break
                    fh = hashlib.sha256(digest + frame.to_bytes(4, "big"))
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_index": frame,
                            "frame_phash": fh.hexdigest()[:16],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_phash"]
            )

    return df.mapInPandas(sample_batches, FRAME_SAMPLE_SCHEMA)
