"""Multimodal column plumbing (SURVEY.md §7 phase 6).

Images/audio/video are opaque ``binary`` columns + a typed metadata
struct; heavy per-item work (decode, feature-extract, resize,
frame-sample) runs as Arrow-batched pandas iterators via
``mapInPandas`` — the only place this engine leaves the JVM, and it does
so in columnar batches, never per-row.

Decode support is per-format:

- **Real decoders** (stdlib-only, no external codecs): ``wav`` (RIFF
  PCM via :mod:`wave` — channels, sample rate, duration, mean
  amplitude), ``ppm`` (binary P6 — width, height, mean pixel
  intensity), ``png`` (signature + IHDR width/height/bit-depth via
  :mod:`struct`, CRC-verified), and ``jpeg`` (marker walk to the
  SOF0/1/2 frame header — width/height/precision). These run
  end-to-end with ``fake=False``.
- **Stubbed formats** (``mp4`` — ffmpeg is NOT
  available in this container): raise ``NotImplementedError`` inside
  the decode kernel unless ``fake=True``, in which case a deterministic
  pseudo-decoder (seeded from the payload bytes) produces stable
  features so the distributed plumbing stays testable.

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
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Feature schema produced by the decoders. width/height are NULL for
#: audio; sample_rate/duration_sec are NULL for images.
MEDIA_FEATURES_SCHEMA = (
    "media_id long, format string, n_bytes int, width int, height int, "
    "sample_rate int, duration_sec double, mean_intensity double, "
    "phash string"
)

#: Frame-sample output: one row per sampled frame.
FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_index int, frame_phash string"
)

#: Resize output: same row shape going back out — resized payload plus
#: its new dimensions (the downstream table keeps the binary-column
#: contract).
RESIZED_MEDIA_SCHEMA = (
    "media_id long, format string, width int, height int, payload binary"
)

#: Formats the FAKE decoder accepts (plumbing tests).
_DECODABLE = {"png", "jpeg", "wav", "mp4", "ppm"}


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


def _decode_wav(payload: bytes) -> dict:
    """Real RIFF/PCM WAV decode via the stdlib :mod:`wave` module:
    sample rate, duration, mean absolute amplitude (normalized to
    [0, 1]), and a content hash of the raw sample data."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sampwidth = w.getsampwidth()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 1:
        # 8-bit WAV is unsigned, centered at 128
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise NotImplementedError(f"{sampwidth * 8}-bit PCM WAV")
    mean_amp = float(np.abs(samples).mean()) if samples.size else 0.0
    return {
        "width": None,
        "height": None,
        "sample_rate": framerate,
        "duration_sec": round(n_frames / framerate, 6) if framerate else None,
        "mean_intensity": round(mean_amp, 6),
        "phash": hashlib.sha256(raw).hexdigest()[:16],
    }


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary-PPM (P6) header: whitespace/comment-tolerant.
    Returns ``(width, height, maxval, pixel_offset)``."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (missing P6 magic)")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, with '#'-to-EOL comments allowed between them
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw pixels
    width, height, maxval = tokens
    if maxval > 255:
        # 16-bit P6 stores 2 bytes/sample; reading it as uint8 would
        # silently cover half the pixel plane — refuse, like _decode_wav
        # does for unsupported PCM widths
        raise NotImplementedError(f"{maxval}-maxval (16-bit) PPM")
    return width, height, maxval, pos


def _decode_ppm(payload: bytes) -> dict:
    """Real binary-PPM (P6) decode: header parse, then mean pixel
    intensity over the raw RGB plane."""
    width, height, maxval, pos = _parse_ppm_header(payload)
    pixels = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=pos)
    return {
        "width": width,
        "height": height,
        "sample_rate": None,
        "duration_sec": None,
        "mean_intensity": round(float(pixels.mean()) / maxval, 6)
        if pixels.size
        else 0.0,
        "phash": hashlib.sha256(pixels.tobytes()).hexdigest()[:16],
    }


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _decode_png(payload: bytes) -> dict:
    """Real PNG header decode, stdlib-only: signature check, IHDR chunk
    parse (width/height/bit-depth via :mod:`struct`) with CRC-32
    verification (:func:`zlib.crc32` over chunk type + data, per the PNG
    spec). Pixel decode needs inflate + per-scanline defiltering, so
    ``mean_intensity`` stays NULL; ``phash`` hashes the full payload."""
    if payload[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    # first chunk MUST be IHDR: length(4) type(4) data(13) crc(4)
    (length,) = struct.unpack(">I", payload[8:12])
    ctype = payload[12:16]
    if ctype != b"IHDR" or length != 13:
        raise ValueError(f"first PNG chunk is {ctype!r} len={length}, not IHDR")
    data = payload[16 : 16 + 13]
    (crc,) = struct.unpack(">I", payload[16 + 13 : 16 + 17])
    if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch (corrupt header)")
    width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {bit_depth}")
    del color_type  # parsed + validated by unpack; not in the feature schema
    return {
        "width": width,
        "height": height,
        "sample_rate": None,
        "duration_sec": None,
        "mean_intensity": None,  # needs inflate+defilter; header-only decode
        "phash": hashlib.sha256(payload).hexdigest()[:16],
    }


def _decode_jpeg(payload: bytes) -> dict:
    """Real JPEG header decode, stdlib-only (VERDICT r5 item 7 — the
    PNG-IHDR treatment for JPEG): walk the marker segments to the
    frame header (SOF0 baseline / SOF1 extended / SOF2 progressive)
    and read precision, height, width, component count via
    :mod:`struct`. FF fill bytes and standalone markers (TEM, RSTn)
    are skipped per the spec; DHT (C4), JPG (C8) and DAC (CC) are NOT
    frame headers despite living in the Cx range. Entropy decode needs
    a DCT codec, so ``mean_intensity`` stays NULL; ``phash`` hashes
    the full payload, like PNG."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI marker)")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at offset {pos}")
        # any number of FF fill bytes may precede a marker
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: no length
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS — frame header must precede
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seg_len < 2:
            raise ValueError(f"corrupt JPEG: segment length {seg_len}")
        if marker in (0xC0, 0xC1, 0xC2):
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", payload[pos + 4 : pos + 10]
            )
            if precision not in (8, 12, 16):
                raise ValueError(f"invalid JPEG sample precision {precision}")
            del ncomp  # validated by unpack; not in the feature schema
            return {
                "width": width,
                "height": height,
                "sample_rate": None,
                "duration_sec": None,
                "mean_intensity": None,  # needs DCT entropy decode
                "phash": hashlib.sha256(payload).hexdigest()[:16],
            }
        pos += 2 + seg_len
    raise ValueError("no SOF frame header before SOS/EOI (truncated JPEG?)")


#: Formats with a REAL stdlib decode path.
REAL_DECODERS = {
    "wav": _decode_wav,
    "ppm": _decode_ppm,
    "png": _decode_png,
    "jpeg": _decode_jpeg,
}


def _fake_decode(payload: bytes, fmt: str) -> dict:
    """Deterministic pseudo-decode seeded from the payload digest —
    stands in for PIL/ffmpeg so the distributed plumbing is testable in
    this container."""
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "sample_rate": None,
        "duration_sec": None,
        "mean_intensity": round(sum(digest[:16]) / (16 * 255), 6),
        "phash": digest[:8].hex(),
    }


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract every payload via ``mapInPandas`` (Arrow
    batches). With ``fake=False``, formats in :data:`REAL_DECODERS`
    (wav, ppm, png) decode for real; other formats raise
    ``NotImplementedError`` in the kernel — PIL/ffmpeg are not
    installed here, by design. ``fake=True`` routes every decodable
    format through the deterministic pseudo-decoder instead."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id",
            "format",
            "n_bytes",
            "width",
            "height",
            "sample_rate",
            "duration_sec",
            "mean_intensity",
            "phash",
        ]
        for pdf in batches:
            feats = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                fmt = meta["format"] if isinstance(meta, dict) else meta.format
                if fmt not in _DECODABLE:
                    continue  # undecodable formats are dropped, not fatal
                data = bytes(payload)
                if fake:
                    d = _fake_decode(data, fmt)
                elif fmt in REAL_DECODERS:
                    d = REAL_DECODERS[fmt](data)
                else:
                    raise NotImplementedError(
                        f"no real codec for format {fmt!r} in this "
                        "environment (PIL/ffmpeg not installed); use "
                        "decode_media(df, fake=True) or a wav/ppm payload"
                    )
                feats.append({"media_id": media_id, "format": fmt, "n_bytes": len(data), **d})
            yield pd.DataFrame(feats, columns=cols)

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


def _resize_ppm(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Real nearest-neighbor resize of a binary PPM (P6): pure numpy
    index mapping over the RGB plane, re-emitted as a minimal P6."""
    width, height, maxval, pos = _parse_ppm_header(payload)
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=pos
    ).reshape(height, width, 3)
    rows = (np.arange(target_h) * height) // target_h
    cols = (np.arange(target_w) * width) // target_w
    resized = pixels[rows][:, cols]
    header = f"P6\n{target_w} {target_h}\n{maxval}\n".encode()
    return header + resized.tobytes()


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize image payloads to ``width``×``height`` via ``mapInPandas``
    (Arrow batches — the per-item pixel work is exactly what belongs in
    a Pandas kernel, not a row-at-a-time UDF). ``ppm`` resizes for REAL
    (numpy nearest-neighbor, re-emitted as P6); other image formats
    need PIL, which isn't installed — they raise unless ``fake=True``,
    which emits a digest-derived payload with the target dimensions so
    the plumbing (schema, batching, 1-row-in/1-row-out) is testable.
    Non-image payloads (wav, mp4) pass through with their payload
    bytes untouched and NULL width/height — their ``meta`` struct
    carries no pixel dimensions to forward (ADVICE r5: the schema
    contract is dims-are-null for pass-through rows, by design)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "format", "width", "height", "payload"]
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                fmt = meta["format"] if isinstance(meta, dict) else meta.format
                data = bytes(payload)
                if fmt not in {"ppm", "png", "jpeg"}:
                    rows.append(
                        {
                            "media_id": media_id,
                            "format": fmt,
                            "width": None,
                            "height": None,
                            "payload": data,
                        }
                    )
                    continue
                if fmt == "ppm" and not fake:
                    out = _resize_ppm(data, width, height)
                elif fake:
                    digest = hashlib.sha256(
                        data + f"{width}x{height}".encode()
                    ).digest()
                    out = (digest * (3 * width * height // len(digest) + 1))[
                        : 3 * width * height
                    ]
                else:
                    raise NotImplementedError(
                        f"no real resize codec for format {fmt!r} (PIL not "
                        "installed); use resize_media(df, fake=True) or a "
                        "ppm payload"
                    )
                rows.append(
                    {
                        "media_id": media_id,
                        "format": fmt,
                        "width": width,
                        "height": height,
                        "payload": out,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(resize_batches, RESIZED_MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# audio spectral features (real DSP over the wav payloads)
# ---------------------------------------------------------------------------
AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, rms double, "
    "zero_crossing_rate double, spectral_centroid_hz double, "
    "spectral_bandwidth_hz double, spectral_rolloff_hz double"
)


def _wav_samples(payload: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(payload), "rb") as w:
        sampwidth = w.getsampwidth()
        framerate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sampwidth == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 1:
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise NotImplementedError(f"{sampwidth * 8}-bit PCM WAV")
    return samples, framerate


def audio_features(df: DataFrame, rolloff: float = 0.85) -> DataFrame:
    """Spectral feature extraction over wav payloads — the audio
    analogue of the image decode path, and the kind of kernel that
    genuinely CAN'T be a Catalyst expression (an FFT), so it runs as
    the documented vectorized exception: ``mapInPandas`` over Arrow
    batches, numpy inside, one output row per clip.

    Features are the classic audio-curation set: RMS energy (silence /
    clipping gates), zero-crossing rate (noisiness), spectral centroid
    and bandwidth (brightness / spread), and the ``rolloff`` frequency
    (below which 85% of spectral energy sits). Per-clip cost is
    O(n log n) in samples; clips process independently, so the
    operator scales with partitions like every other media kernel
    here (payloads stay map-side, only the feature row shuffles)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id",
            "sample_rate",
            "n_samples",
            "rms",
            "zero_crossing_rate",
            "spectral_centroid_hz",
            "spectral_bandwidth_hz",
            "spectral_rolloff_hz",
        ]
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                fmt = meta["format"] if isinstance(meta, dict) else meta.format
                if fmt != "wav":
                    continue
                x, sr = _wav_samples(bytes(payload))
                n = x.size
                if n == 0 or sr <= 0:
                    continue
                rms = float(np.sqrt(np.mean(x * x)))
                zcr = (
                    float(np.mean(np.abs(np.diff(np.signbit(x)))))
                    if n > 1
                    else 0.0
                )
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                power = spec * spec
                tot = float(power.sum())
                if tot > 0:
                    centroid = float((freqs * power).sum() / tot)
                    bandwidth = float(
                        np.sqrt(((freqs - centroid) ** 2 * power).sum() / tot)
                    )
                    cum = np.cumsum(power)
                    roll = float(freqs[np.searchsorted(cum, rolloff * tot)])
                else:
                    centroid = bandwidth = roll = 0.0
                rows.append(
                    {
                        "media_id": media_id,
                        "sample_rate": sr,
                        "n_samples": n,
                        "rms": round(rms, 6),
                        "zero_crossing_rate": round(zcr, 6),
                        "spectral_centroid_hz": round(centroid, 2),
                        "spectral_bandwidth_hz": round(bandwidth, 2),
                        "spectral_rolloff_hz": round(roll, 2),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual image hashing (dHash) + Hamming near-dup candidates
# ---------------------------------------------------------------------------
DHASH_SCHEMA = "media_id long, width int, height int, dhash_lo long, dhash_hi long"


def _dhash_words(payload: bytes) -> tuple[int, int, int, int]:
    """Difference hash of a binary PPM: grayscale, nearest-neighbor
    resample to a 9x8 grid, bit = left pixel brighter than its right
    neighbor — 64 bits packed MSB-first into two 32-bit words (the
    same overflow-free two-word layout the sign-bit embedding codes
    use, so the bit_count(xor) Hamming machinery applies verbatim)."""
    width, height, maxval, pos = _parse_ppm_header(payload)
    px = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=pos
    ).reshape(height, width, 3)
    gray = px.astype(np.float64).mean(axis=2)
    ys = (np.arange(8) * height) // 8
    xs = (np.arange(9) * width) // 9
    grid = gray[np.ix_(ys, xs)]
    bits = (grid[:, :-1] > grid[:, 1:]).astype(np.int64).ravel()
    lo = int("".join(map(str, bits[:32])), 2)
    hi = int("".join(map(str, bits[32:])), 2)
    return width, height, lo, hi


def image_dhash(df: DataFrame) -> DataFrame:
    """Perceptual dHash per ppm payload via ``mapInPandas`` — the
    IMAGE near-dup fingerprint (robust to re-encode/resize/brightness,
    unlike the exact payload digest): two 32-bit words per image, so
    candidate pairs come from the exact same Hamming machinery as
    binary-quantized embeddings (``similarity.bq_topk_from_codes``-
    style bit_count(xor) joins), and only 16 bytes per image ever
    leave the decode stage."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "width", "height", "dhash_lo", "dhash_hi"]
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                fmt = meta["format"] if isinstance(meta, dict) else meta.format
                if fmt != "ppm":
                    continue
                w, h, lo, hi = _dhash_words(bytes(payload))
                rows.append(
                    {
                        "media_id": media_id,
                        "width": w,
                        "height": h,
                        "dhash_lo": lo,
                        "dhash_hi": hi,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(kernel, DHASH_SCHEMA)


def image_near_dup_pairs(
    codes: DataFrame, max_hamming: int = 10
) -> DataFrame:
    """Image near-dup candidate pairs from dHash words: band the hash
    (each 32-bit word is a band — a true near-dup at <=``max_hamming``
    differing bits usually leaves one band intact or close) via an
    equi-join on either word, then verify the full 64-bit Hamming
    distance. The join keys are integers, the pair space is
    O(sum bucket^2) per band value — never all-pairs — and the verify
    is two bit_counts. Same design as the LSH band join for text."""
    a = codes.select(
        F.col("media_id").alias("id_a"),
        F.col("dhash_lo").alias("lo_a"),
        F.col("dhash_hi").alias("hi_a"),
    )
    b = codes.select(
        F.col("media_id").alias("id_b"),
        F.col("dhash_lo").alias("lo_b"),
        F.col("dhash_hi").alias("hi_b"),
    )
    cand = a.join(
        b,
        (F.col("id_a") < F.col("id_b"))
        & (
            (F.col("lo_a") == F.col("lo_b"))
            | (F.col("hi_a") == F.col("hi_b"))
        ),
    )
    hamming = F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    ) + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    return (
        cand.select(
            "id_a", "id_b", hamming.cast("int").alias("hamming")
        )
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# real frame sampling over a concatenated-PPM container + video near-dup
# ---------------------------------------------------------------------------
def _split_ppms(payload: bytes) -> list[bytes]:
    """Split a concatenated-P6 container into its frame payloads (the
    self-describing header of each frame gives its extent)."""
    frames, pos, n = [], 0, len(payload)
    while pos < n:
        width, height, _maxval, data_off = _parse_ppm_header(payload[pos:])
        end = pos + data_off + width * height * 3
        if end > n:
            break
        frames.append(payload[pos:end])
        pos = end
    return frames


def frame_sample_ppms(
    df: DataFrame, every_n: int = 5, max_frames: int = 4
) -> DataFrame:
    """REAL frame sampling for the concatenated-PPM video container
    (the in-repo stand-in for an mp4: self-describing frames, no
    ffmpeg needed): split the payload into frames, keep every
    ``every_n``-th up to ``max_frames``, and emit each sampled frame's
    PERCEPTUAL dHash (the image near-dup fingerprint) — 1 row in,
    k rows out, payloads never leave the decode stage. Same output
    contract as the fake-path ``frame_sample``, so downstream joins
    are agnostic to which decoder produced the rows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                fmt = meta["format"] if isinstance(meta, dict) else meta.format
                if fmt != "ppms":
                    continue
                frames = _split_ppms(bytes(payload))
                for idx, fi in enumerate(range(0, len(frames), every_n)):
                    if idx >= max_frames:
                        break
                    _w, _h, lo, hi = _dhash_words(frames[fi])
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_index": fi,
                            "frame_phash": f"{lo:08x}{hi:08x}",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_phash"]
            )

    return df.mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def video_near_dup_pairs(
    frames: DataFrame, min_shared: int = 2
) -> DataFrame:
    """Video near-dup candidates from sampled frame hashes: two videos
    sharing >= ``min_shared`` perceptual frame fingerprints (trims,
    re-encodes, and watermark-free copies share most frames; unrelated
    footage shares none). The join is an equi-join on the 16-char
    fingerprint — pair space O(sum videos-per-hash squared), never
    all-pairs — followed by a count filter; only (id, hash) rows
    shuffle."""
    a = frames.select(
        F.col("media_id").alias("id_a"), F.col("frame_phash").alias("h")
    ).distinct()
    b = frames.select(
        F.col("media_id").alias("id_b"), F.col("frame_phash").alias("h")
    ).distinct()
    return (
        a.join(b, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("int").alias("shared_frames"))
        .where(F.col("shared_frames") >= min_shared)
    )


# ---------------------------------------------------------------------------
# audio perceptual fingerprint (spectrogram delta-hash, chromaprint-ish)
# ---------------------------------------------------------------------------
AUDIO_FP_SCHEMA = (
    "media_id long, sample_rate int, afp_lo long, afp_hi long"
)


def _audio_fp_words(x: np.ndarray, sr: int) -> tuple[int, int]:
    """64-bit audio fingerprint: 9 time slices x 8 log-spaced frequency
    bands of spectral energy, bit = band energy RISES from one slice to
    the next (8 bands x 8 transitions). Energy RATIOS drive the bits,
    so amplitude scaling cancels exactly — the audio analogue of
    dHash's brightness invariance — and the words use the same
    overflow-free two-word layout as the image/embedding codes."""
    n = x.size
    slices = np.array_split(x, 9)
    bands = np.zeros((9, 8))
    edges = np.geomspace(60.0, sr / 2.0, 9)
    for i, sl in enumerate(slices):
        if sl.size < 2:
            continue
        spec = np.abs(np.fft.rfft(sl)) ** 2
        freqs = np.fft.rfftfreq(sl.size, d=1.0 / sr)
        for b in range(8):
            m = (freqs >= edges[b]) & (freqs < edges[b + 1])
            bands[i, b] = spec[m].sum()
    bits = (bands[1:, :] > bands[:-1, :]).astype(np.int64).ravel()
    lo = int("".join(map(str, bits[:32])), 2)
    hi = int("".join(map(str, bits[32:])), 2)
    return lo, hi


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """Perceptual audio fingerprint per wav payload via ``mapInPandas``
    — the audio near-dup key (robust to gain changes and re-encode,
    unlike the sample-digest phash). Two 32-bit words per clip, so
    candidate pairs reuse the identical banded bit_count(xor) Hamming
    machinery as images (:func:`image_near_dup_pairs` works verbatim
    on ``(media_id, afp_lo, afp_hi)`` renamed)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "sample_rate", "afp_lo", "afp_hi"]
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                fmt = meta["format"] if isinstance(meta, dict) else meta.format
                if fmt != "wav":
                    continue
                x, sr = _wav_samples(bytes(payload))
                if x.size < 18 or sr <= 0:
                    continue
                lo, hi = _audio_fp_words(x, sr)
                rows.append(
                    {
                        "media_id": media_id,
                        "sample_rate": sr,
                        "afp_lo": lo,
                        "afp_hi": hi,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(kernel, AUDIO_FP_SCHEMA)
