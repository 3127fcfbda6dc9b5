"""Multimodal column plumbing (training-data pipeline ops).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partition-size control — is real and tested;
the actual codec calls are STUBBED behind ``_decode_image``/
``_decode_audio`` with deterministic fakes (the container has no
image/audio libraries), clearly marked below. Swapping in PIL/libsndfile
is a one-function change that does not alter any DataFrame contract.
"""

from __future__ import annotations

import io
import os
from collections.abc import Iterator

import numpy as np

try:  # real decoder when the environment provides it (not this container)
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_metadata",
    "image_features",
    "image_resize",
    "audio_features",
    "frame_sample",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),        # image | audio | video
        StructField("payload", StructType([]), True),    # replaced below
    ]
)

_FEATURE_DIM = 16


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode to an HxWx3 uint8 array.

    Uses PIL when importable (real deployments); otherwise — or when
    ``SPARK_GRAFT_FAKE_MEDIA=1`` forces it (tests, this container) — a
    clearly-marked deterministic STUB derived from the payload bytes so
    the downstream plumbing (shapes, hashing, batching) is exercised
    honestly. Raises on empty payload like a real decoder."""
    if not payload:
        raise ValueError("empty image payload")
    if _HAVE_PIL and os.environ.get("SPARK_GRAFT_FAKE_MEDIA") != "1":
        img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    # STUB path
    h = (payload[0] % 8) + 2
    w = (payload[-1] % 8) + 2
    flat = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(h * w * 3 / flat.size))
    return np.tile(flat, reps)[: h * w * 3].reshape(h, w, 3)


def media_metadata(media: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """(media_id, n_bytes, payload_hash) — pure JVM metadata pass."""
    return media.select(
        F.col(id_col),
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.xxhash64(F.col(payload_col)).alias("payload_hash"),
    )


def image_features(media: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """(media_id, height, width, features array<float>[16]).

    mapInPandas so one Arrow batch of payloads is decoded + featurized per
    call; the feature vector is a channel-histogram (deterministic with the
    stub decoder). Output partitioning follows the input — no shuffle.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("height", IntegerType(), False),
            StructField("width", IntegerType(), False),
            StructField("features", ArrayType(FloatType(), False), False),
        ]
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, feats = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _decode_image(bytes(payload))
                hist, _ = np.histogram(img, bins=_FEATURE_DIM, range=(0, 256))
                total = hist.sum() or 1
                ids.append(mid)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame(
                {"media_id": ids, "height": hs, "width": ws, "features": feats}
            )

    return media.select(id_col, payload_col).mapInPandas(_featurize, out_schema)


def image_resize(media: DataFrame, height: int, width: int,
                 payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """(media_id, height, width, pixels binary): nearest-neighbor resize to
    (height, width), emitted as raw interleaved RGB bytes.

    The resample itself is real numpy index arithmetic (works identically
    over the PIL decode and the stub); only the initial decode shares
    ``_decode_image``'s stub-vs-PIL gate. mapInPandas, one Arrow batch per
    call, no shuffle — at scale this runs as a map stage colocated with
    the scan.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("height", IntegerType(), False),
            StructField("width", IntegerType(), False),
            StructField("pixels", BinaryType(), False),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _decode_image(bytes(payload))
                h_in, w_in = img.shape[0], img.shape[1]
                rows = (np.arange(height) * h_in) // height
                cols = (np.arange(width) * w_in) // width
                out = img[rows][:, cols]
                ids.append(mid)
                pix.append(out.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "height": [height] * len(ids),
                    "width": [width] * len(ids),
                    "pixels": pix,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(_resize, out_schema)


def _decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """(mono float32 samples in [-1, 1], sample_rate).

    REAL decode for RIFF/WAVE payloads via stdlib ``wave`` (8/16-bit PCM,
    multi-channel averaged to mono) — no external codec library needed.
    Arbitrary non-WAV bytes fall back to a clearly-marked deterministic
    STUB (raw little-endian int16 PCM at 16 kHz) so the batching/schema
    plumbing is exercised for codecs this container lacks (mp3 etc.).
    Raises on empty payload like a real decoder."""
    if not payload:
        raise ValueError("empty audio payload")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            sr = w.getframerate()
            raw = w.readframes(w.getnframes())
            width = w.getsampwidth()
            ch = w.getnchannels()
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 1:
            u = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            x = (u - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported WAV sample width {width}")
        if ch > 1:
            x = x[: (x.size // ch) * ch].reshape(-1, ch).mean(axis=1)
        return x, sr
    # STUB path: raw PCM interpretation
    usable = payload[: len(payload) // 2 * 2]
    x = np.frombuffer(usable, dtype="<i2").astype(np.float32) / 32768.0
    return x, 16000


def audio_features(media: DataFrame, n_bands: int = 8,
                   payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """(media_id, n_samples, sample_rate, rms, band_rms array<float>[n_bands]).

    Per-payload decode + energy features in one mapInPandas pass:
    ``rms`` over the whole clip and per-band RMS over ``n_bands`` equal
    time slices (the shape a VAD / silence-trim stage consumes). Output
    partitioning follows the input — a pure map stage at scale.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_samples", LongType(), False),
            StructField("sample_rate", IntegerType(), False),
            StructField("rms", FloatType(), False),
            StructField("band_rms", ArrayType(FloatType(), False), False),
        ]
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, srs, rms, bands = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                x, sr = _decode_audio(bytes(payload))
                ids.append(mid)
                ns.append(x.size)
                srs.append(sr)
                rms.append(
                    float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                )
                if x.size:
                    edges = (np.arange(n_bands + 1) * x.size) // n_bands
                    br = [
                        float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0
                        for seg in (
                            x[edges[i]: edges[i + 1]] for i in range(n_bands)
                        )
                    ]
                else:
                    br = [0.0] * n_bands
                bands.append(np.asarray(br, dtype=np.float32))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_samples": ns,
                    "sample_rate": srs,
                    "rms": np.asarray(rms, dtype=np.float32),
                    "band_rms": bands,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(_featurize, out_schema)


def frame_sample(media: DataFrame, every_n: int = 10,
                 payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """(media_id, frame_idx, frame_hash): deterministic frame sampling for
    video payloads. STUB decode: frames are fixed-size byte slices of the
    payload; a real decoder would seek keyframes. The explode/batch shape
    is what a real implementation inherits unchanged.
    """
    frame_bytes = 256
    n_frames = F.floor(F.length(F.col(payload_col)) / frame_bytes).cast("int")
    idxs = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        media.select(
            F.col(id_col),
            F.col(payload_col),
            F.explode(idxs).alias("frame_idx"),
        )
        .select(
            id_col,
            "frame_idx",
            F.xxhash64(
                F.substr(
                    F.col(payload_col),
                    (F.col("frame_idx") * frame_bytes + 1).cast("int"),
                    F.lit(frame_bytes),
                )
            ).alias("frame_hash"),
        )
    )
