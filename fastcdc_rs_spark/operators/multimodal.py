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
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["MEDIA_SCHEMA", "media_metadata", "image_features", "frame_sample"]

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
