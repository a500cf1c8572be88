"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
UDFs. The decode kernels themselves are STUBS (image/audio libraries are not
available in this container — ``NotImplementedError`` behind a deterministic
fake), but the Spark-side plumbing — schema, batch shape, partition-safe UDF
signature — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)
FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

_HAVE_DECODERS = False  # no PIL/ffmpeg in this container


def _decode_image(payload: bytes) -> np.ndarray:
    """Real decode path — requires an image library."""
    raise NotImplementedError("image decoding requires PIL/libvips (not in container)")


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: byte-histogram moments. Replaces the
    decode→embed kernel so the distributed plumbing is fully exercised."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    return (hist / max(arr.size, 1)).astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """binary media -> fixed-width feature vectors, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(p if p is not None else b"") if not _HAVE_DECODERS
                else _decode_image(p)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def synthetic_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table (binary payloads from a seeded hash)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = bytes((i * 131 + k * 17) % 256 for k in range(64 + i % 64))
                kind = ("image", "audio", "video")[i % 3]
                rows.append(
                    (i, kind, payload, f"application/x-fake-{kind}",
                     64 if kind == "image" else None,
                     64 if kind == "image" else None,
                     1000 + i if kind != "image" else None)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "mime", "width",
                         "height", "duration_ms"],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode — pure
    expressions (sequence+explode); the decode itself is the stubbed kernel."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )
