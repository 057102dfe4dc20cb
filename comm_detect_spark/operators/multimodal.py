"""Multimodal column plumbing: image/audio/video as opaque ``binary`` with
typed metadata (round brief).

The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested. The actual codecs are
NOT available in this container, so decode is stubbed two ways:

* ``decode=fake``  — deterministic synthetic decode (hash-seeded), so the
  full pipeline (decode -> feature -> resize/frame-sample) is exercised
  end-to-end with stable golden values;
* ``decode=real``  — raises NotImplementedError with the dependency named
  (PIL/av/soundfile), the marked integration point.

Batch sizing note for 100 TB: media blobs are large; these stages must cap
``spark.sql.execution.arrow.maxRecordsPerBatch`` (or carry media in separate
row-groups) so an Arrow batch stays << executor memory. mapInPandas streams
batches — it never materializes a partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, payload BINARY, "
    "width INT, height INT, sample_rate INT, duration_ms INT"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id BIGINT, width INT, height INT, mean_luma DOUBLE, feature ARRAY<FLOAT>"
)

FRAME_SAMPLE_SCHEMA = "media_id BIGINT, frame_idx INT, frame BINARY"


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decode: bytes -> (h, w) uint8 luma plane,
    seeded by the payload digest (stable across runs/partitions)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def decode_image_batch(
    payloads: pd.Series, widths: pd.Series, heights: pd.Series, mode: str = "fake"
) -> list[np.ndarray]:
    if mode == "real":
        raise NotImplementedError(
            "real image decode needs Pillow (PIL.Image.open) — not in this "
            "container; swap this branch in deployment"
        )
    return [
        _fake_pixels(p, int(w), int(h))
        for p, w, h in zip(payloads, widths, heights)
    ]


def image_features(
    media: DataFrame, feature_dim: int = 8, mode: str = "fake"
) -> DataFrame:
    """decode -> per-image luma stats + a pooled feature vector.
    mapInPandas: one Python call per Arrow batch, numpy inside."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pix = decode_image_batch(
                pdf["payload"], pdf["width"], pdf["height"], mode
            )
            means = [float(p.mean()) for p in pix]
            feats = [
                np.resize(p.mean(axis=0), feature_dim).astype(np.float32)
                for p in pix
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_luma": means,
                    "feature": feats,
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        gen, IMAGE_FEATURES_SCHEMA
    )


def frame_sample(
    media: DataFrame, every_ms: int = 1000, mode: str = "fake"
) -> DataFrame:
    """Video -> sampled frames (binary). Fake mode emits digest-derived
    frame payloads at the right cadence — the row-explosion shape is real."""
    if mode == "real":
        raise NotImplementedError(
            "real frame sampling needs PyAV — not in this container"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n_frames = max(int(dur) // every_ms, 1)
                for k in range(n_frames):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(
                        hashlib.sha256(bytes(payload) + k.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        gen, FRAME_SAMPLE_SCHEMA
    )


def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic media fixture (images + videos)."""
    rows = []
    for i in range(n):
        kind = "image" if i % 2 == 0 else "video"
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                16 + (i % 4) * 8,
                16 + (i % 3) * 8,
                16000,
                (1 + i % 5) * 1000,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
