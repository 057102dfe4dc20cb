"""Multimodal column plumbing: image/audio/video as opaque ``binary`` with
typed metadata (round brief).

The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested. The actual codecs are
OPTIONAL imports, tried at call time:

* ``decode=fake``  — deterministic synthetic decode (hash-seeded), so the
  full pipeline (decode -> feature -> resize/frame-sample) is exercised
  end-to-end with stable golden values; this stays the deterministic gate
  everywhere (real codec output varies by library version).
* ``decode=real``  — uses Pillow (images) / PyAV (video) when importable;
  raises NotImplementedError naming the missing dependency otherwise. The
  tests for the real path are skip-marked on the import, so a container
  that gains the library exercises them automatically.

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
        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "real image decode needs Pillow (PIL.Image.open) — not "
                "importable here; `pip install Pillow` in deployment"
            ) from exc
        import io

        return [
            np.asarray(
                Image.open(io.BytesIO(bytes(p))).convert("L"), dtype=np.uint8
            )
            for p in payloads
        ]
    return [
        _fake_pixels(p, int(w), int(h))
        for p, w, h in zip(payloads, widths, heights)
    ]


def image_features(
    media: DataFrame, feature_dim: int = 8, mode: str = "fake"
) -> DataFrame:
    """decode -> per-image luma stats + a pooled feature vector.
    mapInPandas: one Python call per Arrow batch, numpy inside."""
    if mode == "real":  # fail fast on the driver when the codec is absent
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real image decode needs Pillow — not importable here; "
                "`pip install Pillow` in deployment"
            ) from exc

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


def _real_video_frames(payload: bytes, every_ms: int) -> list[bytes]:
    """Decode with PyAV and keep one gray frame per ``every_ms`` of
    presentation time (raw luma-plane bytes)."""
    try:
        import av
    except ImportError as exc:
        raise NotImplementedError(
            "real frame sampling needs PyAV — not importable here; "
            "`pip install av` in deployment"
        ) from exc
    import io

    out: list[bytes] = []
    with av.open(io.BytesIO(bytes(payload))) as container:
        stream = container.streams.video[0]
        next_ts = 0.0
        for frame in container.decode(stream):
            t_ms = float(frame.time or 0.0) * 1000.0
            if t_ms >= next_ts:
                out.append(frame.to_ndarray(format="gray").tobytes())
                next_ts += every_ms
    return out


def frame_sample(
    media: DataFrame, every_ms: int = 1000, mode: str = "fake"
) -> DataFrame:
    """Video -> sampled frames (binary). Fake mode emits digest-derived
    frame payloads at the right cadence — the row-explosion shape is real;
    real mode decodes with PyAV when importable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if mode == "real":
                    sampled = _real_video_frames(payload, every_ms)
                else:
                    n_frames = max(int(dur) // every_ms, 1)
                    sampled = [
                        hashlib.sha256(
                            bytes(payload) + k.to_bytes(4, "big")
                        ).digest()
                        for k in range(n_frames)
                    ]
                for k, fr in enumerate(sampled):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    if mode == "real":  # fail fast on the driver when the codec is absent
        try:
            import av  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real frame sampling needs PyAV — not importable here; "
                "`pip install av` in deployment"
            ) from exc

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
