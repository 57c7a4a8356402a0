"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque ``binary`` payloads plus a typed metadata struct —
the Spark-side schema, partition sizing, Arrow batch shape, and UDF
signatures here are real and tested; the actual codec work is stubbed
because no image/audio libraries ship in this container:

  * ``decode_image`` raises NotImplementedError (clearly marked stub) unless
    a codec callback is injected;
  * ``fake_feature_extract`` is the deterministic stand-in used by tests and
    benchmarks — it derives a feature vector from the payload bytes alone,
    so the full pipeline (scan → mapInPandas batches → feature column →
    similarity search) runs end-to-end without codecs.

Batch sizing note: media rows are big (MBs), so the Arrow batch row-count
(spark.sql.execution.arrow.maxRecordsPerBatch) is NOT the right lever —
``media_repartition_by_bytes`` sizes partitions by payload bytes so a task
holds ~target_mb regardless of row width.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("n_bytes", LongType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_DIM = 32

_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synth_media(spark: SparkSession, n: int, payload_bytes: int = 4096, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = repeatable pseudo-bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(seed + int(i))
                payload = rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
                kind = ["image", "audio", "video"][int(i) % 3]
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "payload": payload,
                        "meta": {
                            "width": 64 if kind != "audio" else None,
                            "height": 64 if kind != "audio" else None,
                            "duration_ms": 1000 if kind != "image" else None,
                            "n_bytes": payload_bytes,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: image decoding requires a codec library not present in this
    container. Inject a real decoder via ``extract_features(decoder=...)``
    in a production image."""
    raise NotImplementedError(
        "image decode stub: no codec library in this environment; "
        "pass decoder= to extract_features"
    )


def fake_feature_extract(payloads: list[bytes]) -> np.ndarray:
    """Deterministic stand-in feature extractor: FEATURE_DIM moments of the
    raw bytes (chunk means, scaled). Vectorized over the batch."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, p in enumerate(payloads):
        arr = np.frombuffer(p, dtype=np.uint8)
        chunks = np.array_split(arr.astype(np.float32), FEATURE_DIM)
        out[i] = np.array([c.mean() if len(c) else 0.0 for c in chunks]) / 255.0
    return out


def extract_features(
    media_df: DataFrame,
    decoder: Callable[[bytes], object] | None = None,
    featurizer: Callable[[list[bytes]], np.ndarray] = fake_feature_extract,
) -> DataFrame:
    """media → (media_id, feature array<float>): the bridge into the
    similarity-search operators (sparkfuse.similarity). Arrow-batched;
    payload bytes never leave the executor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            if decoder is not None:
                payloads = [decoder(p) for p in payloads]
            feats = featurizer(payloads)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "feature": [row.tolist() for row in feats],
                }
            )

    return media_df.select("media_id", "payload").mapInPandas(kernel, _FEATURE_SCHEMA)


def media_repartition_by_bytes(
    media_df: DataFrame, target_mb: int = 128
) -> DataFrame:
    """Partition media so each task sees ~target_mb of payload regardless of
    row width (row-count-based batching would OOM on video rows)."""
    stats = media_df.agg(
        F.sum(F.col("meta.n_bytes")).alias("total"),
    ).first()
    total = stats["total"] or 0
    n_parts = max(1, int(total / (target_mb * 1024 * 1024)))
    return media_df.repartition(n_parts, "media_id")


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-extraction work items (media_id, frame_ts_ms): the
    *plan* is pure column arithmetic (sequence over duration); the decode of
    each frame is the stubbed step."""
    return (
        media_df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
