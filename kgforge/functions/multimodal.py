"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as `binary` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched `mapInPandas` stages so
the bytes never round-trip through per-row Python pickling.

The decode kernels themselves are STUBS in this container (no PIL/ffmpeg):
`decode_image` raises NotImplementedError unless `fake=True`, in which case a
deterministic hash-derived feature vector stands in. Everything Spark-side —
schema, batch iteration, partitioning, output shape — is real and tested, so
swapping in a real kernel is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload into a feature vector.

    Real decode needs PIL/libvips — not in this container. `fake=True`
    substitutes a deterministic blake2b-derived vector (same bytes -> same
    vector on any machine), keeping the pipeline testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips; run with fake=True in this "
            "container"
        )
    digest = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    raw = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
    return (raw / np.uint32(0xFFFFFFFF)).astype(np.float32)


def extract_features(
    media: DataFrame, fake: bool = True, kernel=None
) -> DataFrame:
    """media(media_id, payload binary, meta MEDIA_META) -> FEATURES_SCHEMA.

    Arrow-batched mapInPandas: each batch is a pandas DataFrame; the payload
    column arrives as raw bytes objects, features leave as list<float>.

    `kernel` is the PUBLIC DECODE SEAM (VERDICT r03 #8): a callable
    ``(payload: bytes, meta: dict) -> 1-D float sequence`` executed inside
    the Arrow batch loop (bytes and metadata arrive together, transfer
    stays batch-vectorized). Default: the stubbed `decode_image` (honoring
    `fake`). Swapping in a real PIL/ffmpeg decoder later is
    ``extract_features(df, kernel=my_decode)`` — the contract test in
    tests/test_multimodal.py pins the seam's types and shapes.
    """
    if kernel is None:
        def kernel(payload: bytes, meta: dict):
            return decode_image(payload, fake=fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                np.asarray(kernel(p, m), dtype=np.float32).tolist()
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms).

    Pure built-ins — the expensive decode happens later, on the exploded
    plan, so Spark parallelizes per frame rather than per video (long videos
    don't skew partitions).
    """
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        payload = rng.bytes(128 + int(rng.randint(0, 256)))
        mt = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                bytearray(payload),
                (mt, f"{mt}/x-fake", 64, 48, 3000 + 500 * (i % 5)),
            )
        )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )
    return spark.createDataFrame(rows, schema)
