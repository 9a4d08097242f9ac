"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (image/audio libs absent in this container,
per the build brief): ``decode_fn=None`` raises NotImplementedError at
plan-execution time, while ``deterministic_fake=True`` substitutes a
hash-derived featurizer so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
Swapping in PIL/ffmpeg later changes only the inner ``_decode_one``.

Schema convention:

    media(asset_id long, kind string, payload binary,
          meta struct<width int, height int, sample_rate int,
                      duration_ms int, mime string>)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synth_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (payload = hash-keyed bytes)."""
    mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
    df = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.lit(kind).alias("kind"),
        # payload bytes derive from the id — deterministic, no RNG
        F.encode(
            F.concat(F.lit(f"{kind}-payload-"), F.sha2(F.col("id").cast("string"), 256)),
            "utf-8",
        ).alias("payload"),
        F.struct(
            (F.pmod(F.col("id") * 37, 512) + 32).cast("int").alias("width"),
            (F.pmod(F.col("id") * 53, 512) + 32).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            ((F.pmod(F.col("id"), 30) + 1) * 1000).cast("int").alias("duration_ms"),
            F.lit(mime).alias("mime"),
        ).alias("meta"),
    )
    return df


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: bytes → unit vector."""
    h = np.array([hash_bytes(payload, seed=s) for s in range(dim)], dtype=np.uint64)
    v = (h % 10_000).astype(np.float64) / 10_000.0 - 0.5
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def hash_bytes(b: bytes, seed: int = 0) -> int:
    h = 0xCBF29CE484222325 ^ (seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    for byte in b:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, dict], np.ndarray] | None = None,
    deterministic_fake: bool = False,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """payload → feature vector (array<float>), Arrow-batched.

    ``decode_fn(payload, meta) -> np.ndarray`` plugs in a real decoder
    (PIL / torchaudio / ffmpeg). With neither a decode_fn nor
    deterministic_fake, raises NotImplementedError (clearly-marked
    stub, per the brief)."""
    if decode_fn is None and not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires an image/audio library not present in "
            "this container; pass decode_fn=... or deterministic_fake=True"
        )

    out_schema = "asset_id long, kind string, features array<float>"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                (decode_fn(p, m) if decode_fn else _fake_features(p, dim)).tolist()
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.select("asset_id", "kind", "payload", "meta").mapInPandas(
        _extract, out_schema
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: payload → payload' + updated meta. Decode is
    stubbed; the fake path re-stamps metadata deterministically so the
    schema/partition contract is testable."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.mime").alias("mime"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled timestamp
    (decode stubbed — frame payloads are None until a real decoder is
    plugged in; the row structure and partitioning are real)."""
    ts = F.sequence(
        F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms)
    )
    return media.filter(F.col("kind") == "video").select(
        "asset_id",
        F.explode(ts).alias("frame_ts_ms"),
        F.lit(None).cast("binary").alias("frame_payload"),
    )
