"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container — ``decode_image`` raises NotImplementedError unless the
deterministic fake is requested), but the Spark-side contract is real
and tested: schema, Arrow batch shape, partitioning, and the
mapInPandas UDF signatures are exactly what a real decoder would use —
swap ``_fake_features`` for PIL/librosa and nothing else changes.

Scale notes: media bytes never pass through a shuffle — feature
extraction is a map-only stage (mapInPandas) running where the bytes
were read; only the small (doc_id, features) output shuffles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int, "
    "duration_ms int"
)
FEATURE_DIM = 16
_FEATURE_SCHEMA = f"doc_id long, media_type string, features array<float>"


def _md5_head_int(prefix: str, key_col: str, n_hex: int) -> "F.Column":
    """First n_hex hex chars of md5(prefix || key) as an int — md5 is the
    only hash both Spark and DuckDB compute identically, which is what
    lets the multimodal gates run under the cross-engine oracle."""
    h = F.md5(F.encode(F.concat(F.lit(prefix), F.col(key_col).cast("string")), "UTF-8"))
    return F.conv(F.substring(h, 1, n_hex), 16, 10).cast("long")


def attach_fake_media(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic opaque media column from each doc (stands
    in for a real (url -> bytes) fetch; exercises the binary plumbing).
    All metadata derives from md5 so a DuckDB oracle reproduces it."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(_md5_head_int("MT:", key_col, 1), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col(key_col).alias("doc_id"),
        F.encode(F.concat(F.lit("MEDIA:"), F.col(key_col).cast("string")), "UTF-8").alias("media"),
        mt.alias("media_type"),
        (F.pmod(_md5_head_int("W:", key_col, 4), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(_md5_head_int("H:", key_col, 4), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(_md5_head_int("DUR:", key_col, 4), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
    )


def decode_image(data: bytes) -> "np.ndarray":
    """Real decoder stub — the container has no imaging libraries."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; use fake=True for the "
        "deterministic stand-in features"
    )


def _fake_features(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature vector: md5 of the bytes -> dim floats
    in [-1, 1).  Stands in for a real encoder; stable across runs."""
    h = hashlib.md5(data).digest()
    raw = np.frombuffer((h * ((dim * 2) // len(h) + 1))[: dim * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 32768.0) - 1.0


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Map-only feature extraction over binary media columns.
    -> (doc_id, media_type, features array<float>)."""
    if not fake:
        # the real path would dispatch on media_type to PIL/librosa here
        raise NotImplementedError("only the deterministic fake encoder is available")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(bytes(b)).tolist() for b in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.select("doc_id", "media", "media_type").mapInPandas(
        kernel, schema=_FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan* for video rows: one row per frame timestamp
    (the decode itself is the stubbed kernel).  Built-ins only —
    sequence + explode; no Python.
    -> (doc_id, frame_ts_ms)."""
    vids = media.filter(F.col("media_type") == "video")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (F.col("duration_ms") - 1).cast("long"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )
