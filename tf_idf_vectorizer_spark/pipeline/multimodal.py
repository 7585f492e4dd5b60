"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The IMAGE path is real end-to-end with zero dependencies: a pure-numpy
decoder for netpbm P5/P6 and uncompressed 24-bit BMP
(:func:`decode_image`), nearest-neighbour :func:`resize_image`, and a
16-dim :func:`image_features` descriptor, wired through
``extract_features(fake=False)``.  Compressed formats (JPEG/PNG) and
the audio/video kernels still need codec libraries this container does
not ship — those raise NotImplementedError, and the deterministic
md5 fake remains the cross-engine-oracle default (``fake=True``).

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


def _ppm_header(data: bytes):
    """Parse a P5/P6 netpbm header -> (magic, width, height, maxval,
    payload offset).  Whitespace/comment handling per the spec."""
    tokens, i, n = [], 2, len(data)
    while len(tokens) < 3 and i < n:
        c = data[i:i + 1]
        if c == b"#":
            while i < n and data[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not data[j:j + 1].isspace():
                j += 1
            tokens.append(int(data[i:j]))
            i = j
    i += 1  # single whitespace byte after maxval
    w, h, maxval = tokens
    return w, h, maxval, i


_IMAGE_DECODERS: list[tuple] = []


def register_image_decoder(sniff, decode):
    """Plugin seam for formats the built-in pure-numpy path cannot
    handle (JPEG/PNG need a codec library this container lacks; a
    deployment that ships one injects it HERE without touching the
    pipeline).  ``sniff(data) -> bool`` claims the format from magic
    bytes; ``decode(data) -> np.ndarray`` returns (h, w[, 3]) uint8
    pixels.  Registered decoders are consulted after the built-ins, and
    :func:`extract_features` snapshots the registry into its
    mapInPandas closure at PLAN time — so plugins are pickled and
    shipped to executors with the task (a bare module global would be
    driver-only on a real cluster).  Returns an unregister callable."""
    entry = (sniff, decode)
    _IMAGE_DECODERS.append(entry)

    def _unregister() -> None:
        try:
            _IMAGE_DECODERS.remove(entry)
        except ValueError:
            pass

    return _unregister


def decode_image(data: bytes, plugins=None) -> "np.ndarray":
    """REAL image decoder, pure numpy (this container has no imaging
    libraries, but netpbm P5/P6 and uncompressed 24-bit BMP need none):

    - P6 (binary PPM)  -> (h, w, 3) uint8
    - P5 (binary PGM)  -> (h, w) uint8
    - BM (24-bit BI_RGB BMP) -> (h, w, 3) uint8 (rows flipped to
      top-down, BGR -> RGB)

    Other formats fall through to ``plugins`` (default: the decoders
    injected via :func:`register_image_decoder`), then raise
    NotImplementedError (JPEG/PNG genuinely need a codec library)."""
    if data[:2] in (b"P6", b"P5"):
        w, h, maxval, off = _ppm_header(data)
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm not supported")
        ch = 3 if data[:2] == b"P6" else 1
        px = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=off)
        return px.reshape((h, w, 3)) if ch == 3 else px.reshape((h, w))
    if data[:2] == b"BM":
        off = int.from_bytes(data[10:14], "little")
        hdr_sz = int.from_bytes(data[14:18], "little")
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        comp = int.from_bytes(data[30:34], "little")
        if hdr_sz < 40 or bpp != 24 or comp != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP")
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=off
        ).reshape((h, stride))[:, : w * 3].reshape((h, w, 3))
        if not top_down:
            rows = rows[::-1]
        return rows[..., ::-1].copy()  # BGR -> RGB
    for sniff, decode in (_IMAGE_DECODERS if plugins is None else plugins):
        if sniff(data):
            return decode(data)
    raise NotImplementedError(
        "unsupported image format (pure-numpy decoder handles P5/P6 "
        "netpbm and 24-bit BMP; JPEG/PNG need an imaging library) — "
        "use fake=True for the deterministic stand-in features"
    )


def resize_image(arr: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbour resize, pure numpy — the resize step of the
    decode/feature pipeline (vectorized integer index sampling)."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[yi][:, xi]


def image_features(arr: "np.ndarray", dim: int = FEATURE_DIM) -> np.ndarray:
    """Real 16-dim image descriptor from decoded pixels: per-channel
    mean/std (6), aspect + log-area (2), 8-bin grayscale histogram —
    deterministic, library-free."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    px = arr.astype(np.float32)
    mean = px.mean(axis=(0, 1)) / 255.0
    std = px.std(axis=(0, 1)) / 255.0
    h, w = arr.shape[:2]
    gray = px.mean(axis=2)
    hist = np.histogram(gray, bins=8, range=(0.0, 256.0))[0]
    hist = hist.astype(np.float32) / max(1, gray.size)
    out = np.concatenate(
        [
            mean, std,
            np.array([w / max(1, h), np.log1p(float(h * w)) / 20.0],
                     dtype=np.float32),
            hist,
        ]
    ).astype(np.float32)
    return out[:dim]


def _fake_features(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature vector: md5 of the bytes -> dim floats
    in [-1, 1).  Stands in for a real encoder; stable across runs."""
    h = hashlib.md5(data).digest()
    raw = np.frombuffer((h * ((dim * 2) // len(h) + 1))[: dim * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 32768.0) - 1.0


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Map-only feature extraction over binary media columns.
    -> (doc_id, media_type, features array<float>).

    ``fake=True`` (the oracle-checked default) hashes the bytes into a
    deterministic vector.  ``fake=False`` runs the REAL pipeline on
    image rows: pure-numpy decode (P5/P6/BMP) -> :func:`image_features`
    descriptor (built-in P5/P6/BMP plus any decoders injected via
    :func:`register_image_decoder`, snapshotted here so they ship
    inside the task closure); audio/video rows still raise inside the
    kernel (no codec libraries in this container)."""
    plugins = tuple(_IMAGE_DECODERS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [
                    _fake_features(bytes(b)).tolist() for b in pdf["media"]
                ]
            else:
                feats = []
                for b, mt in zip(pdf["media"], pdf["media_type"]):
                    if mt != "image":
                        raise NotImplementedError(
                            f"real {mt} decoding needs codec libraries"
                        )
                    feats.append(
                        image_features(
                            decode_image(bytes(b), plugins=plugins)
                        ).tolist()
                    )
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
