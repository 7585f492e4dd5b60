"""Engine configuration.

Mirrors the reference's pluggable ``TFIDFEngine`` trait
(/root/reference/src/vectorizer/tfidf.rs:21-50): the choice of vector
element dtype decides the TF quantize/denormalize chain.

  * ``f32`` / ``u32`` / ``u16``: tf stored as the raw count (cast); the
    denormalized tf used in scoring is the count itself
    (tfidf.rs:106-124, 150-168, 194-212).
  * ``f16`` (reference default, mod.rs:50): tf stored as
    ``float16(sqrt(count))`` and denormalized by squaring then truncating
    to an integer (tfidf.rs:79-91).  Lossy; we replicate the exact chain
    with numpy float16 so scores are bit-comparable.

IDF formula (tfidf.rs:32-40): ``idf(t) = doc_num / (df(t) + 1)`` as
float32 — NO logarithm; BM25 applies ``ln`` at scoring time
(scoring.rs:425).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_SUPPORTED_DTYPES = ("f16", "f32", "u16", "u32")


@dataclass(frozen=True)
class EngineConfig:
    """Scoring/indexing knobs, all defaulted to the reference defaults."""

    dtype: str = "f32"          # reference default is f16; f32 is exact
    k1: float = 1.2             # BM25 k1 (scoring.rs:32; canonical value)
    b: float = 0.75             # BM25 b
    block_size: int = 128       # docs per posting block (ours; ref has none)
    n_salts: int = 8            # doc-range salts for head-term skew
    term_buckets: int = 64      # hash buckets for postings partition pruning

    def __post_init__(self) -> None:
        if self.dtype not in _SUPPORTED_DTYPES:
            raise ValueError(f"dtype must be one of {_SUPPORTED_DTYPES}")

    # --- TF quantize / denormalize chain (tfidf.rs:61-213) -------------
    def tf_quantize(self, counts: np.ndarray) -> np.ndarray:
        """Raw term count -> stored tf value (vectorized)."""
        if self.dtype == "f16":
            return np.sqrt(counts.astype(np.float64)).astype(np.float16)
        if self.dtype == "f32":
            return counts.astype(np.float32)
        if self.dtype == "u16":
            return np.minimum(counts, np.iinfo(np.uint16).max).astype(np.uint16)
        return np.minimum(counts, np.iinfo(np.uint32).max).astype(np.uint32)

    def tf_denorm(self, stored: np.ndarray) -> np.ndarray:
        """Stored tf -> integer count used by scoring (tfidf.rs:88-91).

        f16: ``(v.to_f32())**2 as u32`` — square then truncate.
        Others: identity-ish cast (tfidf.rs:121-124,165-168,209-212).
        """
        if self.dtype == "f16":
            sq = stored.astype(np.float32) ** 2
            return sq.astype(np.uint32).astype(np.int64)
        return stored.astype(np.int64)

    def roundtrip_tf(self, counts: np.ndarray) -> np.ndarray:
        """count -> quantize -> denorm, the effective tf seen by scorers."""
        return self.tf_denorm(self.tf_quantize(np.asarray(counts)))


DEFAULT = EngineConfig()
