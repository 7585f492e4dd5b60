"""Delta + varint posting-block codec, numpy-vectorized.

The reference keeps postings as raw ``Vec<u32>`` per term
(/root/reference/src/vectorizer/mod.rs:57-61) and planned, but never
built, a compressed bitmap layout (memo.md:3-5).  The north rule asks for
docID-sorted, delta+varint-compressed blocks with per-block max-score
metadata — this module is that codec.

Both directions are vectorized numpy (no per-element Python loops): the
encoder computes per-value LEB128 byte counts with nine comparisons and
scatters payload bytes by cumulative offsets; the decoder classifies
continuation bits and reduces per-value byte groups with
``np.add.reduceat``.  Inside an Arrow batch this is the only Python that
touches posting data, and it runs at memory bandwidth.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [1 << (7 * i) for i in range(1, 10)]  # 2^7 .. 2^63


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= np.uint64(t)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > j
        out[starts[mask] + j] = chunk.astype(np.uint8) | (
            cont.astype(np.uint8) << 7
        )
    return out.tobytes()


def encode_varint_blocks(
    values: np.ndarray, block_starts: np.ndarray
) -> list[bytes]:
    """LEB128-encode one array and split the output at block boundaries.

    Encoding the whole Arrow batch at once and slicing per block is what
    keeps the packer vectorized: one set of numpy passes for millions of
    postings instead of per-block calls.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return []
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= np.uint64(t)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > j
        out[starts[mask] + j] = chunk.astype(np.uint8) | (
            cont.astype(np.uint8) << 7
        )
    # byte range of each block
    bstart = starts[block_starts]
    bend = np.append(bstart[1:], len(out))
    raw = out.tobytes()
    return [raw[s:e] for s, e in zip(bstart, bend)]


def decode_varint(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_varint` -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    # start of each value = position after the previous terminator
    starts = np.empty(int(is_end.sum()), dtype=np.int64)
    starts[0] = 0
    ends = np.flatnonzero(is_end)
    starts[1:] = ends[:-1] + 1
    # byte position within its value
    pos = np.arange(b.size, dtype=np.int64)
    pos -= np.repeat(starts, np.diff(np.append(starts, b.size)))
    vals = (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64)
    return np.add.reduceat(vals, starts)


def encode_deltas(doc_ids: np.ndarray) -> bytes:
    """Sorted doc ids -> varint(first, gap1, gap2, ...)."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if ids.size == 0:
        return b""
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    return encode_varint(deltas)


def decode_deltas(buf: bytes) -> np.ndarray:
    deltas = decode_varint(buf)
    return np.cumsum(deltas, dtype=np.uint64)


def encode_tfs(tfs: np.ndarray) -> bytes:
    """Term frequencies (parallel to doc ids) -> varint stream."""
    return encode_varint(np.ascontiguousarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes) -> np.ndarray:
    return decode_varint(buf)
