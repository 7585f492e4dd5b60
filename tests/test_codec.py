"""Property tests for the delta+varint posting codec (SURVEY.md §5
layer (a); fixture shapes from FIXTURES.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tf_idf_vectorizer_spark.operators.codec import (
    decode_deltas,
    decode_varint,
    encode_deltas,
    encode_varint,
)

LENGTHS = [0, 1, 2, 31, 32, 33, 1024, 100_000]


@pytest.mark.parametrize("n", LENGTHS)
def test_varint_roundtrip_random(n):
    rng = np.random.default_rng(0xC0FFEE)  # seed style: index_map.rs:754
    v = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(v)), v)


@pytest.mark.parametrize("n", LENGTHS)
def test_delta_roundtrip_sorted(n):
    rng = np.random.default_rng(42)
    gaps = rng.integers(1, 10_000, size=n, dtype=np.uint64)
    ids = np.cumsum(gaps, dtype=np.uint64)
    assert np.array_equal(decode_deltas(encode_deltas(ids)), ids)


def test_extremes():
    v = np.array([0, 1, 127, 128, 2**32 - 1, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(v)), v)


def test_gap_one_and_huge():
    ids = np.array([5, 6, 7, 2**40, 2**40 + 1], dtype=np.uint64)
    assert np.array_equal(decode_deltas(encode_deltas(ids)), ids)


def test_compression_ratio_small_gaps():
    """Dense postings (gap ~1) must compress to ~1 byte per id."""
    ids = np.arange(0, 100_000, dtype=np.uint64)
    buf = encode_deltas(ids)
    assert len(buf) < 100_000 + 10


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_hypothesis(xs):
    v = np.array(xs, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(v)), v)


@given(
    st.lists(st.integers(min_value=1, max_value=2**32), min_size=1, max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_hypothesis(gaps):
    ids = np.cumsum(np.array(gaps, dtype=np.uint64), dtype=np.uint64)
    assert np.array_equal(decode_deltas(encode_deltas(ids)), ids)
