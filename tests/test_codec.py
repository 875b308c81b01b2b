"""Property tests for the delta-gap + varint posting codec (FIXTURES.md §3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bzzz_spark.build.codec import (
    decode_block,
    decode_varints,
    encode_block,
    encode_varints,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.int64)
    assert decode_varints(encode_varints(arr)).tolist() == values


def test_varint_boundaries():
    # every 7-bit group boundary
    vals = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**62]
    arr = np.array(vals, dtype=np.int64)
    assert decode_varints(encode_varints(arr), len(vals)).tolist() == vals


def test_varint_single_byte_density():
    # gaps < 128 must cost exactly one byte each (the point of the codec)
    arr = np.arange(1, 101, dtype=np.int64)  # gaps all 1..100
    assert len(encode_varints(np.diff(arr))) == 99


@given(
    st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=300),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(docid_set, data):
    docids = np.array(sorted(docid_set), dtype=np.int64)
    tfs = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=10**6),
                min_size=len(docids),
                max_size=len(docids),
            )
        ),
        dtype=np.int64,
    )
    first, count, gaps, tfb = encode_block(docids, tfs)
    d2, t2 = decode_block(first, count, gaps, tfb)
    assert d2.tolist() == docids.tolist()
    assert t2.tolist() == tfs.tolist()


def test_block_rejects_unsorted():
    import pytest

    with pytest.raises(ValueError):
        encode_block(np.array([5, 3]), np.array([1, 1]))
