"""Codec invariants — the analog of the reference's wavelet-tree self-test
(reference: ssa/HuffAlphabetRank.cpp:149-164 re-counts every rank)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from full_text_index_spark.codec import (
    decode_gaps,
    encode_gaps,
    varbyte_decode,
    varbyte_encode,
)


@pytest.mark.parametrize("n", [0, 1, 127, 128, 10_000])
def test_varbyte_roundtrip_sizes(n):
    rng = np.random.default_rng(7 + n)
    vals = rng.integers(0, 2**40, size=n, dtype=np.int64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_varbyte_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**62, 2**63 - 1],
        dtype=np.uint64,
    )
    out = varbyte_decode(varbyte_encode(vals))
    assert np.array_equal(out.astype(np.uint64), vals)


def test_varbyte_single_byte_values_are_compact():
    vals = np.arange(128)
    assert len(varbyte_encode(vals)) == 128


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
@settings(max_examples=50, deadline=None)
def test_varbyte_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.int64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True
    )
)
@settings(max_examples=50, deadline=None)
def test_gap_roundtrip_property(xs):
    docs = np.array(sorted(xs), dtype=np.int64)
    assert np.array_equal(decode_gaps(encode_gaps(docs)), docs)


def test_gap_block_local_decode():
    """Any suffix of the gap stream decodes with just the previous block's
    last docID — the skip-directory contract used by the WAND kernel."""
    docs = np.array([3, 4, 9, 100, 101, 2**33, 2**33 + 5], dtype=np.int64)
    buf = np.frombuffer(encode_gaps(docs), dtype=np.uint8)
    # find byte offsets of each value (re-derive: decode sizes via high bits)
    is_last = (buf & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate([[0], ends[:-1] + 1])
    for split in range(1, len(docs)):
        tail = buf[starts[split]:]
        out = decode_gaps(tail, prev_last_doc=int(docs[split - 1]))
        assert np.array_equal(out, docs[split:])


def test_encode_gaps_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_gaps(np.array([5, 4]))
    with pytest.raises(ValueError):
        encode_gaps(np.array([5, 5]))
