"""Posting-list codec: round-trip, edge values, delta encoding."""

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from ts_type_filter_ray.state.postings import (decode_doc_ids, decode_varints,
                                               encode_doc_ids, encode_varints)


def test_empty():
    assert encode_varints([]) == b""
    assert decode_varints(b"").size == 0
    assert encode_doc_ids(np.array([], dtype=np.int64)) == b""
    assert decode_doc_ids(b"").size == 0


def test_known_values():
    # single-byte varints
    assert encode_varints([0, 1, 127]) == bytes([0, 1, 127])
    # 128 → two bytes 0x80 0x01
    assert encode_varints([128]) == bytes([0x80, 0x01])
    assert decode_varints(bytes([0x80, 0x01])).tolist() == [128]


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_round_trip(values):
    assert decode_varints(encode_varints(values)).tolist() == values


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200,
                unique=True))
def test_doc_ids_round_trip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    assert decode_doc_ids(encode_doc_ids(arr)).tolist() == arr.tolist()


def test_delta_compression_is_compact():
    # dense ascending ids → ~1 byte each after delta
    ids = np.arange(1_000_000, 1_010_000, dtype=np.int64)
    enc = encode_doc_ids(ids)
    assert len(enc) < 3 + len(ids) * 1.01
