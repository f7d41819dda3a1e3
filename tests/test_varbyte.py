import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.index.varbyte import (
    decode_position_lists,
    decode_sorted,
    delta_decode,
    delta_encode,
    encode_position_lists,
    encode_sorted,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


def test_vb_reference_layout():
    # big-endian base-128, MSB set on terminator (VariableByteEncoding.java)
    assert vb_encode(np.array([0])) == bytes([0x80])
    assert vb_encode(np.array([5])) == bytes([0x85])
    assert vb_encode(np.array([127])) == bytes([0xFF])
    assert vb_encode(np.array([128])) == bytes([0x01, 0x80])
    assert vb_encode(np.array([214577])) == bytes([0x0D, 0x0C, 0xB1 | 0x80 & 0xFF])


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=100)
)
@settings(max_examples=100, deadline=None)
def test_sorted_roundtrip(xs):
    arr = np.sort(np.array(xs, dtype=np.int64))
    assert np.array_equal(decode_sorted(encode_sorted(arr)), arr)


def test_delta():
    a = np.array([3, 7, 7, 20], dtype=np.int64)
    assert list(delta_encode(a)) == [3, 4, 0, 13]
    assert np.array_equal(delta_decode(delta_encode(a)), a)


def test_position_lists_roundtrip():
    lists = [np.array([1, 5, 9]), np.array([2]), np.array([100, 101])]
    tfs = np.array([3, 1, 2])
    out = decode_position_lists(encode_position_lists(lists), tfs)
    for got, want in zip(out, lists):
        assert np.array_equal(got, want)


def test_positions_flat_matches_nested():
    import numpy as np

    from searchengine_spark.index.varbyte import (
        encode_position_lists,
        encode_positions_flat,
    )

    lists = [np.array([1, 5, 9]), np.array([2]), np.array([3, 4, 100, 200])]
    flat = np.concatenate(lists)
    tfs = np.array([len(x) for x in lists])
    assert encode_positions_flat(flat, tfs) == encode_position_lists(lists)
    assert encode_positions_flat(np.array([], dtype=np.int64), np.array([], dtype=np.int64)) == b""


def test_position_lists_empty():
    assert encode_position_lists([]) == b""
    assert decode_position_lists(b"", np.array([], dtype=np.int64)) == []
