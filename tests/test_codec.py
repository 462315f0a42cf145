import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from joie_spark.functions.codec import (
    delta_decode,
    delta_encode,
    pack_id,
    unpack_id,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_simple():
    vals = [0, 1, 127, 128, 300, 2**20, 2**35]
    assert varint_decode(varint_encode(vals)).tolist() == vals


def test_empty():
    assert varint_decode(b"").size == 0
    assert delta_encode([]) == b""
    assert delta_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**55), max_size=200))
def test_varint_roundtrip_property(vals):
    assert varint_decode(varint_encode(vals)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**55), min_size=1, max_size=200))
def test_delta_roundtrip_property(ids):
    sorted_ids = sorted(ids)
    assert delta_decode(delta_encode(sorted_ids)).tolist() == sorted_ids


def test_pack_unpack():
    p = pack_id(123456, 789)
    doc, turn = unpack_id(np.array([p], dtype=np.int64))
    assert (doc[0], turn[0]) == (123456, 789)
    # ordering preserved
    assert pack_id(1, 2) < pack_id(1, 3) < pack_id(2, 0)
