"""Delta + varint posting-block codec.

The reference stores raw 8-byte SentenceIds ("optimizes for performance
over file size", reference README.md:5; storage/src/store.rs:126-137).
The north rule requires delta+varint compression, so posting blocks store:

  * ``docids``: strictly increasing packed (doc_id << TURN_BITS | turn_idx)
    ids, delta-encoded (first value absolute) then LEB128-varint bytes.
  * ``tfs`` / ``dls``: small positive ints, varint bytes.

Encoding runs once at build time inside a pandas UDF (per-block Python is
fine there); decoding is on the query hot path, so it is numpy-vectorized:
continuation bits are masked in bulk and group boundaries recovered with
cumulative sums — no per-byte Python.
"""

from __future__ import annotations

import numpy as np

TURN_BITS = 20  # turn_idx < 2^20 per conversation (asserted at build)


def pack_id(doc_id: int, turn_idx: int) -> int:
    return (int(doc_id) << TURN_BITS) | int(turn_idx)


def unpack_id(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return packed >> TURN_BITS, packed & ((1 << TURN_BITS) - 1)


def varint_encode(values) -> bytes:
    """LEB128 encode a sequence of non-negative ints."""
    out = bytearray()
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError("varint requires non-negative values")
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def varint_decode(buf: bytes) -> np.ndarray:
    """Vectorized LEB128 decode → int64 array.

    Works in bulk: find terminator bytes (high bit clear), assign each
    byte to its value-group via cumsum, then combine 7-bit payloads with
    per-byte shifts using np.add.reduceat.
    """
    if not buf:
        return np.empty(0, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_end = (raw & 0x80) == 0
    # group index of each byte: number of terminators before it
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (raw & 0x7F).astype(np.int64)
    # shift of each byte within its group = position - group start
    group_of_byte = np.cumsum(is_end) - is_end  # 0-based group per byte
    byte_pos = np.arange(len(raw), dtype=np.int64) - starts[group_of_byte]
    shifted = payload << (7 * byte_pos)
    return np.add.reduceat(shifted, starts)


def delta_encode(sorted_ids) -> bytes:
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return b""
    d = np.empty_like(a)
    d[0] = a[0]
    d[1:] = np.diff(a)
    if a.size > 1 and d[1:].min() <= 0:
        raise ValueError("ids must be strictly increasing")
    return varint_encode(d)


def delta_decode(buf: bytes) -> np.ndarray:
    d = varint_decode(buf)
    return np.cumsum(d)
