"""Frame-of-reference (FOR) codec for int64 vectors.

Stores ``min`` as the frame of reference and bit-packs the non-negative
deltas (SURVEY.md §7 step 2). Negative values and full-range int64 are
handled by doing the subtraction in wrapping uint64 arithmetic.

Body layout::

    int64  reference (min value)
    uint8  delta bit width
    [packed deltas]
"""

from __future__ import annotations

import struct

import numpy as np

from . import bitpack

_HDR = struct.Struct("<qB")


def encode(values: np.ndarray) -> bytes:
    """values: int64 ndarray (non-empty handled; empty → header only)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return _HDR.pack(0, 0)
    lo = int(v.min())
    # wrapping subtraction: (v - lo) mod 2^64 is correct for any int64 pair
    deltas = v.astype(np.uint64) - np.int64(lo).astype(np.uint64)
    width = bitpack.bit_width(int(deltas.max()))
    return _HDR.pack(lo, width) + bitpack.pack(deltas, width)


def decode(body: bytes, n: int) -> np.ndarray:
    lo, width = _HDR.unpack_from(body, 0)
    deltas = bitpack.unpack(body[_HDR.size :], n, width)
    return (deltas + np.int64(lo).astype(np.uint64)).astype(np.int64)


def encoded_size(n: int, value_range: int) -> int:
    """Cost-model helper for the selector: bytes for n values of given range."""
    w = bitpack.bit_width(max(0, value_range))
    return _HDR.size + (n * w + 7) // 8
