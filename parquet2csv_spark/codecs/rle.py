"""Run-length encoding over int64 code vectors.

Used directly for integer columns and, composed with the dictionary codec,
for low-cardinality string columns (repo / lang / commit in the corpus —
BASELINE.json north_star). Runs are detected vectorized; run values and run
lengths are each frame-of-reference bit-packed.

Body layout::

    uint32 n_runs
    uint32 len(run_values_body)
    [run_values_body: FOR frame]
    [run_lengths_body: FOR frame]
"""

from __future__ import annotations

import struct

import numpy as np

from . import foref

_HDR = struct.Struct("<II")


def run_starts(values: np.ndarray) -> np.ndarray:
    """Boolean mask of run starts (vectorized)."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    starts = np.empty(len(values), dtype=bool)
    starts[0] = True
    np.not_equal(values[1:], values[:-1], out=starts[1:])
    return starts


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    starts = run_starts(v)
    idx = np.flatnonzero(starts)
    run_values = v[idx]
    run_lengths = np.diff(np.append(idx, len(v))).astype(np.int64)
    vals_body = foref.encode(run_values)
    lens_body = foref.encode(run_lengths)
    return _HDR.pack(len(idx), len(vals_body)) + vals_body + lens_body


def decode(body: bytes) -> np.ndarray:
    n_runs, vlen = _HDR.unpack_from(body, 0)
    off = _HDR.size
    run_values = foref.decode(body[off : off + vlen], n_runs)
    run_lengths = foref.decode(body[off + vlen :], n_runs)
    return np.repeat(run_values, run_lengths)


def count_runs(values: np.ndarray) -> int:
    return int(run_starts(np.asarray(values)).sum())
