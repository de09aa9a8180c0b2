"""FSST-style static symbol-table compression for string blobs.

From-scratch implementation in the spirit of FSST (Boncz, Neumann, Leis:
"FSST: Fast Random Access String Compression", VLDB 2020): a small static
table of multi-byte symbols, each replaced by a 1-byte code, trained on a
sample, giving fast, random-access-friendly decompression.

Construction here is digram-based (RePair-style): codes are drawn from byte
values *unused* in the chunk's blob, and each code expands to a pair of
previously-valid bytes/codes — so symbols are effectively 2..2^k bytes after
recursive expansion. Encoding and decoding are sequences of
``bytes.replace`` calls (C-speed, memchr-based) — zero per-value Python,
which is what makes this viable in a pandas/Arrow UDF (input_hint: no
per-row Python).

Source-code text typically occupies well under 200 distinct byte values,
leaving ample code space. Blobs with no unused byte values are rejected
(``train`` returns an empty table) and the selector falls back to
dict/plain/zlib.

Table layout (in frame body)::

    uint8  n_merges
    n_merges × (uint8 code, uint8 left, uint8 right)   # in training order
    [encoded blob]

Decode replays merges in reverse: ``blob.replace(code, left+right)``.
"""

from __future__ import annotations

import numpy as np

MAX_MERGES = 200
_SAMPLE = 1 << 16  # 64 KiB training sample


def train(
    blob: bytes,
    max_merges: int = MAX_MERGES,
    min_gain_frac: float = 1 / 512,
) -> list[tuple[int, int, int]]:
    """Learn merge table from ``blob``. Returns [(code, left, right), ...].

    ``min_gain_frac``: stop when the best pair's sample frequency drops
    below this fraction of the sample — each accepted merge costs one
    full-blob replace pass at compress AND decompress time, so low-gain
    merges trade real throughput for negligible ratio.
    """
    if len(blob) < 64:
        return []
    # presence scatter: one vectorized pass (np.bincount on uint8 takes a
    # pathologically slow path — 3s on an 11MB blob)
    present = np.zeros(256, dtype=bool)
    present[np.frombuffer(blob, dtype=np.uint8)] = True
    free = np.flatnonzero(~present).tolist()
    if not free:
        return []
    # stride-sample the blob so the table sees head, middle and tail
    if len(blob) > _SAMPLE:
        step = len(blob) // (_SAMPLE // 4096)
        sample = b"".join(
            blob[i : i + 4096] for i in range(0, len(blob), max(step, 4096))
        )[:_SAMPLE]
    else:
        sample = blob
    merges: list[tuple[int, int, int]] = []
    work = sample
    min_gain = max(8, int(len(sample) * min_gain_frac))
    for code in free[: min(max_merges, len(free))]:
        arr = np.frombuffer(work, dtype=np.uint8)
        if len(arr) < 2:
            break
        pair_ids = arr[:-1].astype(np.uint16) * 256 + arr[1:]
        pair_counts = np.bincount(pair_ids, minlength=65536)
        best = int(pair_counts.argmax())
        if pair_counts[best] < min_gain:
            break
        left, right = best >> 8, best & 0xFF
        merges.append((code, left, right))
        work = work.replace(bytes((left, right)), bytes((code,)))
    return merges


def reusable(blob: bytes, merges: list[tuple[int, int, int]]) -> bool:
    """A trained table transfers to another blob iff none of its code bytes
    occur there (invertibility condition). One vectorized presence pass."""
    if not merges:
        return False
    present = np.zeros(256, dtype=bool)
    present[np.frombuffer(blob, dtype=np.uint8)] = True
    return not any(present[code] for code, _, _ in merges)


def compress(blob: bytes, merges: list[tuple[int, int, int]]) -> bytes:
    for code, left, right in merges:
        blob = blob.replace(bytes((left, right)), bytes((code,)))
    return blob


def decompress(blob: bytes, merges: list[tuple[int, int, int]]) -> bytes:
    for code, left, right in reversed(merges):
        blob = blob.replace(bytes((code,)), bytes((left, right)))
    return blob


def serialize_table(merges: list[tuple[int, int, int]]) -> bytes:
    out = bytearray([len(merges)])
    for code, left, right in merges:
        out += bytes((code, left, right))
    return bytes(out)


def deserialize_table(body: bytes) -> tuple[list[tuple[int, int, int]], int]:
    """Returns (merges, bytes consumed)."""
    n = body[0]
    merges = [
        (body[1 + 3 * i], body[2 + 3 * i], body[3 + 3 * i]) for i in range(n)
    ]
    return merges, 1 + 3 * n
