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
MAX_DEPTH = 4   # compress/decompress do one vectorized pass per level
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
    present[0] = True  # code 0 is the compressor's no-match sentinel
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
    depth = [0] * 256  # cap table depth: each level is one full-blob pass
    for code in free[: min(max_merges, len(free))]:
        arr = np.frombuffer(work, dtype=np.uint8)
        if len(arr) < 2:
            break
        pair_ids = arr[:-1].astype(np.uint16) * 256 + arr[1:]
        pair_counts = np.bincount(pair_ids, minlength=65536)
        while True:
            best = int(pair_counts.argmax())
            if pair_counts[best] < min_gain:
                best = -1
                break
            left, right = best >> 8, best & 0xFF
            if max(depth[left], depth[right]) < MAX_DEPTH:
                break
            pair_counts[best] = 0  # too deep — try the next-best pair
        if best < 0:
            break
        depth[code] = max(depth[left], depth[right]) + 1
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


def _levels(merges: list[tuple[int, int, int]]) -> list[list[tuple[int, int, int]]]:
    """Group merges by dependency depth: a merge whose pair contains an
    earlier code must run after that code exists. Within a level all pairs
    can be substituted in ONE vectorized pass — this is what turns ~60
    full-blob passes into ~8-12 (the replace-per-merge form is memory-
    bandwidth-bound and stops scaling beyond a few cores)."""
    depth = [0] * 256
    levels: list[list[tuple[int, int, int]]] = []
    for code, left, right in merges:
        d = max(depth[left], depth[right])
        depth[code] = d + 1
        while len(levels) <= d:
            levels.append([])
        levels[d].append((code, left, right))
    return levels


_TILE = 1 << 18  # 256 KiB tiles: every level's temporaries stay cache-resident
                 # (decompress doubles the tile, so small tiles win — measured
                 # 256K: 21 MB/s comp + 19 MB/s dec vs 17/6 at 1 MiB)

_EVEN = np.zeros(_TILE, dtype=bool)
_EVEN[::2] = True


def _level_luts(levels: list[list[tuple[int, int, int]]]) -> list[np.ndarray]:
    """One pair→code LUT per level, built once per compress() call — the
    tables are identical for every tile, and rebuilding 64 KiB LUTs inside
    the per-tile loop showed up in the r6 encode profile."""
    luts = []
    for level in levels:
        lut = np.zeros(65536, dtype=np.uint8)
        for code, left, right in level:
            lut[(left << 8) | right] = code
        luts.append(lut)
    return luts


def _compress_tile(arr: np.ndarray, luts: list[np.ndarray]) -> np.ndarray:
    for lut in luts:
        n = len(arr)
        if n < 2:
            break
        pair_ids = (arr[:-1].astype(np.uint16) << np.uint16(8)) | arr[1:]
        m = lut[pair_ids]
        match = m != 0
        if not match.any():
            continue
        # overlap resolution, parity-greedy: even-index matches can never
        # conflict with each other (2 apart); an odd-index match survives
        # only when neither even neighbor matched. Contiguous shifted
        # copies beat half-size strided views here (strided boolean ops
        # defeat numpy's vector kernels — measured ~2.5× slower).
        prev = np.empty_like(match)
        prev[0] = False
        prev[1:] = match[:-1]
        nxt = np.empty_like(match)
        nxt[-1] = False
        nxt[:-1] = match[1:]
        keep = match & (_EVEN[: n - 1] | (~prev & ~nxt))
        ki = np.flatnonzero(keep)  # sparse positions: O(k) writes, not O(n)
        # delete absorbed bytes first, then patch codes at their shifted
        # slots: kept matches are ≥2 apart, so exactly j deletions precede
        # kept match j and its new index is ki[j] - j (avoids the full
        # arr.copy() of the substitute-then-delete form). Hand-built mask +
        # boolean index instead of np.delete: identical output, but
        # np.delete's Python-level generality cost ~17% of the whole
        # single-thread encode in the r6 profile
        mask = np.ones(n, dtype=bool)
        mask[ki + 1] = False
        out = arr[mask]
        out[ki - np.arange(len(ki))] = m[ki]
        arr = out
    return arr


def compress(blob: bytes, merges: list[tuple[int, int, int]]) -> bytes:
    """Tiled, level-batched vectorized substitution. Produces a valid
    (greedy, non-overlapping) parsing; decode is table-driven and
    independent of parse choices, so any valid parsing round-trips
    bit-exactly — which is also why tiling is sound: a pair spanning a tile
    boundary is simply never merged (one potential merge lost per MiB).

    Tiling is the throughput/scaling fix: running every level while the
    tile is hot in cache turns ~15 DRAM passes per level over the full blob
    into cache-resident work — the untiled form was memory-bandwidth-bound
    and stopped scaling beyond a few cores (single shared bus)."""
    if not merges:
        # the decode pipeline passes memoryviews; honor the declared
        # ``bytes`` return type even on the no-op path
        return bytes(blob)
    luts = _level_luts(_levels(merges))
    full = np.frombuffer(blob, dtype=np.uint8)
    if len(full) <= _TILE:
        return _compress_tile(full, luts).tobytes()
    tiles = [
        _compress_tile(full[t : t + _TILE], luts)
        for t in range(0, len(full), _TILE)
    ]
    return np.concatenate(tiles).tobytes()


def _expansion_table(merges: list[tuple[int, int, int]]) -> tuple[np.ndarray, np.ndarray]:
    """(mat, lens): per-byte FULL recursive expansion. Codes expand to at
    most 2^MAX_DEPTH bytes; literals expand to themselves. Merges are in
    training order, so a pair's left/right are always already expandable."""
    exp: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    for code, left, right in merges:
        exp[code] = exp[left] + exp[right]
    max_len = max(len(v) for v in exp.values())
    mat = np.zeros((256, max_len), dtype=np.uint8)
    lens = np.ones(256, dtype=np.uint8)
    for c, v in exp.items():
        mat[c, : len(v)] = np.frombuffer(v, dtype=np.uint8)
        lens[c] = len(v)
    return mat, lens


def _mask_table(lens: np.ndarray, max_len: int) -> np.ndarray:
    """(256, max_len) bool: masktab[b, j] = j < lens[b] — the valid slots
    of each byte's full expansion (built once per decompress call)."""
    return np.arange(max_len, dtype=np.uint8)[None, :] < lens[:, None]


def _expand_tile(arr: np.ndarray, mat: np.ndarray, masktab: np.ndarray) -> np.ndarray:
    """Grid-gather variable-length expansion: gather every input byte's
    full (max_len-wide, zero-padded) expansion row plus its validity row,
    then boolean-select — row-major selection IS concatenation order.
    Replaces the np.repeat/cumsum/arange index-array form, whose three
    int64 temporaries touched ~24 bytes per output byte (measured 1.15×
    on the profiling corpus; output bytes are identical)."""
    grid = mat[arr]
    mask = masktab[arr]
    return grid[mask]


def decompress(blob: bytes, merges: list[tuple[int, int, int]]) -> bytes:
    """Tiled single-pass vectorized expansion via the full-expansion
    table. Expansion is per-byte table-driven, so ANY cut points are valid
    tile boundaries — each tile expands independently while cache-hot."""
    if not merges:
        return bytes(blob)
    full = np.frombuffer(blob, dtype=np.uint8)
    if not len(full):
        return b""
    mat, lens = _expansion_table(merges)
    masktab = _mask_table(lens, mat.shape[1])
    if len(full) <= _TILE:
        return _expand_tile(full, mat, masktab).tobytes()
    tiles = [
        _expand_tile(full[t : t + _TILE], mat, masktab)
        for t in range(0, len(full), _TILE)
    ]
    return np.concatenate(tiles).tobytes()


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
