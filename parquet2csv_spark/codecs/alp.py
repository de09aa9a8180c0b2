"""ALP-style float compression (Afroozeh & Boncz, "ALP: Adaptive
Lossless floating-Point compression", SIGMOD 2024 — public paper; this is
an independent numpy implementation of the core idea, not a port).

Most real-world float columns are decimals printed into binary floats
(prices, ratios, rounded scores). Scaling by 10^e recovers the underlying
integer, which frame-of-reference + bit-packing then compress far better
than raw IEEE bytes deflate. Exactness is GUARANTEED by construction: the
encoder re-runs the exact decode expression (``scaled / 10**e`` in float64,
cast to the source dtype) and any value that does not round-trip
bit-identically — irrational-looking doubles, NaN/inf, -0.0, |v| beyond
2^53 — is stored verbatim in an exception list and patched after decode.

Body layout:
  u8  e                 (decimal exponent, 0..18)
  u32 n_exceptions
  n_exceptions × (u32 position + raw IEEE value, source width)
  FOR-encoded int64 scaled values (exception slots hold 0)
"""

from __future__ import annotations

import struct

import numpy as np

from . import foref

_MAX_E = 18
_U32 = struct.Struct("<I")


def _bits(a: np.ndarray) -> np.ndarray:
    """Bit view for exact (NaN-safe, -0.0-distinguishing) comparison."""
    return a.view(np.int32 if a.dtype == np.float32 else np.int64)


def _roundtrip_exact(vals: np.ndarray, scaled: np.ndarray, e: int) -> np.ndarray:
    """Mask of values reproduced bit-identically by the decode expression."""
    back = (scaled.astype(np.float64) / (10.0 ** e)).astype(vals.dtype)
    return _bits(back) == _bits(vals)


def choose_exponent(vals: np.ndarray, sample_cap: int = 4096) -> tuple[int, float]:
    """Smallest exponent maximizing the exact-round-trip ratio on a stride
    sample. Returns (e, exact_ratio at that e)."""
    if len(vals) > sample_cap:
        vals = vals[:: len(vals) // sample_cap][:sample_cap]
    finite = np.isfinite(vals)
    best = (0, -1.0)
    for e in range(_MAX_E + 1):
        with np.errstate(invalid="ignore", over="ignore"):
            scaled = np.where(finite, np.round(vals.astype(np.float64) * 10.0 ** e), 0.0)
        in_range = np.abs(scaled) < 2 ** 62
        s_int = np.where(finite & in_range, scaled, 0.0).astype(np.int64)
        ok = _roundtrip_exact(vals, s_int, e) & finite & in_range
        ratio = float(ok.mean()) if len(ok) else 0.0
        if ratio > best[1]:
            best = (e, ratio)
        if ratio == 1.0:
            break
    return best


def encode(vals: np.ndarray, e: int | None = None) -> bytes:
    """Encode a float32/float64 vector (nulls pre-filled upstream)."""
    if e is None:
        e, _ = choose_exponent(vals)
    finite = np.isfinite(vals)
    with np.errstate(invalid="ignore", over="ignore"):
        scaled_f = np.where(finite, np.round(vals.astype(np.float64) * 10.0 ** e), 0.0)
    in_range = np.abs(scaled_f) < 2 ** 62
    scaled = np.where(finite & in_range, scaled_f, 0.0).astype(np.int64)
    ok = _roundtrip_exact(vals, scaled, e) & finite & in_range
    exc = np.flatnonzero(~ok).astype(np.uint32)
    scaled[exc] = 0  # keep the FOR range tight; patched on decode
    out = bytearray()
    out += bytes((e,))
    out += _U32.pack(len(exc))
    out += exc.tobytes()
    out += vals[exc].tobytes()
    out += foref.encode(scaled)
    return bytes(out)


def decode(body: bytes | memoryview, n: int, dtype: np.dtype) -> np.ndarray:
    body = memoryview(body)
    e = body[0]
    (n_exc,) = _U32.unpack_from(body, 1)
    off = 5
    exc = np.frombuffer(body[off : off + 4 * n_exc], dtype=np.uint32)
    off += 4 * n_exc
    width = np.dtype(dtype).itemsize
    raw = np.frombuffer(body[off : off + width * n_exc], dtype=dtype)
    off += width * n_exc
    scaled = foref.decode(body[off:], n)
    # astype() above already returned a fresh owned array — patch in place
    vals = (scaled.astype(np.float64) / (10.0 ** e)).astype(dtype)
    if n_exc:
        vals[exc] = raw
    return vals
