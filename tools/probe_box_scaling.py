"""Box-scaling evidence probes (BENCH/BASELINE.md appendix).

Three process-pool scaling curves that bracket what ANY code can achieve on
this sandbox box, independent of Spark:

  cpu    — register-only work (zero memory traffic): the upper bound any
           perfectly-parallel workload can reach on this box.
  memcpy — pure memory streaming: the lower bound for bandwidth-bound work
           (all local[N] levels share ONE bus; real executors bring their own).
  kernel — the engine's actual content kernel (tiled fsst.compress + zlib-1
           on an 8 MB corpus slice), to show where the codec sits.

Protocol: fresh worker pool per level; one warm-up batch; the timing batch
is the SECOND consecutive batch (sustained rate, not Firecracker burst
credits). Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
import zlib
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, ".")

_BLOB = None
_MERGES = None
_SRC = None
_DST = None


def _setup(corpus_path):
    global _BLOB, _MERGES, _SRC, _DST
    _SRC = np.random.bytes(64 << 20)
    _DST = np.empty(64 << 20, dtype=np.uint8)
    if corpus_path:
        import pyarrow.parquet as pq

        from parquet2csv_spark.codecs import fsst, vec

        t = pq.read_table(corpus_path, columns=["content"])
        arr = t.slice(0, 6000)["content"].combine_chunks()
        _, blob = vec.string_parts(arr.fill_null("") if arr.null_count else arr)
        _BLOB = bytes(blob[: 8 << 20])
        _MERGES = fsst.train(_BLOB)


def _cpu(_):
    x = 0
    for _i in range(3_000_000):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def _memcpy(_):
    a = np.frombuffer(_SRC, dtype=np.uint8)
    for _i in range(10):
        _DST[:] = a
    return 10 * 64


def _kernel(_):
    from parquet2csv_spark.codecs import fsst

    enc = fsst.compress(_BLOB, _MERGES)
    return len(zlib.compress(enc, 1))


def run(kind: str, workers: int, corpus_path: str | None) -> float:
    fn = {"cpu": _cpu, "memcpy": _memcpy, "kernel": _kernel}[kind]
    units = workers * 2
    with ProcessPoolExecutor(workers, initializer=_setup, initargs=(corpus_path,)) as ex:
        list(ex.map(fn, range(workers)))   # warm-up
        list(ex.map(fn, range(units)))     # burn burst credits
        t0 = time.perf_counter()
        list(ex.map(fn, range(units)))     # sustained measurement
        dt = time.perf_counter() - t0
    return units / dt


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/p2c_scaling/corpus"
    out: dict = {}
    for kind in ("cpu", "memcpy", "kernel"):
        rates = {}
        for w in (1, 2, 8, 32):
            try:
                rates[w] = run(kind, w, corpus if kind == "kernel" else None)
            except Exception as e:  # kernel probe needs the corpus on disk
                rates[w] = None
                print(f"# {kind}@{w}: {e}", file=sys.stderr)
        base = rates[1]
        out[kind] = {
            f"w{w}": round(r, 2) if r else None for w, r in rates.items()
        }
        if base:
            out[kind]["eff_2_to_8"] = (
                round(rates[8] / (4 * rates[2]), 3) if rates[8] and rates[2] else None
            )
            out[kind]["eff_1_to_8"] = round(rates[8] / (8 * base), 3) if rates[8] else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
