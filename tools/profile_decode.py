"""Profile the decode hot path WITHOUT Spark: encode a corpus slice with
the real pipeline, then cProfile decode_array over every frame (the
mapInArrow body), ranking where decode wall goes (fsst expand, foref
unpack, zlib, Arrow assembly).

Usage: python tools/profile_decode.py [corpus_parquet_dir] [n_rows]
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

from parquet2csv_spark.codecs import decode_array  # noqa: E402
from parquet2csv_spark.operators.encode import (  # noqa: E402
    DEFAULT_CHUNK_BYTES,
    DEFAULT_CHUNK_ROWS,
    encode_chunk,
    split_points,
)


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/p2c_scaling/corpus"
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    tbl = pq.read_table(path).slice(0, n_rows)
    import pyarrow.compute as pc

    tbl = tbl.take(pc.sort_indices(tbl, [("repo", "ascending"), ("path", "ascending")]))
    ctx: dict = {}
    frames: list[bytes] = []
    raw = 0
    for off, ln in split_points(tbl, DEFAULT_CHUNK_ROWS, DEFAULT_CHUNK_BYTES):
        piece = tbl.slice(off, ln)
        row = encode_chunk(piece, "x", "g", 0, None, ctx)
        raw += row["raw_bytes"]
        frames.extend(c["frame"] for c in row["cols"])
    print(f"rows={tbl.num_rows} frames={len(frames)} raw={raw/1e6:.1f}MB")

    def run() -> int:
        total = 0
        for f in frames:
            total += len(decode_array(f))
        return total

    t0 = time.time()
    run()
    warm = time.time() - t0
    print(f"warm decode: {warm:.2f}s  {raw/warm/1e6:.1f} MB/s single-thread")

    pr = cProfile.Profile()
    pr.enable()
    run()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
