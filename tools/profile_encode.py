"""Profile the encode hot path WITHOUT Spark: run the exact per-group
codec pipeline (split_points + encode_chunk, the applyInArrow body)
single-threaded under cProfile over a materialized corpus slice, so the
cumulative-time ranking shows where encode wall actually goes
(selector trials / fsst train / fsst compress / zlib / Arrow plumbing).

Usage: python tools/profile_encode.py [corpus_parquet_dir] [n_rows]
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

from parquet2csv_spark.operators.encode import (  # noqa: E402
    DEFAULT_CHUNK_BYTES,
    DEFAULT_CHUNK_ROWS,
    encode_chunk,
    split_points,
)


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/p2c_scaling/corpus"
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    tbl = pq.read_table(path).slice(0, n_rows)
    # mimic the grouped shape: one "group" per repo, ordered like the
    # JVM sort hands groups to the Arrow UDF
    import pyarrow.compute as pc

    tbl = tbl.take(pc.sort_indices(tbl, [("repo", "ascending"), ("path", "ascending")]))
    repos = tbl["repo"].to_pylist()
    bounds, prev = [], None
    for i, r in enumerate(repos):
        if r != prev:
            bounds.append(i)
            prev = r
    bounds.append(len(repos))
    groups = [tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(len(bounds) - 1)]
    logical = sum(
        (tbl[c].nbytes for c in tbl.column_names), 0
    )
    print(f"rows={tbl.num_rows} groups={len(groups)} arrow_bytes={logical/1e6:.1f}MB")

    ctx: dict = {}

    def run() -> int:
        total = 0
        for gi, g in enumerate(groups):
            body = g.drop_columns([]) if True else g
            for seq, (off, ln) in enumerate(
                split_points(body, DEFAULT_CHUNK_ROWS, DEFAULT_CHUNK_BYTES)
            ):
                piece = body.slice(off, ln)
                row = encode_chunk(piece, f"g{gi}:{seq}", f"g{gi}", seq, None, ctx)
                total += sum(len(c["frame"]) for c in row["cols"])
        return total

    t0 = time.time()
    enc = run()  # warm pass (numba-free, but page cache + ctx cache)
    warm = time.time() - t0
    print(f"warm pass: {warm:.2f}s  enc={enc/1e6:.1f}MB  {logical/warm/1e6:.1f} MB/s single-thread")

    pr = cProfile.Profile()
    pr.enable()
    run()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
