"""Focused tests for the r8 optimization internals: the parallel
re-reader / fused read+encode source (sources.parallel_scan) and the
vectorized cosine_topk fast path (r8 optimization round)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from parquet2csv_spark.functions import similarity as sim
from parquet2csv_spark.operators import decode_table, encode_table
from parquet2csv_spark.sources.parallel_scan import (
    parallel_parquet_scan,
    parallel_scan_encode,
    worth_it,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from parquet2csv_spark.session import get_spark

    return get_spark(cpus=4, app="test-parallel-scan")


def _norm_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(map(repr, r)) for r in df.select(*cols).collect())


@pytest.mark.parametrize("table", ["lineitem", "events", "documents"])
def test_parallel_scan_rows_equal_native_scan(spark, table):
    path = f"{SF}/{table}.parquet"
    native = spark.read.parquet(path)
    par = parallel_parquet_scan(spark, path, native.schema, n_slices=7)
    # every slice is its own partition; union of slices == the file
    assert par.rdd.getNumPartitions() == 7
    assert _norm_rows(par) == _norm_rows(native)


def test_parallel_scan_slices_cover_exactly(spark):
    path = f"{SF}/lineitem.parquet"
    native = spark.read.parquet(path)
    total = pq.ParquetFile(path).metadata.num_rows
    par = parallel_parquet_scan(spark, path, native.schema, n_slices=5)
    sizes = [len(p) for p in par.rdd.glom().collect()]
    assert sum(sizes) == total
    assert all(s > 0 for s in sizes)


def test_parallel_scan_encode_roundtrips_bit_identical(spark):
    path = f"{SF}/events.parquet"
    src = spark.read.parquet(path)
    chunks = parallel_scan_encode(spark, path, src.schema, chunk_rows=2048,
                                  n_slices=6)
    dec = decode_table(chunks, src.schema)
    assert _norm_rows(dec) == _norm_rows(src)


def test_parallel_scan_encode_frames_match_encode_table(spark):
    """Fused read+encode must produce the same frames encode_table would
    for the same slice boundaries (both run encode_batches): with ONE
    slice, chunk ids (sha1 of frames) must match encode_table over the
    single-partition native scan."""
    path = f"{SF}/documents.parquet"
    src = spark.read.parquet(path)
    fused = parallel_scan_encode(spark, path, src.schema, chunk_rows=16384,
                                 n_slices=1)
    native = encode_table(src, chunk_rows=16384)
    assert sorted(r["chunk_id"] for r in fused.select("chunk_id").collect()) == \
        sorted(r["chunk_id"] for r in native.select("chunk_id").collect())


def test_worth_it_row_group_gate():
    # testdata files are single-row-group: worth re-reading at any real width
    assert worth_it(f"{SF}/lineitem.parquet", 8)
    assert not worth_it(f"{SF}/lineitem.parquet", 2)


def test_cosine_topk_fast_path_equals_crossjoin(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)
    fast = sim.cosine_topk(e, q, k=5).collect()
    slow = sim._cosine_topk_crossjoin(e, q, k=5).collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, fast), key=lambda t: (t[0], t[1])) == \
        sorted(map(tuple, slow), key=lambda t: (t[0], t[1]))


def test_cosine_topk_null_vector_rows_match_crossjoin(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (2, None), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.filter(F.col("vec_id") < 2)
    fast = sim.cosine_topk(df, q, k=3).collect()
    slow = sim._cosine_topk_crossjoin(df, q, k=3).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))


def test_selector_large_blob_prefers_measured_plain_z():
    """r8 selector fix: on multi-MB text chunks the zstd transport's
    long-range matching beats FSST preconditioning (measured p/f 0.76 at
    512KB..4MB on the corpus), which the old 256KB stride trial could not
    see. Pin: a large redundant blob chooses plain+z AND the chosen frame
    is no larger than the fsst+z frame; a small chunk keeps the exact
    measured small-sample choice."""
    import numpy as np
    import pyarrow as pa

    from parquet2csv_spark.codecs import encode_array, selector

    rng = np.random.default_rng(7)
    # source-code-like text: heavy cross-row redundancy, ~2KB per row
    base = [
        "def f_%d(x):\n    return x + %d  # common license header line\n"
        % (i % 37, i % 11)
        for i in range(64)
    ]
    rows = ["".join(base[rng.integers(0, 64)] for _ in range(32)) for _ in range(2048)]
    arr = pa.array(rows, type=pa.large_string())
    choice = selector.choose(arr)
    assert choice == "plain+z", choice
    # the choice is measured on a 1MB prefix with a 12% speed-preference
    # tolerance — the full-array sizes must stay within that band
    chosen = len(encode_array(arr, choice))
    fsst_sz = len(encode_array(arr, "fsst+z"))
    assert chosen <= fsst_sz * (selector._TIE_TOLERANCE + 0.05)


def test_cosine_topk_mixed_dims_match_crossjoin(spark):
    """A pair whose dims differ gets a NULL cos in the expression form
    (zip_with pads the shorter side with nulls); the vectorized fast path
    must degrade identically instead of crashing np.stack."""
    rows = [
        (0, [1.0, 0.0]), (1, [0.5, 0.5, 0.1]), (2, [0.2, 0.9]),
        (3, [0.3, 0.3, 0.3]), (4, [0.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.filter(F.col("vec_id") < 2)
    fast = sim.cosine_topk(df, q, k=4).collect()
    slow = sim._cosine_topk_crossjoin(df, q, k=4).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))


def test_worth_it_false_for_directory_inputs(spark, tmp_path):
    """A directory table (part files) must fall back to the native scan
    path instead of crashing the footer probe."""
    d = str(tmp_path / "t")
    spark.range(100).write.parquet(d)
    assert worth_it(d, 32) is False
