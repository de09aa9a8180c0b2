"""End-to-end golden test (SURVEY.md §5.2-3): corpus → encode → decode →
bit-identical reconstruction, plus size gate vs the reference parquet
configuration (GZIP, dictionary disabled — OneRowParquetSchema.java:104-110).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet2csv_spark.operators import (
    chunk_metrics,
    decode_table,
    encode_grouped,
    encode_table,
    multiset_diff,
    sha256_check,
)
from parquet2csv_spark.sources.corpus import CORPUS_DDL, generate_corpus

N_ROWS = 8000


@pytest.fixture(scope="module")
def corpus(spark):
    df = generate_corpus(spark, N_ROWS, seed=42)
    df.cache().count()
    return df


def test_corpus_shape(corpus):
    assert corpus.count() == N_ROWS
    assert corpus.columns == ["repo", "path", "commit", "lang", "content"]
    nulls = corpus.filter(F.col("content").isNull()).count()
    empties = corpus.filter(F.col("content") == "").count()
    assert nulls > 0 and empties > 0
    top = (
        corpus.groupBy("repo").count().orderBy(F.desc("count")).first()
    )
    assert top["count"] / N_ROWS > 0.35  # giant repo


def test_grouped_encode_roundtrip(spark, corpus):
    chunks = encode_grouped(
        corpus, group_cols=["repo"], order_cols=["path", "commit"],
        chunk_rows=2048, chunk_bytes=2 << 20,
    )
    chunks.cache()
    m = chunk_metrics(chunks)
    n_chunks = chunks.count()
    assert n_chunks > 2

    # decode → exact multiset reconstruction
    dec = decode_table(chunks, CORPUS_DDL)
    assert multiset_diff(corpus, dec).count() == 0

    # per-row sha256(content) invariant on the natural key
    res = {
        r["status"]: r["n"]
        for r in sha256_check(corpus.dropDuplicates(["repo", "path", "commit"]),
                              dec.dropDuplicates(["repo", "path", "commit"]),
                              ["repo", "path", "commit"]).collect()
    }
    assert res.get("mismatched", 0) == 0 and res.get("missing_in_decoded", 0) == 0
    assert res.get("matched", 0) > 0

    # selector picked codec families the north_star prescribes — judged on
    # each column's LARGEST chunk (tiny chunks may legitimately pick plain+z)
    codecs_by_col = {
        r["col"]: r["codec"]
        for r in m.groupBy("col").agg(F.max_by("codec", "raw_bytes").alias("codec")).collect()
    }
    assert any(codecs_by_col["repo"].startswith(p) for p in ("dict", "rledict")), codecs_by_col
    assert any(codecs_by_col["commit"].startswith(p) for p in ("dict", "rledict")), codecs_by_col
    assert codecs_by_col["content"].startswith(("fsst", "plain+z", "dict")), codecs_by_col

    # size-cap respected (chunk raw bytes ≤ cap + one max row overshoot)
    overshoot = chunks.filter(F.col("raw_bytes") > (2 << 20) + 70000 + 4 * 2048 * 8).count()
    assert overshoot == 0
    chunks.unpersist()


def test_grouped_encode_deterministic_chunk_ids(spark, corpus):
    a = encode_grouped(corpus, ["repo"], ["path", "commit"], chunk_rows=2048)
    b = encode_grouped(corpus.repartition(13), ["repo"], ["path", "commit"], chunk_rows=2048)
    ids_a = {r["chunk_id"]: r["n_rows"] for r in a.select("chunk_id", "n_rows").collect()}
    ids_b = {r["chunk_id"]: r["n_rows"] for r in b.select("chunk_id", "n_rows").collect()}
    assert ids_a == ids_b


def test_ungrouped_encode_roundtrip_generic_tables(spark):
    for table in ["documents", "lineitem", "events"]:
        src = spark.read.parquet(f"/root/testdata/sf0.001/{table}.parquet")
        chunks = encode_table(src, chunk_rows=1500)
        dec = decode_table(chunks, src.schema)
        assert multiset_diff(src, dec).count() == 0, table


def test_decode_with_position_restores_total_order(spark, corpus):
    chunks = encode_grouped(corpus, ["repo"], ["path", "commit"], chunk_rows=1024)
    dec = decode_table(chunks, CORPUS_DDL, with_position=True)
    first = (
        dec.orderBy("_group_key", "_seq", "_row_offset")
        .limit(5)
        .select("repo", "path")
        .collect()
    )
    # within the first group, paths are sorted (the explicit ordering contract)
    paths = [r["path"] for r in first]
    assert paths == sorted(paths)


def test_empty_input_produces_no_chunks(spark):
    empty = spark.createDataFrame([], CORPUS_DDL)
    assert encode_grouped(empty, ["repo"], ["path"]).count() == 0
    assert encode_table(empty).count() == 0


def test_cdc_rows_roundtrip(spark):
    """FIXTURES.md F2: the reference's hard-coded cdc schema
    (OneRowParquetSchema.java:124-153) — $-suffixed names, uuid strings,
    timestamp sentinels, decimal(30,0) — must round-trip bit-identically."""
    import datetime
    import decimal

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ID$", T.LongType(), True),
            T.StructField("PRIMARY_KEY_VAL$", T.StringType(), True),
            T.StructField("TERM_ID$", T.StringType(), True),
            T.StructField("CREATED_DATE$", T.TimestampType(), True),
            T.StructField("SOURCE_SCN$", T.DecimalType(30, 0), True),
            T.StructField("SQL_OPERATION$", T.StringType(), True),
        ]
    )
    rows = [
        (0, "00000000-0000-0000-0000-000000000000", "T1",
         datetime.datetime(1900, 1, 1), decimal.Decimal(0), "INSERT"),
        (1, "123e4567-e89b-12d3-a456-426614174000", "T2",
         datetime.datetime(1900, 1, 2), decimal.Decimal("987654321098765432109876543210"), "UPDATE"),
        (2, "not-a-uuid", None, datetime.datetime(2024, 6, 1, 12, 0, 0, 123000),
         decimal.Decimal(-42), "DELETE"),
        (3, None, "T3", None, None, None),
    ]
    src = spark.createDataFrame(rows, schema)
    dec = decode_table(encode_table(src, chunk_rows=16), schema)
    assert multiset_diff(src, dec).count() == 0
    assert dec.schema == schema


def test_zone_map_pruning_and_projection_pushdown(spark):
    """Columnar-engine scale features: (1) zone-map chunk pruning — a
    selective decode reads only chunks whose min/max can match; (2)
    projection pushdown — decoding a subset schema touches only those
    columns' frames."""
    from parquet2csv_spark.operators import prune_chunks_long, prune_chunks_str

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    # sort so chunks have tight non-overlapping key ranges (zone maps bite)
    chunks = encode_table(li.orderBy("l_orderkey"), chunk_rows=500).cache()
    total = chunks.count()

    pruned = prune_chunks_long(chunks, "l_orderkey", lo=100, hi=120)
    assert 0 < pruned.count() < total  # actually pruned something

    dec = decode_table(pruned, li.schema).filter(
        (F.col("l_orderkey") >= 100) & (F.col("l_orderkey") <= 120)
    )
    expect = li.filter((F.col("l_orderkey") >= 100) & (F.col("l_orderkey") <= 120))
    assert multiset_diff(expect, dec).count() == 0

    # string zone maps on a sorted string column
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dchunks = encode_table(docs.orderBy("source"), chunk_rows=120).cache()
    srcs = sorted(r["source"] for r in docs.select("source").distinct().collect())
    target = srcs[0]
    spruned = prune_chunks_str(dchunks, "source", lo=target, hi=target)
    assert spruned.count() < dchunks.count()
    sdec = decode_table(spruned, docs.schema).filter(F.col("source") == target)
    assert multiset_diff(docs.filter(F.col("source") == target), sdec).count() == 0

    # projection pushdown: subset schema decodes only those frames
    proj = decode_table(chunks, "l_orderkey bigint, l_quantity double")
    assert proj.columns == ["l_orderkey", "l_quantity"]
    assert proj.count() == li.count()
    chunks.unpersist()
    dchunks.unpersist()


def test_decode_table_filters_prune_chunks_and_match_rows(spark):
    """VERDICT r3 #6: decode_table(filters=...) routes simple predicates
    through the zone maps — fewer chunks are scanned — while row semantics
    stay exact (prune is conservative; the predicate is re-applied on the
    decoded rows)."""
    from parquet2csv_spark.operators.decode import _apply_filters

    ddl = "doc_id bigint, text string"
    df = spark.createDataFrame(
        [(i, f"body {i}") for i in range(4000)], ddl
    )
    chunks = encode_table(df, chunk_rows=500)
    chunks.cache()
    try:
        n_all = chunks.count()
        filters = [("doc_id", ">=", 3500)]
        from pyspark.sql.types import _parse_datatype_string

        n_kept = _apply_filters(chunks, _parse_datatype_string(ddl), filters).count()
        assert n_kept < n_all  # pruning actually dropped chunks
        got = decode_table(chunks, ddl, filters=filters)
        want = decode_table(chunks, ddl).filter(F.col("doc_id") >= 3500)
        assert multiset_diff(want, got).count() == 0
        assert got.count() == 500
        # string zone maps route too
        got_s = decode_table(chunks, ddl, filters=[("text", "==", "body 7")])
        assert [r["doc_id"] for r in got_s.collect()] == [7]
        # "in" prunes on the [min, max] envelope and row-filters exactly
        n_in = _apply_filters(
            chunks, _parse_datatype_string(ddl), [("doc_id", "in", [10, 12])]
        ).count()
        assert n_in < n_all
        got_in = decode_table(chunks, ddl, filters=[("doc_id", "in", [10, 12])])
        assert sorted(r["doc_id"] for r in got_in.collect()) == [10, 12]
        import pytest

        with pytest.raises(ValueError, match="non-empty"):
            decode_table(chunks, ddl, filters=[("doc_id", "in", [])]).count()
    finally:
        chunks.unpersist()


def test_decode_table_time_filters_prune_chunks(spark):
    """VERDICT r4 #3: date/timestamp predicates route through the zone maps
    too — the encoder stores exact int64 stats in Arrow epoch units
    (timestamp[us] → microseconds, date32 → days), and ``_apply_filters``
    converts natural datetime/date filter values before pruning. A
    time-range selective decode (the canonical 100-TB access pattern) must
    scan fewer chunks while staying row-exact."""
    import datetime

    from parquet2csv_spark.operators.decode import _apply_filters
    from pyspark.sql.types import _parse_datatype_string

    base = datetime.datetime(2024, 1, 1)
    ddl = "event_id bigint, ts timestamp, d date"
    df = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(minutes=i), (base + datetime.timedelta(days=i % 40)).date())
            for i in range(4000)
        ],
        ddl,
    )
    # order by ts so chunk zone maps are tight on the time axis
    chunks = encode_table(df.orderBy("event_id").coalesce(1), chunk_rows=500)
    chunks.cache()
    try:
        n_all = chunks.count()
        cutoff = base + datetime.timedelta(minutes=3500)
        filters = [("ts", ">=", cutoff)]
        schema = _parse_datatype_string(ddl)
        n_kept = _apply_filters(chunks, schema, filters).count()
        assert n_kept < n_all  # timestamp pruning actually dropped chunks
        got = decode_table(chunks, ddl, filters=filters)
        want = decode_table(chunks, ddl).filter(F.col("ts") >= cutoff)
        assert multiset_diff(want, got).count() == 0
        assert got.count() == 500
        # tz-aware datetimes convert through .timestamp() to the same epoch
        aware = cutoff.replace(tzinfo=datetime.timezone.utc)
        n_kept_aware = _apply_filters(chunks, schema, [("ts", ">=", aware)]).count()
        assert n_kept_aware == n_kept
        # date columns prune on epoch-day units
        dcut = (base + datetime.timedelta(days=38)).date()
        got_d = decode_table(chunks, ddl, filters=[("d", ">=", dcut)])
        want_d = decode_table(chunks, ddl).filter(F.col("d") >= F.lit(dcut))
        assert multiset_diff(want_d, got_d).count() == 0
        # equality on a single day
        one = decode_table(chunks, ddl, filters=[("d", "==", dcut)])
        assert one.count() == want_d.filter(F.col("d") == F.lit(dcut)).count()
    finally:
        chunks.unpersist()


def test_epoch_long_exact_for_tz_aware_microseconds():
    """ADVICE r5 (medium): tz-aware datetimes must convert with exact
    integer arithmetic — ``int(val.timestamp() * 1e6)`` rounds ~3% of
    microsecond-bearing epochs by ±1µs, and an off-by-one-down bound on
    ``==``/``<=``/``in`` prunes chunks whose min equals the true value,
    silently dropping matching rows."""
    import datetime

    from parquet2csv_spark.operators.decode import _epoch_long

    base_s = 1_700_000_000  # a modern epoch where float64 has ~µs ulp
    for us in range(0, 1_000_000, 7_777):
        want = base_s * 1_000_000 + us
        aware = datetime.datetime.fromtimestamp(
            base_s, tz=datetime.timezone.utc
        ).replace(microsecond=us)
        assert _epoch_long(aware, "timestamp") == want, us
        # naive path (calendar.timegm + microsecond) must agree exactly
        naive = aware.replace(tzinfo=None)
        assert _epoch_long(naive, "timestamp") == want, us


def test_decode_tz_aware_microsecond_equality_filter(spark):
    """End-to-end twin of the exactness fix: a tz-aware, microsecond-
    bearing ``==`` filter must keep the chunk holding the row (pruning is
    bound-exact) and return exactly that row."""
    import datetime

    base = datetime.datetime(2024, 5, 1)
    ddl = "event_id bigint, ts timestamp"
    df = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=i, microseconds=(i * 7_777) % 1_000_000))
            for i in range(2000)
        ],
        ddl,
    )
    chunks = encode_table(df.orderBy("event_id").coalesce(1), chunk_rows=250)
    target = base + datetime.timedelta(
        seconds=1999, microseconds=(1999 * 7_777) % 1_000_000
    )
    aware = target.replace(tzinfo=datetime.timezone.utc)
    got = decode_table(chunks, ddl, filters=[("ts", "==", aware)]).collect()
    assert [r["event_id"] for r in got] == [1999]


def test_in_filter_prunes_per_value_for_sparse_lists(spark):
    """VERDICT r5 #4: an ``in`` list of ≤16 values prunes per-value (union
    of point prunes) — a sparse list like (5, 3900) keeps only the two
    chunks that can hold those values, where the old [min,max] envelope
    covered every chunk and pruned nothing. Longer lists fall back to the
    envelope; row results are identical either way."""
    from parquet2csv_spark.operators.decode import _apply_filters
    from pyspark.sql.types import _parse_datatype_string

    ddl = "doc_id bigint, text string"
    schema = _parse_datatype_string(ddl)
    df = spark.createDataFrame([(i, f"body {i}") for i in range(4000)], ddl)
    chunks = encode_table(df.orderBy("doc_id").coalesce(1), chunk_rows=500)
    chunks.cache()
    try:
        n_all = chunks.count()
        assert n_all == 8
        # sparse list: first and last chunk only — the envelope keeps all 8
        n_sparse = _apply_filters(chunks, schema, [("doc_id", "in", [5, 3900])]).count()
        assert n_sparse == 2
        got = decode_table(chunks, ddl, filters=[("doc_id", "in", [5, 3900])])
        assert sorted(r["doc_id"] for r in got.collect()) == [5, 3900]
        # >16 distinct values: envelope fallback, still row-exact
        big = [5, 3900] + list(range(1000, 1017))
        got_big = decode_table(chunks, ddl, filters=[("doc_id", "in", big)])
        assert sorted(r["doc_id"] for r in got_big.collect()) == sorted(big)
    finally:
        chunks.unpersist()


def test_selective_decode_events_gate_prunes(spark):
    """Pruning proof for the ``selective_decode_events`` gate row
    (VERDICT r5 #3): the same build the gate runs — events ordered by ts,
    chunk_rows=2048, ts range filter — scans strictly fewer chunks than
    the total, and the decoded rows equal the plain parquet range scan."""
    import datetime

    from parquet2csv_spark.operators.decode import _apply_filters

    src = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    chunks = encode_table(src.orderBy("ts"), chunk_rows=2048)
    chunks.cache()
    try:
        lo = datetime.datetime(2024, 1, 10)
        hi = datetime.datetime(2024, 1, 15)
        filters = [("ts", ">=", lo), ("ts", "<", hi)]
        n_all = chunks.count()
        n_kept = _apply_filters(chunks, src.schema, filters).count()
        assert 0 < n_kept < n_all, (n_kept, n_all)
        got = decode_table(chunks, src.schema, filters=filters)
        want = src.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        assert multiset_diff(want, got.select(*src.columns)).count() == 0
        n = got.count()
        assert n == want.count() and n > 0
    finally:
        chunks.unpersist()


def test_grouped_encode_null_order_cols_sort_last(spark):
    """ADVICE r3: the within-group sort pins asc_nulls_last (the pyarrow
    convention chunk determinism was defined under), not Spark's default
    NULLS FIRST — chunk ids are positional, so row order is part of the
    cross-version determinism contract."""
    ddl = "repo string, path string, v bigint"
    df = spark.createDataFrame(
        [("g", None, 1), ("g", "b", 2), ("g", "a", 3), ("g", None, 4)], ddl
    )
    chunks = encode_grouped(df, ["repo"], ["path"], chunk_rows=1024)
    dec = decode_table(chunks, ddl, with_position=True)
    paths = [
        r["path"]
        for r in dec.orderBy("_group_key", "_seq", "_row_offset").collect()
    ]
    assert paths == ["a", "b", None, None]


def test_bloom_membership_pruning_point_lookup(spark):
    """VERDICT r6 #3: string ``==`` on a high-cardinality column the chunks
    are NOT sorted by — the prefix [lo,hi] zone maps barely prune, the
    per-chunk Bloom membership filter prunes almost everything, and the
    result stays identical (Bloom filters have zero false negatives)."""
    from pyspark.sql.types import _parse_datatype_string

    from parquet2csv_spark.operators.decode import _apply_filters

    ddl = "path string, v bigint"
    rows = [(f"src/{(i * 2654435761) % 100000:05x}/F{i}.java", i)
            for i in range(8000)]
    df = spark.createDataFrame(rows, ddl).coalesce(4)
    chunks = encode_table(df, chunk_rows=500).cache()  # unsorted in `path`
    try:
        n_all = chunks.count()
        schema = _parse_datatype_string(ddl)
        target = rows[4321][0]
        kept = _apply_filters(chunks, schema, [("path", "==", target)]).count()
        # the value lives in exactly one chunk; bloom fp ~0.2% at this ndv
        assert kept < n_all / 4, (kept, n_all)
        got = decode_table(chunks, ddl, filters=[("path", "==", target)])
        assert [r["v"] for r in got.collect()] == [4321]
        # absent value: bloom prunes everything (or nearly), zero rows out
        kept_abs = _apply_filters(
            chunks, schema, [("path", "==", "no/such/path.txt")]
        ).count()
        assert kept_abs < n_all / 4
        # 'in' routes through the bloom too — union over values
        vals = [rows[17][0], rows[7777][0]]
        got_in = decode_table(chunks, ddl, filters=[("path", "in", vals)])
        assert sorted(r["v"] for r in got_in.collect()) == [17, 7777]
    finally:
        chunks.unpersist()


def test_bloom_pruning_skips_legacy_tables_without_bloom_field(spark):
    """Chunk tables written before r7 carry no ``bloom`` field; pruning
    must fall back to zone maps only — never reference the missing field —
    and row results stay exact."""
    ddl = "path string, v bigint"
    df = spark.createDataFrame(
        [(f"p{i:04d}", i) for i in range(1000)], ddl
    ).coalesce(1)
    chunks = encode_table(df, chunk_rows=200)
    legacy_struct = (
        "struct(c.name as name, c.codec as codec, c.n as n, "
        "c.null_count as null_count, c.raw_bytes as raw_bytes, "
        "c.enc_bytes as enc_bytes, c.lo_long as lo_long, c.hi_long as hi_long, "
        "c.lo_str as lo_str, c.hi_str as hi_str, c.frame as frame)"
    )
    legacy = chunks.withColumn("cols", F.expr(f"transform(cols, c -> {legacy_struct})"))
    got = decode_table(legacy, ddl, filters=[("path", "==", "p0042")])
    assert [r["v"] for r in got.collect()] == [42]


def test_scan_stats_selectivity_preview(spark):
    """r7: ``scan_stats`` answers "how selective is this predicate" from
    chunk metadata only — kept counts match what ``_apply_filters`` keeps,
    and the row-exact decode result is bounded by kept_rows."""
    from parquet2csv_spark.operators import scan_stats

    ddl = "doc_id bigint, text string"
    df = spark.createDataFrame([(i, f"body {i}") for i in range(4000)], ddl).coalesce(2)
    chunks = encode_table(df, chunk_rows=500).cache()
    try:
        st = scan_stats(chunks, ddl, [("doc_id", ">=", 3500)])
        assert st["total_rows"] == 4000
        assert 0 < st["kept_chunks"] < st["total_chunks"]
        assert 500 <= st["kept_rows"] < 4000
        got = decode_table(chunks, ddl, filters=[("doc_id", ">=", 3500)]).count()
        assert got == 500 <= st["kept_rows"]
        # bloom-backed string point lookup previews as selective too
        st2 = scan_stats(chunks, ddl, [("text", "==", "body 7")])
        assert st2["kept_chunks"] < st2["total_chunks"]
    finally:
        chunks.unpersist()


def test_bloom_multibyte_prefix_agreement_no_false_negative():
    """The encoder truncates values Arrow-side (utf8_slice_codeunits) and
    the query side slices Python-side (value[:64]); both count CODE
    POINTS, so multi-byte values must always hit their own bloom — a
    disagreement would be a silent false negative (wrong results), not a
    perf issue. No Spark needed: checks the bit membership directly."""
    import numpy as np
    import pyarrow as pa

    from parquet2csv_spark.operators.bloom import (
        BLOOM_K,
        build_bloom,
        query_hashes,
    )

    vals = [
        "日本語のテキスト" * 10,   # 80 cp, > the 64-cp truncation point
        "naïve—überprüfung✓" * 5,
        "🎉🎊" * 40,               # 80 cp of 4-byte chars
        "κόσμος " * 15,
        "",            # empty string is a legitimate value
        "short",
    ]
    # pad with short values so the column stays under the avg-length gate
    col = vals * 3 + [f"k{i}" for i in range(200)]
    bloom = build_bloom(pa.array(col))  # dups exercise pc.unique
    assert bloom is not None
    words = np.array(bloom, dtype=np.int64).view(np.uint64)
    m = len(bloom) * 64
    for v in vals:
        h1, h2 = query_hashes(v)
        for i in range(BLOOM_K):
            pos = (h1 + i * h2) % m
            assert (words[pos >> 6] >> np.uint64(pos & 63)) & np.uint64(1), v
