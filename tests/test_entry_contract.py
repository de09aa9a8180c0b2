"""Driver-contract smoke: entry() runs and every oracle key has a query."""

from __future__ import annotations

import __spark_entry__ as entry


def test_entry_flagship(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    total = sum(r["n_docs"] for r in rows)
    matched = sum(r["n_sha_match"] for r in rows)
    null_texts = 0  # sha of null text is null → not counted as match
    assert matched <= total
    # bit-identity: every non-null text must match
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_nonnull = docs.filter(F.col("text").isNotNull()).count()
    assert matched == n_nonnull


def test_queries_and_oracles_align():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    # the engine's core operators all have exact oracles
    for must in [
        "roundtrip_documents", "roundtrip_lineitem", "roundtrip_events",
        "encode_verify_documents", "agg_pricing_summary", "dedup_exact_documents",
        "ann_cosine_topk", "simhash_documents",
        # round 2: array-column queries are canonicalizer-safe and the whole
        # LSH/IVF/minhash pipelines are SQL-replicated
        "roundtrip_embeddings", "minhash_signatures_documents",
        "minhash_near_dups", "ann_lsh_topk", "ann_ivf_topk",
        "embedding_near_dups", "embedding_centroids", "exact_stats_events",
        "csv_format_uuid_decimal", "token_count_bpe_documents",
        "multimodal_frames",
        # round 5: the previously-ungated streaming modules + new ops
        "stream_stateful_totals", "stream_incremental_encode",
        "stream_interval_join", "stratified_sample_salted",
    ]:
        assert must in oracles, must
