#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4): noop-sink isolation
of the encode pipeline's stages and per-query timings. NOT part of the
driver protocol — bench.py stays the frozen measurement harness; numbers
from here are cited in OPTIMIZATION_r08.md.

Usage: python bench_extra.py [stage ...]
  stages: encode_stages | queries | all (default: encode_stages)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "200000"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
WORK = os.environ.get("SPARK_GRAFT_WORK", "/tmp/p2c_bench")
QUERIES = [q for q in os.environ.get("SPARK_GRAFT_EXTRA_QUERIES", "").split(",") if q]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _time(spark, label, fn, reps=REPS):
    ts = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    return {"label": label, "secs": ts, "best": min(ts),
            "median": round(statistics.median(ts), 3)}


def encode_stages(spark):
    from pyspark.sql import functions as F

    from parquet2csv_spark.operators import decode_table, encode_grouped
    from parquet2csv_spark.operators.encode import encode_salted, salt_groups
    from parquet2csv_spark.sources.corpus import CORPUS_DDL

    corpus = spark.read.parquet(f"{WORK}/corpus")
    out = []

    out.append(_time(spark, "scan corpus (noop)", lambda: _noop(corpus)))
    out.append(_time(
        spark, "salt_groups only (noop)",
        lambda: _noop(salt_groups(corpus, ["repo"], ["path", "commit"])),
    ))

    def shuffle_sort_only():
        salted = salt_groups(corpus, ["repo"], ["path", "commit"])
        n = spark.sparkContext.defaultParallelism * 2
        _noop(salted.repartition(n, "_gk").sortWithinPartitions("_gk", "path", "commit"))

    out.append(_time(spark, "salt+shuffle+sort (noop)", shuffle_sort_only))

    def full_encode():
        chunks = encode_grouped(corpus, ["repo"], ["path", "commit"])
        chunks.agg(F.sum("enc_bytes")).first()

    out.append(_time(spark, "encode_grouped full", full_encode))

    chunks_df = spark.read.parquet(f"{WORK}/chunks")
    out.append(_time(spark, "scan chunks (noop)", lambda: _noop(chunks_df)))
    out.append(_time(
        spark, "decode_table full (count)",
        lambda: decode_table(chunks_df, CORPUS_DDL).count(),
    ))
    return out


def queries(spark):
    import __spark_entry__ as entry

    q = entry.queries()
    names = QUERIES or [
        "roundtrip_documents", "roundtrip_lineitem", "agg_pricing_summary",
        "window_topk_orders", "dedup_exact_documents", "minhash_near_dups",
        "ann_cosine_topk", "simhash_documents", "quality_scores_documents",
    ]
    return [
        _time(spark, name, (lambda n: (lambda: q[n](spark, SF_DIR).count()))(name))
        for name in names
    ]


def main():
    from parquet2csv_spark.session import get_spark

    what = sys.argv[1:] or ["encode_stages"]
    spark = get_spark(cpus=CPUS, app="bench_extra")
    results = {}
    if "encode_stages" in what or "all" in what:
        results["encode_stages"] = encode_stages(spark)
    if "queries" in what or "all" in what:
        results["queries"] = queries(spark)
    spark.stop()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
