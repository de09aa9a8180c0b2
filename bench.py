#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: encode throughput (GB/s of logical input bytes) of the
grouped, skew-salted, auto-selected codec encode over the source-code
corpus (the north_rule input shape), measured at local[$SPARK_GRAFT_CPUS].
Also reports compression ratio vs the reference parquet configuration
(GZIP, dictionary disabled — OneRowParquetSchema.java:104-110), decode
throughput, and per-query seconds on the $SPARK_GRAFT_SF_DIR tables.

Protocol (BASELINE.md): corpus generation excluded from timing; warm-up
pass first; SPARK_GRAFT_BENCH_REPS timed repetitions with the suite
INTERLEAVED — each rep times every item (encode, decode, each query) in a
rep-dependent rotation, so no item always lands on depleted burst credits
(the box sustains ~13 effective cores; consecutive reps of one heavy item
systematically throttle whatever runs after it — the BENCH_r03 artifact).
Per-item result is the median across reps. Scaling study:
tools/bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "200000"))
# default 2 (not 3): the full interleaved suite at 3 reps drains the
# box's burst-credit budget mid-run even from rested — the third rep
# measures throttle, not the engine, and drags the medians
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
WORK = os.environ.get("SPARK_GRAFT_WORK", "/tmp/p2c_bench")

# Effective-cores threshold below which a capture is flagged as throttled.
# The box runs on Firecracker burst credits: depleted, it sustains ~13
# effective cores of 32 (BENCH/BASELINE.md appendix, tools/
# probe_box_scaling.py), and every wall-time in the suite reads 3-5×
# slow uniformly (the BENCH_r03 / BENCH_r05 artifact). Rested, the spin
# probe reads near the requested core count.
THROTTLE_EFF_FRACTION = float(os.environ.get("SPARK_GRAFT_THROTTLE_FRAC", "0.6"))


def _spin(n_iters: int) -> int:
    x = 1
    for _ in range(n_iters):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def throttle_probe(cpus: int) -> dict:
    """~3s register-only CPU probe (VERDICT r5 #1): measures the box's
    effective parallel core count so a depleted-burst-credit capture can
    never again masquerade as an engine regression. Register-only spin —
    zero memory traffic — so the reading is a pure CPU-allocation signal,
    not a bandwidth artifact."""
    from concurrent.futures import ProcessPoolExecutor

    iters = 3_000_000
    # single-core calibration (median of 3 — scheduler noise)
    singles = []
    for _ in range(3):
        t0 = time.perf_counter()
        _spin(iters)
        singles.append(iters / (time.perf_counter() - t0))
    single = statistics.median(singles)
    # all-core sustained batch: warm-up map first so pool startup and any
    # instantaneous burst boost don't inflate the timed batch
    with ProcessPoolExecutor(cpus) as ex:
        list(ex.map(_spin, [iters] * cpus))
        t0 = time.perf_counter()
        list(ex.map(_spin, [iters] * cpus))
        dt = time.perf_counter() - t0
    eff = (cpus * iters / dt) / single
    return {"single_core_spin_mips": round(single / 1e6, 2),
            "effective_cores": round(eff, 2)}


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from parquet2csv_spark.operators import decode_table, encode_grouped
    from parquet2csv_spark.session import get_spark
    from parquet2csv_spark.sources.corpus import CORPUS_DDL, write_corpus

    probe_before = throttle_probe(CPUS)

    spark = get_spark(cpus=CPUS, app="bench")
    shutil.rmtree(WORK, ignore_errors=True)

    # ---- corpus materialization (excluded from timing) --------------------
    corpus_path = f"{WORK}/corpus"
    write_corpus(spark, corpus_path, BENCH_ROWS, seed=42)
    corpus = spark.read.parquet(corpus_path)
    logical_bytes = corpus.agg(
        F.sum(
            F.coalesce(F.octet_length("content"), F.lit(0))
            + F.octet_length("repo") + F.octet_length("path")
            + F.octet_length("commit") + F.octet_length("lang")
        )
    ).first()[0]

    chunks_path = f"{WORK}/chunks"

    enc_bytes_box = [0]

    def run_encode() -> None:
        chunks = encode_grouped(corpus, ["repo"], ["path", "commit"])
        enc_bytes_box[0] = int(chunks.agg(F.sum("enc_bytes").alias("e")).first()["e"])

    # warm-up (JIT, python worker pool, page cache) doubles as the
    # persisted-chunks write for the decode pass
    encode_grouped(corpus, ["repo"], ["path", "commit"]).write.mode(
        "overwrite"
    ).parquet(chunks_path)
    chunks_df = spark.read.parquet(chunks_path)

    def run_decode() -> None:
        decoded_rows = decode_table(chunks_df, CORPUS_DDL).count()
        assert decoded_rows == BENCH_ROWS, (decoded_rows, BENCH_ROWS)

    # reference-config parquet size of the same corpus (the ratio gate)
    ref_path = f"{WORK}/ref_parquet"
    corpus.write.mode("overwrite").option("compression", "gzip").option(
        "parquet.enable.dictionary", "false"
    ).parquet(ref_path)
    ref_bytes = int(
        subprocess.check_output(["du", "-sb", ref_path]).split()[0]
    )

    # ---- interleaved suite: encode + decode + per-query timings -----------
    q = entry.queries()
    picks = [
        "roundtrip_documents",
        "roundtrip_lineitem",
        "agg_pricing_summary",
        "window_topk_orders",
        "dedup_exact_documents",
        "minhash_near_dups",
        "ann_cosine_topk",
        "simhash_documents",
        "quality_scores_documents",
    ]
    items: list[tuple[str, object]] = [
        ("encode_corpus", run_encode),
        ("decode_corpus", run_decode),
    ] + [
        (name, (lambda n: lambda: q[n](spark, SF_DIR).count())(name))
        for name in picks
    ]
    timings: dict[str, list[float]] = {name: [] for name, _ in items}
    for rep in range(REPS):
        # rep-dependent rotation: every item sees a different position in
        # the run each rep, so per-item medians aren't biased by where the
        # box's burst credits happened to run out
        shift = (rep * 5) % len(items)
        for name, fn in items[shift:] + items[:shift]:
            t0 = time.time()
            fn()
            timings[name].append(time.time() - t0)

    query_secs = {
        name: round(statistics.median(ts), 3) for name, ts in timings.items()
    }
    # best rep alongside the median: on a burst-credit box every
    # perturbation only ADDS time (throttle noise is one-sided), so the
    # minimum is the least-biased estimator of true engine cost — the
    # median of 2 reps of the heaviest item swings ±50% run-to-run
    # (measured r7: encode reps 2.79-6.36 s on back-to-back rested
    # captures). "value" stays the median for protocol continuity.
    query_secs_best = {
        name: round(min(ts), 3) for name, ts in timings.items()
    }
    enc_secs = statistics.median(timings["encode_corpus"])
    dec_secs = statistics.median(timings["decode_corpus"])
    enc_bytes = enc_bytes_box[0]
    encode_gbps = logical_bytes / enc_secs / 1e9

    probe_after = throttle_probe(CPUS)
    eff_min = min(probe_before["effective_cores"], probe_after["effective_cores"])
    throttled = eff_min < THROTTLE_EFF_FRACTION * CPUS

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "corpus_encode_throughput",
        "value": round(encode_gbps, 4),
        "unit": "GB/s",
        "queries": query_secs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "bench_rows": BENCH_ROWS,
        "logical_bytes": int(logical_bytes),
        "encoded_bytes": enc_bytes,
        "reference_parquet_bytes": ref_bytes,
        "compression_ratio": round(enc_bytes / logical_bytes, 4),
        "vs_reference_parquet": round(enc_bytes / ref_bytes, 4),
        "decode_gbps": round(logical_bytes / dec_secs / 1e9, 4),
        "queries_best": query_secs_best,
        "encode_gbps_best": round(
            logical_bytes / query_secs_best["encode_corpus"] / 1e9, 4
        ),
        "decode_gbps_best": round(
            logical_bytes / query_secs_best["decode_corpus"] / 1e9, 4
        ),
        "cpus": CPUS,
        # burst-credit guard (VERDICT r5 #1): effective parallel cores
        # measured before and after the suite; "throttled": true means the
        # box could not sustain THROTTLE_EFF_FRACTION × cpus and every
        # wall-time above overstates the engine's cost — re-run after a
        # 30-min idle window (BASELINE.md protocol) before comparing
        "probe_before": probe_before,
        "probe_after": probe_after,
        "throttled": throttled,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
