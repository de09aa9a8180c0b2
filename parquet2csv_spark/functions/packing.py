"""Sequence packing: assign documents to fixed-token-budget training
sequences — the "concat-and-chunk" step of an LLM data pipeline.

The assignment is a pure function of the global token prefix-sum in a
caller-chosen total order, so it is deterministic and embarrassingly
re-computable. A naive Spark expression of it —
``sum(tokens) over (order by ...)`` — collapses to a SINGLE partition
(a global window has one partition), which is exactly the kind of plan
that dies at 100 TB. Instead the prefix sum is computed with the classic
two-pass distributed scheme:

  1. ``repartitionByRange`` on the order column; per-range aggregate of
     (token total, min order value, max order value) — ONE row per
     partition, a bounded driver collect;
  2. exclusive prefix offsets over those totals on the driver;
  3. a second pass over the ORIGINAL frame: each row finds its range BY
     VALUE via a broadcast range join, then a per-range running-sum
     window (parallel across ranges) plus the broadcast offset gives the
     exact global prefix sum.

Because pass 2 locates ranges by value interval — not by reproducing the
sampled physical partitioning — nothing needs to be persisted and the
result cannot depend on RangePartitioner's per-job bound sampling.

Documents are never split across sequences (doc-preserving packing): a
document starts in the sequence its exclusive prefix lands in, so a
sequence can overshoot the budget by at most one document's tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``(key, n_tokens, seq_id, seq_offset)``: the training
    sequence each document is packed into and its token offset inside it.

    ``order_col`` (default: ``key_col``) must be unique and non-null —
    it defines the deterministic global packing order.

    The input must be DETERMINISTIC across evaluations: the two passes
    (pass-1 per-range totals, pass-2 range join) each evaluate ``df``, so
    an input with ``rand()``/sampling upstream, or a source mutating
    between jobs, would make pass-1 offsets disagree with pass-2 rows and
    silently mis-assign ``seq_id``/``seq_offset``. Persist such inputs (or
    write them out) before calling.
    """
    order_col = order_col or key_col
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 4
    d = df.select(
        F.col(key_col).alias("_key"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.col(order_col).alias("_ord"),
    )
    # pass 1: per-range totals + the VALUE interval each range covers
    parts = (
        d.repartitionByRange(num_partitions, "_ord")
        .groupBy(F.spark_partition_id().alias("_part"))
        .agg(
            F.sum("n_tokens").alias("_ptot"),
            F.min("_ord").alias("_lo"),
            F.max("_ord").alias("_hi"),
        )
        .collect()
    )
    parts.sort(key=lambda r: r["_part"])  # range partitions ascend by value
    acc = 0
    ranges = []
    for r in parts:
        ranges.append((r["_lo"], r["_hi"], acc))
        acc += r["_ptot"]
    if not ranges:
        return d.select(
            F.col("_key").alias(key_col),
            "n_tokens",
            F.lit(None).cast("long").alias("seq_id"),
            F.lit(None).cast("long").alias("seq_offset"),
        )
    rdf = spark.createDataFrame(
        [(i, lo, hi, off) for i, (lo, hi, off) in enumerate(ranges)],
        ["_rid", "_lo", "_hi", "_poff"],
    )
    # pass 2: locate each row's range by value (ranges are disjoint and
    # cover every _ord — unique, non-null order values can't straddle)
    joined = d.join(
        F.broadcast(rdf),
        (d["_ord"] >= rdf["_lo"]) & (d["_ord"] <= rdf["_hi"]),
    )
    w = (
        Window.partitionBy("_rid")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(
            "_prev", F.sum("n_tokens").over(w) + F.col("_poff") - F.col("n_tokens")
        )
        .select(
            F.col("_key").alias(key_col),
            "n_tokens",
            # integer `div`, not floor(double division): at extreme prefix
            # sums double rounding could disagree with the exact modulo
            F.expr(f"_prev div {int(budget)}").alias("seq_id"),
            F.expr(f"_prev % {int(budget)}").alias("seq_offset"),
        )
    )
