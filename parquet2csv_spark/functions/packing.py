"""Sequence packing: assign documents to fixed-token-budget training
sequences — the "concat-and-chunk" step of an LLM data pipeline.

The assignment is a pure function of the global token prefix-sum in a
caller-chosen total order, so it is deterministic and embarrassingly
re-computable. A naive Spark expression of it —
``sum(tokens) over (order by ...)`` — collapses to a SINGLE partition
(a global window has one partition), which is exactly the kind of plan
that dies at 100 TB. Instead the prefix sum is computed with the classic
two-pass distributed scheme:

  1. ``repartitionByRange`` on the order column (ranges ascend with
     physical partition id);
  2. one tiny aggregate: per-partition token totals (ONE row per
     partition, bounded driver collect);
  3. exclusive prefix offsets over those totals, broadcast back;
  4. a per-partition running-sum window (parallel across partitions)
     plus the broadcast offset = the exact global prefix sum.

Documents are never split across sequences (doc-preserving packing): a
document starts in the sequence its exclusive prefix lands in, so a
sequence can overshoot the budget by at most one document's tokens.
The range partitioner's sampled bounds may vary between runs, but the
result is a function of the global order only — bounds placement cannot
change any output row (order ties must be impossible: use a unique
order column).
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

    ``order_col`` (default: ``key_col``) must be unique — it defines the
    deterministic global packing order.
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
    # persist BEFORE the totals job: RangePartitioner samples its bounds
    # per physical planning, so two independent jobs over the same lazy
    # plan could place rows in different partitions — the broadcast
    # offsets would then join against the wrong partition ids. Caching
    # pins one materialized partitioning that both passes share (lost
    # blocks replay the same frozen shuffle, not a fresh sample).
    ranged = (
        d.repartitionByRange(num_partitions, "_ord")
        .withColumn("_part", F.spark_partition_id())
        .persist()
    )
    # per-partition totals: ONE row per partition — the collect is bounded
    # by the partition count, never by the data
    totals = sorted(
        ranged.groupBy("_part").agg(F.sum("n_tokens").alias("_ptot")).collect(),
        key=lambda r: r["_part"],
    )
    offs, acc = [], 0
    for r in totals:
        offs.append((r["_part"], acc))
        acc += r["_ptot"]
    off_df = spark.createDataFrame(offs or [(0, 0)], "_part int, _poff long")
    w = (
        Window.partitionBy("_part")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.sum("n_tokens").over(w) + F.col("_poff") - F.col("n_tokens")
    return (
        ranged.join(F.broadcast(off_df), on="_part")
        .select(
            F.col("_key").alias(key_col),
            "n_tokens",
            F.floor(prev / F.lit(budget)).alias("seq_id"),
            (prev % F.lit(budget)).alias("seq_offset"),
        )
    )
