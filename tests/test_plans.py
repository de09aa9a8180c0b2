"""Physical-plan hygiene: the properties that keep the engine fast at
100 TB — predicate pushdown + column pruning reach the parquet scan,
small sides broadcast, the grouped encode shuffles exactly once on the
salted key (SURVEY.md §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet2csv_spark.operators.encode import encode_grouped, salt_groups
from parquet2csv_spark.sources.corpus import generate_corpus


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_and_projection_pushed_to_scan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.filter(F.col("doc_id") < 100).select("doc_id", "lang")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in plan, plan
    # column pruning: the scan must not read text/source/n_chars
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema and "n_chars" not in read_schema


def test_small_dim_join_broadcasts(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dims = spark.createDataFrame([("en", 1), ("de", 2)], "lang string, lid int")
    plan = _plan(docs.join(F.broadcast(dims), "lang"))
    assert "BroadcastHashJoin" in plan


def test_grouped_encode_single_data_shuffle(spark):
    corpus = generate_corpus(spark, 2000, seed=42)
    chunks = encode_grouped(corpus, ["repo"], ["path", "commit"], chunk_rows=512)
    plan = _plan(chunks)
    # the salt-count join must be broadcast (no shuffle of the big side for it)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    # data-side shuffles: one for the sizes agg (small), one hash-partitioning
    # of the salted key for applyInArrow — no more
    import re

    shuffle_ids = set(re.findall(r"(?<!Broadcast)Exchange \((\d+)\)", plan))
    assert len(shuffle_ids) <= 2, plan


def test_salting_key_is_deterministic_expression(spark):
    corpus = generate_corpus(spark, 1000, seed=42)
    a = salt_groups(corpus, ["repo"], ["path", "commit"]).select("_gk")
    b = salt_groups(corpus, ["repo"], ["path", "commit"]).select("_gk")
    assert a.exceptAll(b).count() == 0


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing: two tables bucketed on the join key co-locate — the join
    plan has NO shuffle exchange (SURVEY.md §2.2 partitioning row; at 100TB
    this is how repeated joins on chunk/group keys amortize their shuffle)."""
    import re
    import uuid

    suffix = uuid.uuid4().hex[:8]
    a, b = f"bkt_a_{suffix}", f"bkt_b_{suffix}"
    spark.range(0, 10000).withColumnRenamed("id", "k").write.bucketBy(
        8, "k"
    ).sortBy("k").mode("overwrite").saveAsTable(a)
    spark.range(0, 10000).withColumnRenamed("id", "k").write.bucketBy(
        8, "k"
    ).sortBy("k").mode("overwrite").saveAsTable(b)
    joined = spark.table(a).join(spark.table(b), "k")
    plan = _plan(joined)
    shuffle_ids = set(re.findall(r"(?<!Broadcast)Exchange \((\d+)\)", plan))
    assert not shuffle_ids, plan
    assert joined.count() == 10000
    spark.sql(f"DROP TABLE {a}")
    spark.sql(f"DROP TABLE {b}")


def test_star_join_broadcasts_dims(spark):
    """join_revenue_by_nation: both dims broadcast — the fact table reaches
    the aggregation without a join shuffle (only the tiny per-nation agg
    exchanges)."""
    import re

    import __spark_entry__ as entry

    df = entry.q_join_revenue_by_nation(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
