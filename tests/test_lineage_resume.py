"""Lineage + exact-resume tests (SURVEY.md §5.2-5) and skew-cap tests (§5.2-6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet2csv_spark.operators import decode_table, multiset_diff
from parquet2csv_spark.operators.encode import salt_groups
from parquet2csv_spark.plans.lineage import EncodeJob
from parquet2csv_spark.sources.corpus import CORPUS_DDL, generate_corpus

N_ROWS = 6000


@pytest.fixture(scope="module")
def corpus(spark):
    df = generate_corpus(spark, N_ROWS, seed=42)
    df.cache().count()
    return df


def test_resume_encodes_only_missing_groups(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("job"))
    job = EncodeJob(spark, out, snapshot_id="snap1", chunk_rows=1024, chunk_bytes=1 << 20)

    # simulated crash: first run commits only groups whose key contains '0'
    r1 = job.run(corpus, only_groups_like="0")
    assert 0 < r1["groups_done"]

    # second run completes the rest; first-run groups must NOT be re-encoded
    r2 = job.run(corpus)
    lin = job.lineage()
    assert lin.filter(F.col("run_id") == r2["run_id"]).join(
        lin.filter(F.col("run_id") == r1["run_id"]).select("group_key"),
        on="group_key",
    ).count() == 0

    # decode from committed chunks = bit-identical corpus
    dec = decode_table(job.chunks(), CORPUS_DDL)
    assert multiset_diff(corpus, dec).count() == 0

    # a third run is a no-op (fully committed)
    done_before = job.done_groups().count()
    r3 = job.run(corpus)
    assert job.lineage().filter(F.col("run_id") == r3["run_id"]).count() == 0
    assert job.done_groups().count() == done_before


def test_lineage_records_metrics(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("job2"))
    job = EncodeJob(spark, out, snapshot_id="snapA", chunk_rows=2048)
    job.run(corpus)
    lin = job.lineage()
    row = lin.orderBy(F.desc("raw_bytes")).first()
    assert row["status"] == "done"
    assert row["raw_bytes"] > 0 and row["enc_bytes"] > 0
    assert row["wall_ms"] >= 0
    assert row["codecs"]  # codec tags recorded per group
    assert row["committed_at"] is not None


def test_salting_caps_group_bytes(spark, corpus):
    """One repo holds >35% of rows; post-salting no group may exceed
    the target group size by more than one max-row overshoot."""
    chunk_bytes = 1 << 20
    salted = salt_groups(corpus, ["repo"], ["path", "commit"], chunk_bytes=chunk_bytes, group_factor=1)
    sizes = (
        salted.groupBy("_gk")
        .agg(F.sum(F.coalesce(F.octet_length("content"), F.lit(0)) + 64).alias("gbytes"))
    )
    target = chunk_bytes
    # statistical salting: allow 2x headroom over the target + one max row
    over = sizes.filter(F.col("gbytes") > 2 * target + 66000).count()
    assert over == 0
    # the giant repo actually got split into many salted groups
    giant = (
        corpus.groupBy("repo").count().orderBy(F.desc("count")).first()["repo"]
    )
    n_giant_groups = salted.filter(F.col("repo") == giant).select("_gk").distinct().count()
    assert n_giant_groups > 2


def test_verify_ignores_orphan_chunks(spark, corpus, tmp_path_factory):
    """ADVICE r1: a crashed run can leave orphan chunk files (written before
    the lineage commit). EncodeJob.chunks() must make them invisible so
    verification over committed chunks stays bit-identical — reading the
    raw chunks directory instead would decode duplicates and fail."""
    out = str(tmp_path_factory.mktemp("orphan_job"))
    job = EncodeJob(spark, out, snapshot_id="snapX", chunk_rows=1024, chunk_bytes=1 << 20)
    job.run(corpus)

    # simulate the crash artifact: copy one committed run's chunk rows into
    # an uncommitted run directory (no lineage row for run 'deadbeef')
    some = spark.read.parquet(f"{out}/chunks").limit(3)
    some.drop("run").write.mode("overwrite").parquet(f"{out}/chunks/run=deadbeef")

    raw = spark.read.parquet(f"{out}/chunks")
    committed = job.chunks()
    assert raw.count() == committed.count() + 3  # orphans visible raw only
    dec = decode_table(committed, CORPUS_DDL)
    assert multiset_diff(corpus, dec).count() == 0  # still bit-identical
    # decoding the RAW directory would contain duplicates (the failure the
    # lineage join prevents)
    dec_raw = decode_table(raw.drop("run"), CORPUS_DDL)
    assert multiset_diff(corpus, dec_raw).count() > 0


def test_resume_refuses_changed_salting_params(spark, corpus, tmp_path_factory):
    """Changing salting/chunking params between runs of the same
    (snapshot, job) would re-encode every group under NEW salted keys while
    chunks() also returns the OLD committed ones → duplicates. run() must
    refuse instead."""
    out = str(tmp_path_factory.mktemp("params_job"))
    EncodeJob(spark, out, snapshot_id="s1", chunk_rows=1024, chunk_bytes=1 << 20).run(corpus)
    clashing = EncodeJob(spark, out, snapshot_id="s1", chunk_rows=1024,
                         chunk_bytes=1 << 20, group_factor=2)
    with pytest.raises(RuntimeError, match="params"):
        clashing.run(corpus)
    # a different job_id is fine
    EncodeJob(spark, out, snapshot_id="s1", job_id="other", chunk_rows=1024,
              chunk_bytes=1 << 20, group_factor=2).run(corpus)


def test_resume_refuses_legacy_lineage_missing_params(spark, corpus, tmp_path_factory):
    """Lineage rows written before params tracking (or with null params)
    carry no record of their salting config; defaults have changed since
    (group_factor 2→1), so a silent resume could duplicate groups. run()
    must refuse unless the caller asserts the legacy params explicitly."""
    out = str(tmp_path_factory.mktemp("legacy_job"))
    job = EncodeJob(spark, out, snapshot_id="sL", chunk_rows=1024, chunk_bytes=1 << 20)
    job.run(corpus)
    # simulate a pre-params lineage dir: rewrite it without the column
    legacy = spark.read.parquet(f"{out}/lineage").drop("params")
    legacy.write.mode("overwrite").parquet(f"{out}/lineage_tmp")
    import shutil
    shutil.rmtree(f"{out}/lineage")
    shutil.move(f"{out}/lineage_tmp", f"{out}/lineage")

    again = EncodeJob(spark, out, snapshot_id="sL", chunk_rows=1024, chunk_bytes=1 << 20)
    with pytest.raises(RuntimeError, match="legacy_params"):
        again.run(corpus)
    # explicit assertion of the original params unblocks the resume
    ok = EncodeJob(spark, out, snapshot_id="sL", chunk_rows=1024, chunk_bytes=1 << 20,
                   legacy_params=again.params)
    ok.run(corpus)


def test_chunks_dedupe_never_shuffles_frame_payloads(spark, corpus, tmp_path_factory):
    """VERDICT r3 #4: resolving double-committed chunk ids must not
    hash-exchange the binary frame payloads. Every (non-broadcast) Exchange
    in the chunks() plan may carry only projected id/run columns — never
    the `cols` struct holding the frames."""
    import re

    out = str(tmp_path_factory.mktemp("plan_job"))
    job = EncodeJob(spark, out, snapshot_id="snapP", chunk_rows=1024, chunk_bytes=1 << 20)
    job.run(corpus)
    df = job.chunks()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # formatted explain: each operator block starts "(n) <Name>" and lists
    # its input columns; broadcast exchanges are named BroadcastExchange
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    shuffles = [b for b in blocks if re.match(r"\(\d+\) Exchange\b", b)]
    for b in shuffles:
        assert "cols#" not in b, b


def test_double_committed_group_resolves_to_single_run(spark, corpus, tmp_path_factory):
    """Duplicate chunk files must never decode twice, in either class:
    (1) an orphan run (crash after chunk write, before lineage append) has
    no lineage row — invisible; (2) a concurrent double-commit (the same
    groups 'done' under TWO run_ids) resolves to one committed run per
    group via min(run_id). Both decode bit-identically."""
    import os
    import shutil

    out = str(tmp_path_factory.mktemp("double_job"))
    job = EncodeJob(spark, out, snapshot_id="snapD", chunk_rows=1024, chunk_bytes=1 << 20)
    job.run(corpus)
    chunks_dir = f"{out}/chunks"
    runs = [d for d in os.listdir(chunks_dir) if d.startswith("run=")]
    # deterministic encode → a re-committed generation is byte-identical;
    # simulate it by duplicating the whole run dir under a second run id
    shutil.copytree(
        os.path.join(chunks_dir, runs[0]),
        os.path.join(chunks_dir, "run=zzduplicate0"),
    )
    # case 1: duplicate files, no lineage row — orphan, invisible
    got = job.chunks()
    assert got.groupBy("chunk_id").count().filter("count > 1").count() == 0
    assert got.select("run").distinct().count() == 1
    assert multiset_diff(corpus, decode_table(got, CORPUS_DDL)).count() == 0

    # case 2: the duplicate run ALSO commits lineage (concurrent runs) —
    # min(run_id) pins one run per group, never mixing runs within a group
    lin = spark.read.option("mergeSchema", True).parquet(f"{out}/lineage")
    dup_lineage = lin.withColumn("run_id", F.lit("zzduplicate0"))
    dup_lineage.write.mode("append").parquet(f"{out}/lineage")
    got2 = job.chunks()
    assert got2.groupBy("chunk_id").count().filter("count > 1").count() == 0
    assert got2.select("run").distinct().count() == 1
    assert multiset_diff(corpus, decode_table(got2, CORPUS_DDL)).count() == 0


def test_digest_format_migration_refused(spark, corpus, tmp_path_factory):
    """ADVICE r3: lineage committed under an older manifest-digest format
    must not silently reset resume state (the same unchanged input hashes
    to a new id → zero done groups → full re-encode into the same out_dir).
    run() detects the version mismatch and refuses."""
    out = str(tmp_path_factory.mktemp("digest_job"))
    old = EncodeJob(spark, out, snapshot_id="0123456789abcdef",  # pre-versioned id
                    chunk_rows=1024, chunk_bytes=1 << 20)
    old.run(corpus)
    new = EncodeJob(spark, out, snapshot_id="m2-0123456789abcdef",
                    chunk_rows=1024, chunk_bytes=1 << 20)
    with pytest.raises(RuntimeError, match="manifest-digest"):
        new.run(corpus)
    # a fresh job_id under the new format is allowed
    EncodeJob(spark, out, snapshot_id="m2-0123456789abcdef", job_id="fresh",
              chunk_rows=1024, chunk_bytes=1 << 20).run(corpus)


def test_chunks_survive_numeric_looking_run_ids(spark, corpus, tmp_path_factory):
    """~1 in 280 uuid-hex run ids is all digits; partition type inference
    would parse run=012345678901 as a Long, drop the leading zero, and the
    (group_key, run) semi-join would silently exclude the whole committed
    run. chunks() must read the partition column as a string."""
    import os
    import shutil

    out = str(tmp_path_factory.mktemp("numeric_run"))
    job = EncodeJob(spark, out, snapshot_id="snapN", chunk_rows=1024, chunk_bytes=1 << 20)
    job.run(corpus)
    chunks_dir = f"{out}/chunks"
    old = [d for d in os.listdir(chunks_dir) if d.startswith("run=")][0]
    shutil.move(os.path.join(chunks_dir, old), os.path.join(chunks_dir, "run=012345678901"))
    lin = spark.read.option("mergeSchema", True).parquet(f"{out}/lineage")
    lin.withColumn("run_id", F.lit("012345678901")).write.mode("overwrite").parquet(
        f"{out}/lineage_tmp"
    )
    shutil.rmtree(f"{out}/lineage")
    shutil.move(f"{out}/lineage_tmp", f"{out}/lineage")

    got = EncodeJob(spark, out, snapshot_id="snapN", chunk_rows=1024, chunk_bytes=1 << 20).chunks()
    assert got.count() > 0
    assert multiset_diff(corpus, decode_table(got, CORPUS_DDL)).count() == 0
