"""Lineage + exact resume of partially completed encode jobs (north_star).

Every completed group emits a lineage record (input snapshot id, group key,
chunk count/range, codecs, bytes, wall-time) to a checkpoint table. A re-run
of the same (snapshot, job) anti-joins the pending salted groups against
the checkpoint and encodes ONLY the missing ones — exact resume. This is
batch state the reference has no analog for (it reprocesses whole files,
DataLoad.java:256-304); SURVEY.md §2.2 maps it to the joins/set-ops rows.

Crash-consistency model (no transactional catalog needed in the sandbox;
Iceberg's atomic append is the production drop-in):
  1. chunk files for a run are written under ``chunks/run=<run_id>/``;
  2. lineage rows for the run are appended only AFTER the chunk write
     completes (write-ahead of data, commit = lineage append);
  3. a crash between (1) and (2) leaves orphan chunk files; readers join
     chunks against lineage (status='done') so orphans are invisible, and
     the next resume re-encodes those groups multiset-exactly: re-encoded
     frames may differ byte-for-byte run-to-run (the grouped path's
     worker-lifetime codec cache makes spec choice schedule-dependent),
     so ``chunks()`` reads exactly one committed run per group — the
     min(run_id) semi-join below — and decode equality, not byte identity,
     is the contract (verified in tests).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.encode import (
    DEFAULT_CHUNK_BYTES,
    DEFAULT_CHUNK_ROWS,
    encode_salted,
    salt_groups,
)

LINEAGE_DDL = (
    "snapshot_id string, job_id string, run_id string, group_key string, "
    "n_chunks bigint, n_rows bigint, raw_bytes bigint, enc_bytes bigint, "
    "wall_ms bigint, codecs string, status string, committed_at timestamp, "
    "params string"
)


class EncodeJob:
    """A resumable encode of one table snapshot into a chunks directory.

    Layout under ``out_dir``:
      chunks/run=<run_id>/*.parquet   — chunk rows (CHUNKS_DDL)
      lineage/*.parquet               — LINEAGE_DDL records
    """

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        snapshot_id: str,
        job_id: str = "encode",
        group_cols: list[str] | None = None,
        order_cols: list[str] | None = None,
        chunk_rows: int = DEFAULT_CHUNK_ROWS,
        chunk_bytes: int = DEFAULT_CHUNK_BYTES,
        group_factor: int = 1,
        legacy_params: str | None = None,
    ):
        self.spark = spark
        self.out_dir = out_dir.rstrip("/")
        # explicit caller assertion of the salting/chunking params a
        # pre-params lineage dir was written with — required to resume
        # lineage rows that predate the params column (see run())
        self.legacy_params = legacy_params
        self.snapshot_id = snapshot_id
        self.job_id = job_id
        self.group_cols = group_cols or ["repo"]
        self.order_cols = order_cols or ["path", "commit"]
        self.chunk_rows = chunk_rows
        self.chunk_bytes = chunk_bytes
        self.group_factor = group_factor
        # the salting/chunking parameters ARE part of the resume identity:
        # a different group_factor/chunk_bytes produces different salted
        # group keys, so resuming with changed params would re-encode
        # everything under NEW keys while chunks() still returns the OLD
        # committed groups too — duplicate rows. run() refuses the mismatch.
        # ord=nl records the within-group null-ordering convention
        # (asc_nulls_last, matching the r2-era pyarrow sort_indices default).
        # r3 briefly shipped Spark's default NULLS FIRST; folding the
        # convention into params means a resume against an r3-era dir is
        # refused like any other param mismatch instead of silently
        # producing differently-ordered chunks under the same gk:seq ids.
        self.params = (
            f"gc={','.join(self.group_cols)};oc={','.join(self.order_cols)};"
            f"cr={chunk_rows};cb={chunk_bytes};gf={group_factor};ord=nl"
        )

    # ------------------------------------------------------------ lineage io

    def lineage(self) -> DataFrame:
        try:
            # mergeSchema: a lineage dir mixing pre-params and post-params
            # files must not drop the params column depending on which
            # file's footer Spark happens to sample
            return self.spark.read.option("mergeSchema", True).parquet(
                f"{self.out_dir}/lineage"
            )
        except Exception:
            return self.spark.createDataFrame([], LINEAGE_DDL)

    def done_groups(self) -> DataFrame:
        return (
            self.lineage()
            .filter(
                (F.col("snapshot_id") == self.snapshot_id)
                & (F.col("job_id") == self.job_id)
                & (F.col("status") == "done")
            )
            .select(F.col("group_key").alias("_gk"))
            .distinct()
        )

    # --------------------------------------------------------------- running

    def _check_digest_migration(self) -> None:
        """Refuse to resume across a manifest-digest format change.

        The catalog embeds a version in every snapshot id (catalog.py
        DIGEST_VERSION). When the current id carries the current version but
        this job_id's lineage holds rows whose ids don't, those rows were
        committed under an older digest format: the SAME unchanged input now
        hashes to a DIFFERENT id, so a silent resume would see zero done
        groups and re-encode every group into this out_dir — a second
        generation under identical group keys. Fail with a migration message
        instead. (Hand-assigned snapshot ids skip the check.)
        """
        from ..sources.catalog import DIGEST_VERSION

        prefix = f"{DIGEST_VERSION}-"
        if not self.snapshot_id.startswith(prefix):
            return
        stale = (
            self.lineage()
            .filter(
                (F.col("job_id") == self.job_id)
                & (F.col("status") == "done")
                & ~F.col("snapshot_id").startswith(prefix)
            )
            .select("snapshot_id")
            .limit(1)
            .collect()
        )
        if stale:
            raise RuntimeError(
                f"lineage for job_id={self.job_id!r} contains snapshot ids in a "
                f"pre-{DIGEST_VERSION} manifest-digest format (e.g. "
                f"{stale[0]['snapshot_id']!r}); the digest inputs have changed "
                f"since, so resume state for this out_dir cannot be trusted — "
                f"encode into a new out_dir (or new job_id), or decode the old "
                f"generation with the tooling that wrote it"
            )

    def run(self, df: DataFrame, only_groups_like: str | None = None) -> dict:
        """Encode all groups not yet committed. Returns driver-side summary.

        ``only_groups_like``: test hook — restrict THIS run to pending
        groups whose key contains the substring, simulating a job that
        crashed after committing only part of its groups (same snapshot →
        same salting → the next run picks up exactly the rest).
        """
        run_id = uuid.uuid4().hex[:12]
        t0 = time.time()
        self._check_digest_migration()
        prior = self.lineage().filter(
            (F.col("snapshot_id") == self.snapshot_id)
            & (F.col("job_id") == self.job_id)
        )
        if "params" in prior.columns:
            mismatched = prior.filter(
                F.col("params").isNotNull() & (F.col("params") != self.params)
            ).limit(1).collect()
            if mismatched:
                raise RuntimeError(
                    f"lineage for (snapshot={self.snapshot_id}, job={self.job_id}) "
                    f"was committed with different salting/chunking params "
                    f"({mismatched[0]['params']!r} != {self.params!r}) — resume "
                    f"would duplicate groups; use a new job_id or the original params"
                )
            legacy = prior.filter(F.col("params").isNull()).limit(1).collect()
        else:
            # the whole column is absent → every prior row predates params
            legacy = prior.limit(1).collect()
        if legacy and self.legacy_params != self.params:
            # rows written before params tracking carry no record of their
            # salting config; defaults have changed since (group_factor
            # 2 → 1), so silently resuming would re-encode those groups
            # under NEW salted keys while chunks() still returns the old
            # committed groups → duplicate rows. Caller must assert the
            # legacy params match the current ones to proceed.
            raise RuntimeError(
                f"lineage for (snapshot={self.snapshot_id}, job={self.job_id}) "
                f"contains rows without recorded salting/chunking params — "
                f"cannot prove a resume is duplicate-free. Pass "
                f"legacy_params={self.params!r} (the params string the "
                f"original run used) to resume, or use a new job_id"
            )
        salted = salt_groups(
            df, self.group_cols, self.order_cols, self.chunk_bytes,
            self.group_factor,
        )
        pending = salted.join(self.done_groups(), on="_gk", how="left_anti")
        if only_groups_like is not None:
            pending = pending.filter(F.col("_gk").contains(only_groups_like))
        chunks = encode_salted(
            pending, self.order_cols, self.chunk_rows, self.chunk_bytes
        )
        chunks.write.mode("append").parquet(f"{self.out_dir}/chunks/run={run_id}")

        # commit: lineage rows derived FROM the persisted chunk files
        written = self.spark.read.parquet(f"{self.out_dir}/chunks/run={run_id}")
        stats = written.groupBy("group_key").agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.sum("wall_ms").alias("wall_ms"),
        )
        codecs = (
            written.select("group_key", F.explode("cols").alias("c"))
            .groupBy("group_key")
            .agg(F.concat_ws(",", F.sort_array(F.collect_set("c.codec"))).alias("codecs"))
        )
        lineage_rows = (
            stats.join(codecs, on="group_key")
            .select(
                F.lit(self.snapshot_id).alias("snapshot_id"),
                F.lit(self.job_id).alias("job_id"),
                F.lit(run_id).alias("run_id"),
                "group_key", "n_chunks", "n_rows", "raw_bytes", "enc_bytes",
                "wall_ms", "codecs",
                F.lit("done").alias("status"),
                F.current_timestamp().alias("committed_at"),
                F.lit(self.params).alias("params"),
            )
        )
        lineage_rows.write.mode("append").parquet(f"{self.out_dir}/lineage")
        done = self.lineage().filter(
            (F.col("snapshot_id") == self.snapshot_id) & (F.col("status") == "done")
        )
        agg = done.agg(
            F.count("*").alias("groups"),
            F.sum("n_rows").alias("rows"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("enc_bytes").alias("enc"),
        ).first()
        return {
            "run_id": run_id,
            "wall_s": time.time() - t0,
            "groups_done": agg["groups"],
            "rows": agg["rows"],
            "raw_bytes": agg["raw"],
            "enc_bytes": agg["enc"],
        }

    # --------------------------------------------------------------- reading

    def chunks(self) -> DataFrame:
        """Committed chunks only, exactly one run per group.

        The lineage records which ``run_id`` committed each group, so the
        valid chunk set is the semi-join of the chunks files against the
        broadcast ``(group_key, min committed run)`` pairs of THIS
        (snapshot, job). That single join closes every duplicate class at
        once, with zero wide exchange of the binary frames:

        - orphan runs (crash after chunk write, before lineage append):
          their run_id has no lineage row — excluded;
        - another generation in the same out_dir (same group keys under a
          different snapshot/job — positional gk:seq chunk ids collide
          ACROSS generations, and a per-chunk-id winner pick could splice
          generations with different chunk counts): its runs belong to
          other lineage rows — excluded;
        - a group double-committed by concurrent runs: ``min(run_id)``
          pins one committed run per group, so a group's chunks are never
          mixed across runs even in that race.

        (An earlier version dropDuplicates'd on chunk_id, hash-exchanging
        every frame payload — a full-data shuffle at 100 TB — and could
        still splice coexisting generations; plan-asserted gone.)
        """
        from ..operators.encode import CHUNKS_DDL

        # explicit schema with `run string`: without it Spark's partition
        # TYPE INFERENCE parses the run=<12-hex> dir name, and an all-digit
        # hex id (~1 in 280 runs, e.g. run=012345678901 or 12e345678901)
        # becomes a Long/Double whose string form drops the leading zero /
        # gains an exponent — the semi-join below would then silently drop
        # that entire committed run (review finding r4)
        all_chunks = self.spark.read.schema(CHUNKS_DDL + ", run string").parquet(
            f"{self.out_dir}/chunks"
        )
        committed = (
            self.lineage()
            .filter(
                (F.col("snapshot_id") == self.snapshot_id)
                & (F.col("job_id") == self.job_id)
                & (F.col("status") == "done")
            )
            .groupBy("group_key")
            .agg(F.min("run_id").alias("run"))
        )
        return all_chunks.join(
            F.broadcast(committed), on=["group_key", "run"], how="left_semi"
        )
