"""Snapshot-pinned table catalog.

Production path: Iceberg (``spark.read.format("iceberg")`` with
``snapshot-id`` pinned) — resumable encodes must see a frozen input
(SURVEY.md §2.2 scans row). The sandbox has no Iceberg runtime jar, so the
same interface is provided over a plain parquet directory: the snapshot id
is a content manifest hash (file list + sizes + mtimes), and reads verify
the manifest so a mutated directory fails loudly instead of silently
violating resume exactness.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    table_path: str
    snapshot_id: str
    n_files: int
    total_bytes: int


def _manifest(path: str) -> tuple[str, int, int]:
    entries = []
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            fp = os.path.join(root, f)
            st = os.stat(fp)
            entries.append(f"{os.path.relpath(fp, path)}:{st.st_size}:{int(st.st_mtime)}")
            total += st.st_size
    digest = hashlib.sha256("\n".join(entries).encode()).hexdigest()[:16]
    return digest, len(entries), total


class ParquetDirCatalog:
    """Directory-of-parquet catalog with manifest-hash snapshot ids."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def snapshot(self, table_path: str) -> Snapshot:
        digest, n, total = _manifest(table_path)
        return Snapshot(table_path, digest, n, total)

    def read(self, snap: Snapshot, verify: bool = True) -> DataFrame:
        if verify:
            digest, _, _ = _manifest(snap.table_path)
            if digest != snap.snapshot_id:
                raise RuntimeError(
                    f"snapshot {snap.snapshot_id} no longer matches {snap.table_path} "
                    f"(now {digest}) — input mutated since the job was planned"
                )
        return self.spark.read.parquet(snap.table_path)


class IcebergCatalog:
    """Production catalog: requires the Iceberg runtime jar on the
    classpath; import-guarded so the sandbox falls back cleanly."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        jvm_has_iceberg = False
        try:
            # Class.forName raises when absent (attribute access on _jvm
            # returns a JavaPackage stub without error)
            spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # type: ignore[attr-defined]
            jvm_has_iceberg = True
        except Exception:
            pass
        if not jvm_has_iceberg:
            raise ImportError(
                "Iceberg runtime jar not on classpath — use ParquetDirCatalog"
            )

    def read(self, table: str, snapshot_id: int | None = None) -> DataFrame:
        r = self.spark.read.format("iceberg")
        if snapshot_id is not None:
            r = r.option("snapshot-id", str(snapshot_id))
        return r.load(table)


def open_catalog(spark: SparkSession):
    """Iceberg when available, parquet-dir otherwise."""
    try:
        return IcebergCatalog(spark)
    except ImportError:
        return ParquetDirCatalog(spark)
