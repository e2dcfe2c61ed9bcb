"""Real-Iceberg routing for the table layer (SURVEY.md §7.0).

``open_table`` is the single entry point: when the session carries the
auto-detected Iceberg catalog (session.py probes for the runtime jar
at build time), it returns an ``IcebergTable`` speaking the identical
append / overwrite_partition / read(snapshot_id) protocol through the
real catalog; otherwise the from-scratch snapshot-manifest
``SnapshotTable`` stands in. Callers never branch.

The Iceberg path cannot execute in this offline sandbox (no runtime
jar resolves — the probe returning None IS the tested behavior); it
is kept deliberately thin: every call maps 1:1 onto a documented
Iceberg Spark SQL/DataFrame surface, no logic of its own.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from gelos_spark.session import ICEBERG_CATALOG
from gelos_spark.tables.snapshot import SnapshotTable


def iceberg_enabled(spark: SparkSession) -> bool:
    """True when the session was built with the Iceberg catalog (the
    runtime jar resolved at session build)."""
    try:
        return bool(spark.conf.get(f"spark.sql.catalog.{ICEBERG_CATALOG}"))
    except Exception:
        return False


def _ident(name: str) -> str:
    if not re.fullmatch(r"[A-Za-z0-9_.]+", name):
        raise ValueError(f"table name must be a catalog identifier, got {name!r}")
    return f"{ICEBERG_CATALOG}.{name}"


class IcebergTable:
    """SnapshotTable-shaped facade over a real Iceberg table."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.ident = _ident(name)

    def append(self, df: DataFrame, partition: str | None = None) -> int:
        df.writeTo(self.ident).createOrReplace() if not self._exists() else df.writeTo(
            self.ident
        ).append()
        return self.current_snapshot_id()

    def overwrite_partition(self, df: DataFrame, partition: str) -> int:
        df.writeTo(self.ident).overwritePartitions()
        return self.current_snapshot_id()

    def read(self, spark: SparkSession | None = None, snapshot_id: int | None = None) -> DataFrame:
        sp = spark or self.spark
        r = sp.read
        if snapshot_id is not None:
            r = r.option("snapshot-id", str(snapshot_id))
        return r.table(self.ident)

    read_at = read

    def current_snapshot_id(self) -> int | None:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else None

    def snapshots(self) -> list[int]:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.snapshots ORDER BY committed_at"
        ).collect()
        return [int(r[0]) for r in rows]

    def _exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)


def open_table(spark: SparkSession, root: str, name: str | None = None):
    """Route to real Iceberg when the session carries the catalog,
    else the snapshot-manifest layer. ``root`` is the fallback's
    filesystem root; ``name`` (default: derived from root's basename)
    is the Iceberg identifier."""
    if iceberg_enabled(spark):
        import os

        return IcebergTable(spark, name or os.path.basename(root.rstrip("/")))
    return SnapshotTable(root)
