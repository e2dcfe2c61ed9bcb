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
from pyspark.sql import functions as F

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


# SnapshotTable tags files with a partition VALUE (a string label);
# the Iceberg facade realizes the same semantics as a real partition
# column: every written row carries its label in ``_partition`` and
# the table is PARTITIONED BY it, so overwrite_partition can target
# exactly one label. Readers never see the bookkeeping column.
PARTITION_COL = "_partition"


class IcebergTable:
    """SnapshotTable-shaped facade over a real Iceberg table.

    Both writers honor their ``partition`` argument (SnapshotTable
    protocol: a string label tagging this commit's rows) and both
    create the table — partitioned by the label column — on first
    write, matching SnapshotTable's works-on-fresh-table behavior.
    ``overwrite_partition`` replaces ONLY the given label's rows via a
    targeted ``overwrite(condition)``; the previous implementation's
    ``overwritePartitions()`` on an unpartitioned table replaced the
    entire table (dynamic overwrite of the sole global partition)."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.ident = _ident(name)

    def _tag(self, df: DataFrame, partition: str | None) -> DataFrame:
        return df.withColumn(
            PARTITION_COL,
            F.lit(partition).cast("string"),
        )

    def _create(self, tagged: DataFrame) -> None:
        tagged.writeTo(self.ident).partitionedBy(F.col(PARTITION_COL)).create()

    def append(self, df: DataFrame, partition: str | None = None) -> int:
        tagged = self._tag(df, partition)
        if not self._exists():
            self._create(tagged)
        else:
            tagged.writeTo(self.ident).append()
        return self.current_snapshot_id()

    def overwrite_partition(self, df: DataFrame, partition: str) -> int:
        """Idempotent replace of every row tagged ``partition`` —
        other partitions are untouched (resume-safe, like
        SnapshotTable.overwrite_partition)."""
        tagged = self._tag(df, partition)
        if not self._exists():
            self._create(tagged)
        else:
            tagged.writeTo(self.ident).overwrite(F.col(PARTITION_COL) == F.lit(partition))
        return self.current_snapshot_id()

    def overwrite(self, df: DataFrame, partition: str | None = None) -> int:
        """Replace the whole table in one atomic snapshot."""
        tagged = self._tag(df, partition)
        if not self._exists():
            self._create(tagged)
        else:
            tagged.writeTo(self.ident).overwrite(F.lit(True))
        return self.current_snapshot_id()

    def read(self, spark: SparkSession | None = None, snapshot_id: int | None = None) -> DataFrame:
        sp = spark or self.spark
        r = sp.read
        if snapshot_id is not None:
            r = r.option("snapshot-id", str(snapshot_id))
        return r.table(self.ident).drop(PARTITION_COL)

    read_at = read

    def current_snapshot_id(self) -> int | None:
        # .history with is_current_ancestor, NOT .snapshots ordered by
        # committed_at: after rollback() the abandoned branch tip stays
        # in .snapshots (until expiry) with the newest commit time, but
        # it is no longer an ancestor of the current table state.
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.history "
            "WHERE is_current_ancestor ORDER BY made_current_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else None

    def snapshots(self) -> list[int]:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.snapshots ORDER BY committed_at"
        ).collect()
        return [int(r[0]) for r in rows]

    def _exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)

    def read_delta(
        self,
        spark: SparkSession | None = None,
        from_snapshot: int | None = None,
        to_snapshot: int | None = None,
    ) -> DataFrame:
        """Iceberg's incremental scan: rows appended after
        ``from_snapshot`` (exclusive) up to ``to_snapshot``
        (inclusive, default current) via the documented
        start/end-snapshot-id read options."""
        if from_snapshot is None:
            # match the SnapshotTable twin's contract (required param)
            # instead of shipping the literal string "None" to Iceberg
            raise ValueError("read_delta requires from_snapshot")
        sp = spark or self.spark
        r = sp.read.option("start-snapshot-id", str(from_snapshot))
        if to_snapshot is not None:
            r = r.option("end-snapshot-id", str(to_snapshot))
        return r.table(self.ident).drop(PARTITION_COL)

    def rollback(self, snapshot_id: int) -> int:
        """Iceberg's ``rollback_to_snapshot`` procedure."""
        name = self.ident.split(".", 1)[1]
        self.spark.sql(
            f"CALL {ICEBERG_CATALOG}.system.rollback_to_snapshot("
            f"table => '{name}', snapshot_id => {int(snapshot_id)})"
        )
        return snapshot_id

    # -------------------------------------------------- maintenance
    # SnapshotTable-protocol maintenance mapped 1:1 onto Iceberg's
    # documented Spark procedures (no logic of our own, like the rest
    # of this facade).

    def compact(
        self,
        spark: SparkSession | None = None,
        target_file_bytes: int = 128 << 20,
        cluster_by: list[str] | None = None,
    ) -> int | None:
        """Bin-pack small data files: Iceberg's ``rewrite_data_files``
        procedure (binpack strategy; ``cluster_by`` selects the sort
        strategy with the given ascending sort order — the real-table
        analog of SnapshotTable's range-sorted rewrite)."""
        name = self.ident.split(".", 1)[1]
        args = [
            f"table => '{name}'",
            "options => map('target-file-size-bytes', "
            f"'{int(target_file_bytes)}')",
        ]
        if cluster_by:
            for c in cluster_by:
                _ident(c)  # same identifier hygiene as table names
            order = ", ".join(f"{c} ASC" for c in cluster_by)
            args.insert(1, f"strategy => 'sort', sort_order => '{order}'")
        self.spark.sql(
            f"CALL {ICEBERG_CATALOG}.system.rewrite_data_files({', '.join(args)})"
        )
        return self.current_snapshot_id()

    def expire_snapshots(self, keep_last: int = 1) -> dict[str, int]:
        """Iceberg's ``expire_snapshots`` procedure with retain_last =
        keep_last AND ``older_than`` = now: the procedure's default
        older_than is now-minus-5-days, so without it any table whose
        snapshots are younger (every fresh pipeline run) silently
        expires NOTHING — diverging from SnapshotTable's
        keep-only-last-N contract. Orphan cleanup is a separate
        procedure upstream, issued here too so the facade matches
        SnapshotTable's expire-including-orphans contract."""
        if keep_last < 1:
            raise ValueError("expire_snapshots: keep_last must be >= 1")
        import datetime

        name = self.ident.split(".", 1)[1]
        # microsecond precision + explicit UTC offset: a floored or
        # zone-naive literal retains same-second snapshots (or, on a
        # non-UTC session timezone, everything younger than the zone
        # gap) past keep_last
        now = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S.%f+00:00"
        )
        self.spark.sql(
            f"CALL {ICEBERG_CATALOG}.system.expire_snapshots("
            f"table => '{name}', older_than => TIMESTAMP '{now}', "
            f"retain_last => {int(keep_last)})"
        )
        self.spark.sql(
            f"CALL {ICEBERG_CATALOG}.system.remove_orphan_files(table => '{name}')"
        )
        return {"retained_snapshots": keep_last}


def open_table(spark: SparkSession, root: str, name: str | None = None):
    """Route to real Iceberg when the session carries the catalog,
    else the snapshot-manifest layer. ``root`` is the fallback's
    filesystem root; ``name`` (default: derived from root's basename)
    is the Iceberg identifier."""
    if iceberg_enabled(spark):
        import os

        return IcebergTable(spark, name or os.path.basename(root.rstrip("/")))
    return SnapshotTable(root)
