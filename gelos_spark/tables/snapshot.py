"""Snapshot-manifest table layer — the engine's Iceberg-semantics
store (SURVEY.md §7.0, M7).

No Iceberg runtime jar is available offline (verified: none under
$SPARK_HOME/jars or ~/.ivy2), so the engine implements the subset of
Iceberg semantics the north rule actually uses, from scratch:

  - **atomic append**: data files are written to a unique directory,
    then a new JSON manifest (listing ALL live files) is committed by
    an atomic ``os.rename`` of the ``_current`` pointer — readers see
    the old or the new snapshot, never a partial one. This generalizes
    the reference's marker-file commit protocol
    (gelos/embedding_generation.py:58-61,80).
  - **idempotent overwrite-by-partition**: a commit can atomically
    replace all manifest entries carrying a given partition value —
    re-running a stage cannot double-append.
  - **time travel**: every snapshot's manifest is retained;
    ``read_at(snapshot_id)`` reads any historical snapshot (the
    resume path reads lineage "as of" the last good snapshot).

Layout under ``root``:
  data/<commit-uuid>/*.parquet      immutable data files
  manifests/<snapshot_id>.json      {"snapshot_id", "parent", "ts",
                                     "files": [{"path", "rows",
                                     "bytes", "partition"}]}
  _current                          text file: latest snapshot_id
                                    (committed via atomic rename)

At cluster scale the same protocol works on any store with atomic
rename (HDFS) or conditional put (S3); data-file writes are fully
distributed (df.write.parquet) — only the tiny manifest commit is
driver-side, exactly like Iceberg's.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # ------------------------------------------------------- reading

    def current_snapshot_id(self) -> int | None:
        p = os.path.join(self.root, "_current")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def snapshots(self) -> list[int]:
        d = os.path.join(self.root, "manifests")
        return sorted(int(f[:-5]) for f in os.listdir(d) if f.endswith(".json"))

    def manifest(self, snapshot_id: int | None = None) -> dict[str, Any]:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        if sid is None:
            return {"snapshot_id": None, "parent": None, "files": []}
        with open(os.path.join(self.root, "manifests", f"{sid}.json")) as f:
            return json.load(f)

    def files(self, snapshot_id: int | None = None) -> list[dict[str, Any]]:
        return self.manifest(snapshot_id)["files"]

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        paths = [f["path"] for f in self.files(snapshot_id)]
        if not paths:
            raise ValueError(f"table {self.root} is empty (no committed snapshot)")
        return spark.read.parquet(*paths)

    read_at = read  # alias: time-travel read

    def is_empty(self) -> bool:
        return not self.files()

    # ------------------------------------------------------- writing

    def _write_data_files(self, df: DataFrame, partition: str | None) -> list[dict]:
        commit_dir = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(commit_dir)
        out = []
        for name in sorted(os.listdir(commit_dir)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(commit_dir, name)
            meta = pq.ParquetFile(path).metadata
            out.append(
                {
                    "path": path,
                    "rows": meta.num_rows,
                    "bytes": os.path.getsize(path),
                    "partition": partition,
                }
            )
        return out

    def _commit(self, files: list[dict]) -> int:
        parent = self.current_snapshot_id()
        sid = (parent or 0) + 1
        man = {
            "snapshot_id": sid,
            "parent": parent,
            "ts": time.time(),
            "files": files,
        }
        mpath = os.path.join(self.root, "manifests", f"{sid}.json")
        with open(mpath, "w") as f:
            json.dump(man, f)
        tmp = os.path.join(self.root, f"_current.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(sid))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.root, "_current"))  # atomic commit point
        return sid

    def append(self, df: DataFrame, partition: str | None = None) -> int:
        """Atomic append: new snapshot = old files + newly written files."""
        new_files = self._write_data_files(df, partition)
        return self._commit(self.files() + new_files)

    def overwrite_partition(self, df: DataFrame, partition: str) -> int:
        """Idempotent replace of every file tagged with ``partition``
        (the resume path re-runs a stage safely)."""
        new_files = self._write_data_files(df, partition)
        kept = [f for f in self.files() if f["partition"] != partition]
        return self._commit(kept + new_files)

    def overwrite(self, df: DataFrame, partition: str | None = None) -> int:
        """Replace the whole table in one atomic snapshot."""
        return self._commit(self._write_data_files(df, partition))

    # ------------------------------------------------------- stats

    def total_rows(self, snapshot_id: int | None = None) -> int:
        return sum(f["rows"] for f in self.files(snapshot_id))

    def partitions(self) -> set[str | None]:
        return {f["partition"] for f in self.files()}
