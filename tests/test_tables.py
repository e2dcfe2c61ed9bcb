"""Snapshot table layer + checkpoint/resume tests (SURVEY.md §5 item 5).

Reference contract being generalized: the marker-file commit protocol
of gelos/embedding_generation.py:58-61,80 (skip if marker exists,
touch on success) and the CSV memo read-back of
gelos/embedding_transformation.py:85-94.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gelos_spark.plans.checkpoint import Pipeline, resume_delta
from gelos_spark.tables.snapshot import SnapshotTable


def test_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(0, 10).withColumn("v", F.col("id") * 2))
    s1 = t.current_snapshot_id()
    t.append(spark.range(10, 15).withColumn("v", F.col("id") * 2))
    s2 = t.current_snapshot_id()
    assert s2 == s1 + 1
    assert t.read(spark).count() == 15
    assert t.read(spark, snapshot_id=s1).count() == 10  # time travel
    assert t.total_rows() == 15


def test_overwrite_partition_idempotent(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.overwrite_partition(spark.range(0, 5), partition="stage_a")
    t.overwrite_partition(spark.range(100, 110), partition="stage_b")
    assert t.total_rows() == 15
    # re-running stage_a replaces, never duplicates
    t.overwrite_partition(spark.range(0, 7), partition="stage_a")
    assert t.total_rows() == 17
    vals = sorted(r.id for r in t.read(spark).collect())
    assert vals == list(range(0, 7)) + list(range(100, 110))


def test_mid_commit_crash_reader_sees_previous_snapshot(spark, tmp_path, monkeypatch):
    """Chaos: die BETWEEN writing the parquet data files (and even the
    new manifest JSON) and the atomic ``_current`` rename — the exact
    torn-commit window the snapshot protocol exists for (engine analog
    of the reference's marker-file commit,
    gelos/embedding_generation.py:58-61,80). A concurrent reader must
    still see the previous snapshot, and a re-run must commit cleanly
    with no double-count from the crashed attempt's orphaned files."""
    from gelos_spark.tables import snapshot as snap_mod

    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(0, 10).coalesce(1), partition="p0")
    s1 = t.current_snapshot_id()
    rows1 = sorted(r.id for r in t.read(spark).collect())

    real_rename = snap_mod.os.rename

    def dying_rename(src, dst, *a, **k):
        if str(dst).endswith("_current"):
            raise RuntimeError("killed at the commit point")
        return real_rename(src, dst, *a, **k)

    monkeypatch.setattr(snap_mod.os, "rename", dying_rename)
    with pytest.raises(RuntimeError, match="commit point"):
        t.append(spark.range(10, 20).coalesce(1), partition="p1")
    monkeypatch.setattr(snap_mod.os, "rename", real_rename)

    # a concurrent reader (fresh handle on the same root) still sees
    # the OLD snapshot — never a torn one — even though the crashed
    # attempt left data files and an uncommitted manifest on disk
    reader = SnapshotTable(str(tmp_path / "t"))
    assert reader.current_snapshot_id() == s1
    assert sorted(r.id for r in reader.read(spark).collect()) == rows1
    assert reader.total_rows() == 10
    orphan_manifest = os.path.join(str(tmp_path / "t"), "manifests", f"{s1 + 1}.json")
    assert os.path.exists(orphan_manifest)  # written, but never pointed at

    # re-run commits cleanly: exactly the union, the orphaned attempt
    # is superseded (same snapshot id reused), nothing double-counted
    t2 = SnapshotTable(str(tmp_path / "t"))
    sid = t2.append(spark.range(10, 20).coalesce(1), partition="p1")
    assert sid == s1 + 1
    assert t2.total_rows() == 20
    assert sorted(r.id for r in t2.read(spark).collect()) == list(range(20))
    assert all(os.path.exists(f["path"]) for f in t2.files())


def test_mid_commit_crash_overwrite_partition_stays_idempotent(
    spark, tmp_path, monkeypatch
):
    """Same torn-commit window, but for ``overwrite_partition`` (the
    resume path's idempotent stage re-write): a crash mid-overwrite
    must leave the partition's OLD files visible, and the retried
    overwrite must replace them exactly once."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.overwrite_partition(spark.range(0, 5).coalesce(1), partition="stage_a")
    t.overwrite_partition(spark.range(100, 110).coalesce(1), partition="stage_b")

    def boom(self, files):
        raise RuntimeError("killed before commit")

    monkeypatch.setattr(SnapshotTable, "_commit", boom)
    with pytest.raises(RuntimeError, match="before commit"):
        t.overwrite_partition(spark.range(0, 7).coalesce(1), partition="stage_a")
    monkeypatch.undo()

    reader = SnapshotTable(str(tmp_path / "t"))
    assert reader.total_rows() == 15  # old stage_a (5 rows) still live
    # retry: stage_a replaced exactly (7 rows), stage_b untouched
    reader.overwrite_partition(spark.range(0, 7).coalesce(1), partition="stage_a")
    assert reader.total_rows() == 17
    vals = sorted(r.id for r in reader.read(spark).collect())
    assert vals == list(range(0, 7)) + list(range(100, 110))


def test_empty_table_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    assert t.is_empty()
    with pytest.raises(ValueError):
        t.read(spark)


def test_pipeline_resume_skips_and_is_identical(spark, tmp_path):
    root = str(tmp_path / "run")

    def stage1(sp):
        return sp.range(0, 100).withColumn("v", F.col("id") % 7)

    def stage2_from(pipe):
        return lambda sp: pipe.output("s1").groupBy("v").count()

    p1 = Pipeline(spark, root, "r1")
    p1.stage("s1", stage1)
    out1 = p1.stage("s2", stage2_from(p1)).orderBy("v").collect()
    assert p1.executed == ["s1", "s2"] and p1.skipped == []

    # second run with the same run_id: everything skips, same rows
    p2 = Pipeline(spark, root, "r1")
    p2.stage("s1", stage1)
    out2 = p2.stage("s2", stage2_from(p2)).orderBy("v").collect()
    assert p2.skipped == ["s1", "s2"] and p2.executed == []
    assert out1 == out2

    # a new run_id recomputes (stage tables are overwritten idempotently)
    p3 = Pipeline(spark, root, "r2")
    p3.stage("s1", stage1)
    assert p3.executed == ["s1"]


def test_pipeline_partial_resume(spark, tmp_path):
    """Crash after stage 1 -> rerun executes only stage 2."""
    root = str(tmp_path / "run")
    p1 = Pipeline(spark, root, "r1")
    p1.stage("s1", lambda sp: sp.range(0, 50))
    # "crash" here: s2 never ran
    p2 = Pipeline(spark, root, "r1")
    p2.stage("s1", lambda sp: sp.range(0, 50))
    p2.stage("s2", lambda sp: p2.output("s1").withColumn("y", F.col("id") + 1))
    assert p2.skipped == ["s1"] and p2.executed == ["s2"]
    assert p2.output("s2").count() == 50


def test_lineage_rows(spark, tmp_path):
    p = Pipeline(spark, str(tmp_path / "run"), "r1")
    p.stage("s1", lambda sp: sp.range(0, 64).repartition(4))
    lin = p.log.lineage("r1").collect()
    files = [r for r in lin if r.status == "file"]
    done = [r for r in lin if r.status == "done"]
    assert len(done) == 1
    assert sum(r.rows_out for r in files) == 64 == done[0].rows_out
    assert all(r.bytes > 0 for r in files)
    assert len(files) >= 1  # one lineage row per written partition file


def test_resume_delta(spark):
    work = spark.range(0, 10).withColumnRenamed("id", "k")
    done = spark.range(0, 4).withColumnRenamed("id", "k")
    left = resume_delta(work, done, "k")
    assert sorted(r.k for r in left.collect()) == list(range(4, 10))


def test_iceberg_probe_and_fallback(spark, tmp_path, monkeypatch):
    """SURVEY §7.0 autodetect: offline (no runtime jar) the probe
    returns None, the session carries no Iceberg catalog, and
    open_table cleanly routes to the snapshot-manifest layer."""
    from gelos_spark import session as ses
    from gelos_spark.tables.iceberg import IcebergTable, iceberg_enabled, open_table

    assert ses.iceberg_runtime_jar() is None  # sandbox has no jar
    assert iceberg_enabled(spark) is False
    t = open_table(spark, str(tmp_path / "tbl"))
    assert isinstance(t, SnapshotTable)
    t.append(spark.range(0, 5).coalesce(1))
    assert t.read(spark).count() == 5

    # explicit override pointing at a real file -> probe finds it
    fake = tmp_path / "iceberg-spark-runtime-3.5_2.12-1.5.0.jar"
    fake.write_bytes(b"PK")
    monkeypatch.setenv("GELOS_ICEBERG_JAR", str(fake))
    assert ses.iceberg_runtime_jar() == str(fake)
    monkeypatch.setenv("GELOS_ICEBERG_JAR", str(tmp_path / "missing.jar"))
    assert ses.iceberg_runtime_jar() is None

    # the facade validates identifiers without needing a live catalog
    import pytest as _pytest

    with _pytest.raises(ValueError):
        IcebergTable(spark, "bad name; drop")
