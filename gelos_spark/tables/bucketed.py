"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §4;
north rule: "repartition() / bucketing for co-located joins").

At 10^12-tile scale the recurring join pattern is fact-to-fact on
``cell`` (tiles x per-cell stats, tiles x assignments): both sides are
too big to broadcast, so a plain join shuffles BOTH corpora every run.
Writing each table bucketed on the join key once amortizes that
shuffle across every subsequent join: Spark recognizes matching
bucket specs and plans a SortMergeJoin with NO Exchange on either
side (tests assert the plan property, not just the rows).

Spark's bucket metadata lives in the session catalog, so these are
``saveAsTable`` managed tables under ``spark.sql.warehouse.dir`` —
on a cluster that is the shared metastore + object store, exactly
where a 100 TB tile table would already live.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed AND sorted by ``key`` — the layout a
    co-located SortMergeJoin consumes with zero exchanges and zero
    per-join sorts."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on
    the same key and bucket count. The plan contains no Exchange —
    each task reads one bucket from each side.

    The merge hint pins the sort-merge strategy: this helper exists
    for FACT-TO-FACT joins where neither side broadcasts at real
    scale, and only SMJ consumes the bucket layout (at test scale
    Catalyst would otherwise pick a broadcast join and ignore the
    buckets entirely)."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), key, how
    )


def plan_has_exchange(df: DataFrame) -> bool:
    """True when the physical plan contains any shuffle Exchange —
    the property bucketing exists to remove (used by tests and the
    plan audit)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
