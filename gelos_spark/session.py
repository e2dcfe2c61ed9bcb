"""SparkSession factory with the engine's standard configuration.

Local-mode knobs follow the scale design in SURVEY.md §4: AQE on
(runtime re-plan + skew-join splitting), Arrow on (every Python
surface is vectorized), shuffle partitions sized to cores (the
cluster deployment would size them to ~2-3x total cores), UTC
session timezone so DuckDB-oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

ICEBERG_CATALOG = "gelos_iceberg"


def iceberg_runtime_jar() -> str | None:
    """Probe for an Iceberg Spark runtime jar (SURVEY.md §7.0): the
    explicit ``GELOS_ICEBERG_JAR`` override, then ``$SPARK_HOME/jars``
    / pyspark's bundled jars dir, then the local ivy cache. Returns
    the jar path or None (offline sandboxes have none — the
    snapshot-manifest layer then stands in)."""
    import glob

    explicit = os.environ.get("GELOS_ICEBERG_JAR")
    if explicit:
        return explicit if os.path.exists(explicit) else None
    roots = []
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:  # pragma: no cover
        pass
    roots.append(os.path.expanduser("~/.ivy2/jars"))
    for r in roots:
        hits = glob.glob(os.path.join(r, "iceberg-spark-runtime*.jar"))
        if hits:
            return sorted(hits)[-1]
    return None


def get_spark(
    app_name: str = "gelos_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``cpus`` controls ``local[N]``; the two-parallelism-level scaling
    benchmark (BASELINE.md) runs the same job at 8 and 32. Pass
    ``master`` to target a real cluster — cluster sessions keep
    Spark's default scan-split sizing (the 16MB override below is a
    local-bench knob only).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # decoded 3-channel uint8 tiles are ~12KB-200KB each; cap Arrow
        # batches so payload stages stay bounded-memory (SURVEY.md §4)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # prefer shuffled-hash over sort-merge when the planner's size
        # conditions hold (guide §3.1/§9): the engine's hot joins are
        # banded equi-self-joins over modest per-partition sides, where
        # skipping both sorts wins; the planner (and AQE's runtime
        # SMJ->SHJ rewrite below) still falls back to sort-merge when a
        # build side is too big to hash, so the spill-safety story at
        # cluster scale is unchanged. Measured -7% on the
        # minhash/simhash/knn suite (OPTIMIZATION_r07.md).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
    )
    jar = iceberg_runtime_jar()
    if jar:
        # real Iceberg auto-engages when the runtime resolves
        # (SURVEY.md §7.0); tables.open_table routes through this
        # catalog, the snapshot-manifest layer otherwise
        import tempfile

        wh = os.environ.get(
            "GELOS_ICEBERG_WAREHOUSE",
            os.path.join(tempfile.gettempdir(), "gelos_warehouse"),
        )
        b = (
            b.config("spark.jars", jar)
            .config(
                f"spark.sql.catalog.{ICEBERG_CATALOG}",
                "org.apache.iceberg.spark.SparkCatalog",
            )
            .config(f"spark.sql.catalog.{ICEBERG_CATALOG}.type", "hadoop")
            .config(f"spark.sql.catalog.{ICEBERG_CATALOG}.warehouse", wh)
        )
    if master.startswith("local"):
        # local-scale scan granularity: default 128MB packs a whole
        # bench table into 1-2 input splits, serializing every narrow
        # stage downstream of a scan (broadcast joins, pandas-UDF
        # refine). 16MB yields >= cores splits at bench sizes; cluster
        # sessions keep the default (TB inputs -> thousands of splits).
        b = b.config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        b = b.config("spark.sql.files.openCostInBytes", str(1024 * 1024))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
