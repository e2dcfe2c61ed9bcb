"""Chip-tracker scan with extension dispatch (SURVEY.md §2.1 S1;
reference: gelos/embedding_transformation.py:19-30 — GeoJSON/JSON via
geopandas, CSV via pandas, error on any other suffix).

The engine reads the same three shapes with Spark's native readers —
CSV with header, JSON lines, GeoJSON FeatureCollection (geometry
flattened to lon/lat doubles, matching §1.1's "Spark has no native
geometry type" rule) — and raises on unknown suffixes exactly like
the reference."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tracker(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Dispatch on extension: .csv -> header CSV, .json -> JSON lines,
    .geojson -> FeatureCollection (properties.* + geometry coords as
    lon/lat). ValueError otherwise (reference raises the same way)."""
    low = path.rstrip("/").lower()
    if low.endswith(".csv"):
        r = spark.read.option("header", True)
        if schema:
            r = r.schema(schema)
        else:
            r = r.option("inferSchema", True)
        return r.csv(path)
    if low.endswith(".json"):
        r = spark.read
        if schema:
            r = r.schema(schema)
        return r.json(path)
    if low.endswith(".geojson"):
        # one FeatureCollection document per file
        raw = spark.read.option("multiLine", True).json(path)
        feat = raw.select(F.explode("features").alias("f"))
        props = feat.select("f.properties.*", F.col("f.geometry.coordinates").alias("_c"))
        return props.withColumn("lon", F.col("_c")[0].cast("double")).withColumn(
            "lat", F.col("_c")[1].cast("double")
        ).drop("_c")
    raise ValueError(f"unsupported tracker format: {path}")
