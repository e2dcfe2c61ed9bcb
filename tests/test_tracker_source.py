"""Tracker scan extension dispatch (SURVEY.md §2.1 S1): CSV, JSON,
GeoJSON, and the unknown-suffix error."""

from __future__ import annotations

import json

import pytest

from gelos_spark.sources.tracker import read_tracker


def test_csv_dispatch_roundtrip(spark, tmp_path):
    p = str(tmp_path / "trk.csv")
    (p_dir := tmp_path / "trk.csv").mkdir(exist_ok=True)
    del p_dir
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.5)], "id long, name string, v double"
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(p)
    got = read_tracker(spark, p, schema="id long, name string, v double")
    rows = sorted((r.id, r.name, r.v) for r in got.collect())
    assert rows == [(1, "a", 1.5), (2, "b", -2.5)]


def test_json_dispatch(spark, tmp_path):
    p = str(tmp_path / "trk.json")
    spark.createDataFrame([(7, "x"), (8, "y")], "id long, name string").coalesce(
        1
    ).write.mode("overwrite").json(p)
    got = read_tracker(spark, p)
    assert sorted((r.id, r.name) for r in got.collect()) == [(7, "x"), (8, "y")]


def test_geojson_dispatch_flattens_geometry(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"id": 1, "lulc": "water"},
                "geometry": {"type": "Point", "coordinates": [10.5, -3.25]},
            },
            {
                "type": "Feature",
                "properties": {"id": 2, "lulc": "trees"},
                "geometry": {"type": "Point", "coordinates": [-170.0, 44.0]},
            },
        ],
    }
    f = tmp_path / "trk.geojson"
    f.write_text(json.dumps(fc))
    got = read_tracker(spark, str(f))
    rows = sorted((r.id, r.lulc, r.lon, r.lat) for r in got.collect())
    assert rows == [(1, "water", 10.5, -3.25), (2, "trees", -170.0, 44.0)]


def test_unknown_suffix_raises(spark):
    with pytest.raises(ValueError, match="unsupported tracker format"):
        read_tracker(spark, "/nope/tracker.parquet")
