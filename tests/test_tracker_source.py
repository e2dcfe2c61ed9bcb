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


def test_read_aoi_geojson_polygon_with_hole(spark, tmp_path):
    """GeoJSON Polygon (RFC 7946: first ring outer, rest holes) +
    MultiPolygon load into the AOI shape pip_join consumes, and the
    join over them matches the brute-force multi-ring oracle."""
    import json

    import numpy as np
    import pandas as pd

    from gelos_spark.functions.geometry import points_in_rings
    from gelos_spark.operators.pip_join import pip_join
    from gelos_spark.sources.aoi import read_aoi_geojson

    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "donut"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[-10, -10], [10, -10], [10, 10], [-10, 10], [-10, -10]],
                        [[-4, -4], [4, -4], [4, 4], [-4, 4], [-4, -4]],
                    ],
                },
            },
            {
                "type": "Feature",
                "properties": {"name": "pair"},
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [[[20, 0], [30, 0], [30, 8], [20, 8], [20, 0]]],
                        [[[35, 0], [45, 0], [45, 8], [35, 8], [35, 0]]],
                    ],
                },
            },
        ],
    }
    p = tmp_path / "aois.geojson"
    p.write_text(json.dumps(doc))
    aois = read_aoi_geojson(str(p))
    assert [a["aoi_id"] for a in aois] == [0, 1, 2]
    assert aois[0]["name"] == "donut" and "holes" in aois[0]
    assert aois[1]["name"] == "pair/0" and aois[2]["name"] == "pair/1"

    rng = np.random.default_rng(13)
    pdf = pd.DataFrame(
        {
            "image_id": [f"g{i:05d}" for i in range(2000)],
            "lon": rng.uniform(-15.0, 50.0, 2000),
            "lat": rng.uniform(-15.0, 15.0, 2000),
        }
    )
    got = pip_join(spark, spark.createDataFrame(pdf), aois).toPandas()
    exp = set()
    for a in aois:
        rings = [np.asarray(a["ring"], dtype=np.float64)] + [
            np.asarray(h, dtype=np.float64) for h in a.get("holes", [])
        ]
        inside = points_in_rings(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), rings)
        exp |= {(a["aoi_id"], i) for i in pdf["image_id"].to_numpy()[inside]}
    assert set(zip(got["aoi_id"].tolist(), got["image_id"].tolist())) == exp


def test_read_aoi_geojson_id_key_multipolygon(tmp_path):
    """With id_key, MultiPolygon part ids derive from the feature's
    property id (feature*1000+part) instead of the auto counter, and
    id collisions across features raise (ADVICE r3)."""
    import json

    import pytest as _p

    from gelos_spark.sources.aoi import read_aoi_geojson

    sq = lambda x0: [[[x0, 0], [x0 + 5, 0], [x0 + 5, 5], [x0, 5], [x0, 0]]]
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"fid": 7, "name": "multi"},
                "geometry": {"type": "MultiPolygon", "coordinates": [sq(0), sq(10)]},
            },
            {
                "type": "Feature",
                "properties": {"fid": 3, "name": "single"},
                "geometry": {"type": "Polygon", "coordinates": sq(20)},
            },
        ],
    }
    p = tmp_path / "keyed.geojson"
    p.write_text(json.dumps(doc))
    aois = read_aoi_geojson(str(p), id_key="fid")
    assert [a["aoi_id"] for a in aois] == [7000, 7001, 3]
    assert [a["name"] for a in aois] == ["multi/0", "multi/1", "single"]

    # a collision (two features declaring the same fid) must raise
    doc["features"][1]["properties"]["fid"] = 7
    doc["features"][1]["geometry"] = {
        "type": "MultiPolygon",
        "coordinates": [sq(30), sq(40)],
    }
    p.write_text(json.dumps(doc))
    with _p.raises(ValueError, match="duplicate aoi_id"):
        read_aoi_geojson(str(p), id_key="fid")

    # auto-minted MultiPolygon part ids colliding with a later explicit
    # id raise too (no id_key -> sequential; here forced via id_key=None
    # is collision-free by construction, so check the explicit case)
    doc2 = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"fid": 1},
                "geometry": {"type": "Polygon", "coordinates": sq(0)},
            },
            {
                "type": "Feature",
                "properties": {"fid": 1},
                "geometry": {"type": "Polygon", "coordinates": sq(10)},
            },
        ],
    }
    p.write_text(json.dumps(doc2))
    with _p.raises(ValueError, match="duplicate aoi_id"):
        read_aoi_geojson(str(p), id_key="fid")


def test_read_aoi_geojson_validation(tmp_path):
    import json

    import pytest as _p

    from gelos_spark.sources.aoi import read_aoi_geojson

    bad = tmp_path / "bad.geojson"
    bad.write_text(json.dumps({"type": "Feature"}))
    with _p.raises(ValueError, match="FeatureCollection"):
        read_aoi_geojson(str(bad))
    pt = tmp_path / "pt.geojson"
    pt.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [{"type": "Feature", "properties": {},
                      "geometry": {"type": "Point", "coordinates": [0, 0]}}],
    }))
    with _p.raises(ValueError, match="unsupported geometry"):
        read_aoi_geojson(str(pt))
