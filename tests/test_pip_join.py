"""PIP join vs all-pairs brute-force NumPy oracle (FIXTURES.md §6)."""

import numpy as np
import pandas as pd
import pytest

from gelos_spark.functions.geometry import points_in_polygon
from gelos_spark.operators.pip_join import pip_join, pick_cover_res
from gelos_spark.sources import synth


def _brute_pip(tracker: pd.DataFrame, aois: list[dict]) -> set[tuple[int, str]]:
    out = set()
    lon = tracker["lon"].to_numpy()
    lat = tracker["lat"].to_numpy()
    ids = tracker["image_id"].to_numpy()
    for p in aois:
        inside = points_in_polygon(lon, lat, p["ring"])
        for i in np.nonzero(inside)[0]:
            out.add((p["aoi_id"], ids[i]))
    return out


@pytest.mark.parametrize("n,m,seed", [(500, 8, 42), (3000, 24, 7)])
def test_pip_join_exact_match(spark, n, m, seed):
    tracker = synth.tracker_df(spark, n, seed=seed)
    aois = synth.aoi_polygons(m, seed=seed)
    got = pip_join(spark, tracker, aois).toPandas()
    exp = _brute_pip(tracker.toPandas(), aois)
    got_set = set(zip(got["aoi_id"].tolist(), got["image_id"].tolist()))
    assert got_set == exp
    # ordered deterministically
    assert got[["aoi_id", "image_id"]].values.tolist() == sorted(
        got[["aoi_id", "image_id"]].values.tolist()
    )


def test_pip_join_parallelism_invariant(spark):
    """Same result at different partition layouts (north rule's
    two-cluster-size exactness, correctness half)."""
    aois = synth.aoi_polygons(8, seed=3)
    t1 = synth.tracker_df(spark, 800, seed=3, parts=2)
    t2 = synth.tracker_df(spark, 800, seed=3, parts=16)
    a = pip_join(spark, t1, aois).toPandas()
    b = pip_join(spark, t2, aois).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_pip_join_no_broadcast_same_result(spark):
    """Dropping the broadcast hint (huge-AOI degradation path) gives
    identical rows."""
    aois = synth.aoi_polygons(6, seed=9)
    t = synth.tracker_df(spark, 600, seed=9)
    a = pip_join(spark, t, aois, broadcast_cover=True).toPandas()
    b = pip_join(spark, t, aois, broadcast_cover=False).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_pick_cover_res_bounds():
    aois = synth.aoi_polygons(16, seed=42)
    res = pick_cover_res(aois)
    assert 3 <= res <= 16


def test_refine_variants_identical(spark):
    """All three ray-cast refine implementations (expr array-aggregate,
    sql parity join, NumPy pandas UDF) must produce identical
    assignment sets."""
    tracker = synth.tracker_df(spark, 3000, seed=11)
    aois = synth.aoi_polygons(10, seed=11)
    a = pip_join(spark, tracker, aois, refine="expr").collect()
    b = pip_join(spark, tracker, aois, refine="udf").collect()
    c = pip_join(spark, tracker, aois, refine="sql").collect()
    ka = [(r.aoi_id, r.image_id) for r in a]
    kb = [(r.aoi_id, r.image_id) for r in b]
    kc = [(r.aoi_id, r.image_id) for r in c]
    assert ka == kb == kc and len(ka) > 0


# ------------------------------------------------- antimeridian AOIs


def _am_aois():
    """AOIs straddling +-180: a quad and a pentagon whose rings jump
    between +17x and -17x longitudes."""
    return [
        {"aoi_id": 0, "name": "am_quad",
         "ring": [(175.0, -10.0), (-175.0, -10.0), (-175.0, 12.0), (175.0, 12.0)]},
        {"aoi_id": 1, "name": "am_pent",
         "ring": [(172.0, 20.0), (-178.0, 18.0), (-174.0, 30.0),
                  (178.0, 36.0), (170.0, 28.0)]},
    ]


def _am_points(spark, n=3000, seed=11):
    """Deterministic points concentrated around the antimeridian on
    both sides, in the engine's canonical [-180, 180) frame."""
    rng = np.random.default_rng(seed)
    lon = ((rng.uniform(160.0, 200.0, n) + 180.0) % 360.0) - 180.0
    lat = rng.uniform(-25.0, 45.0, n)
    pdf = pd.DataFrame(
        {"image_id": [f"am{i:06d}" for i in range(n)], "lon": lon, "lat": lat}
    )
    return spark.createDataFrame(pdf), pdf


def _brute_pip_am(pdf: pd.DataFrame, aois: list[dict]) -> set[tuple[int, str]]:
    from gelos_spark.functions.cells import unwrap_ring

    out = set()
    lon = pdf["lon"].to_numpy()
    lat = pdf["lat"].to_numpy()
    ids = pdf["image_id"].to_numpy()
    for p in aois:
        ring, wrapped = unwrap_ring(np.asarray(p["ring"], dtype=np.float64))
        x = np.where(lon < 0.0, lon + 360.0, lon) if wrapped else lon
        inside = points_in_polygon(x, lat, ring)
        for i in np.nonzero(inside)[0]:
            out.add((p["aoi_id"], ids[i]))
    return out


@pytest.mark.parametrize("refine", ["expr", "sql", "udf"])
def test_pip_join_antimeridian(spark, refine):
    aois = _am_aois()
    tiles, pdf = _am_points(spark)
    got = pip_join(spark, tiles, aois, refine=refine).toPandas()
    exp = _brute_pip_am(pdf, aois)
    assert set(zip(got["aoi_id"].tolist(), got["image_id"].tolist())) == exp
    # sanity: the AOIs really get hits on BOTH sides of +-180
    assert (got["lon"] > 170).any() and (got["lon"] < -170).any()


def test_pip_join_mixed_wrapped_and_plain(spark):
    """Wrapped and ordinary AOIs coexist in one join."""
    aois = _am_aois() + [
        {"aoi_id": 2, "name": "plain",
         "ring": [(-10.0, -5.0), (10.0, -5.0), (10.0, 15.0), (-10.0, 15.0)]}
    ]
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "image_id": [f"mx{i:05d}" for i in range(2000)],
            "lon": ((rng.uniform(-30.0, 210.0, 2000) + 180.0) % 360.0) - 180.0,
            "lat": rng.uniform(-25.0, 45.0, 2000),
        }
    )
    got = pip_join(spark, spark.createDataFrame(pdf), aois).toPandas()
    exp = _brute_pip_am(pdf, aois)
    assert set(zip(got["aoi_id"].tolist(), got["image_id"].tolist())) == exp
    assert (got["aoi_id"] == 2).any()


def test_unwrap_ring_contract():
    from gelos_spark.functions.cells import unwrap_ring

    plain = np.asarray([(-10.0, 0.0), (10.0, 0.0), (0.0, 10.0)])
    r, w = unwrap_ring(plain)
    assert not w and np.array_equal(r, plain)
    am = np.asarray([(175.0, 0.0), (-175.0, 0.0), (180.0, 10.0)])
    r, w = unwrap_ring(am)
    assert w and r[:, 0].tolist() == [175.0, 185.0, 180.0]
    with pytest.raises(ValueError, match="180 deg"):
        unwrap_ring(np.asarray([(170.0, 0.0), (-170.0, 0.0), (-10.0, 5.0), (60.0, 5.0)]))


# ------------------------------------------------ polygons with holes


def _donut_aois():
    return [
        # square donut: outer 20x20, square hole 8x8 in the middle
        {"aoi_id": 0, "name": "donut",
         "ring": [(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0)],
         "holes": [[(-4.0, -4.0), (4.0, -4.0), (4.0, 4.0), (-4.0, 4.0)]]},
        # plain AOI alongside, to prove mixing works
        {"aoi_id": 1, "name": "plain",
         "ring": [(20.0, -5.0), (34.0, -5.0), (34.0, 9.0), (20.0, 9.0)]},
    ]


def _brute_pip_rings(pdf: pd.DataFrame, aois: list[dict]) -> set[tuple[int, str]]:
    from gelos_spark.functions.cells import unwrap_rings
    from gelos_spark.functions.geometry import points_in_rings

    out = set()
    lon = pdf["lon"].to_numpy()
    lat = pdf["lat"].to_numpy()
    ids = pdf["image_id"].to_numpy()
    for p in aois:
        outer, hs, wrapped = unwrap_rings(
            np.asarray(p["ring"], dtype=np.float64), p.get("holes")
        )
        x = np.where(lon < 0.0, lon + 360.0, lon) if wrapped else lon
        inside = points_in_rings(x, lat, [outer] + hs)
        for i in np.nonzero(inside)[0]:
            out.add((p["aoi_id"], ids[i]))
    return out


@pytest.mark.parametrize("refine", ["expr", "sql", "udf"])
def test_pip_join_with_holes(spark, refine):
    aois = _donut_aois()
    rng = np.random.default_rng(21)
    pdf = pd.DataFrame(
        {
            "image_id": [f"h{i:05d}" for i in range(3000)],
            "lon": rng.uniform(-15.0, 40.0, 3000),
            "lat": rng.uniform(-15.0, 15.0, 3000),
        }
    )
    got = pip_join(spark, spark.createDataFrame(pdf), aois, refine=refine).toPandas()
    exp = _brute_pip_rings(pdf, aois)
    assert set(zip(got["aoi_id"].tolist(), got["image_id"].tolist())) == exp
    # points strictly inside the hole are excluded
    in_hole = pdf[(pdf.lon.abs() < 4) & (pdf.lat.abs() < 4)]["image_id"]
    assert not any((0, i) in exp for i in in_hole)
    assert len(in_hole) > 0
    # the donut ring itself has hits
    assert any(a == 0 for a, _ in exp)


def test_pip_join_antimeridian_donut(spark):
    """Hole inheritance of the outer ring's unwrap frame: a donut
    straddling +-180 whose hole sits entirely on the west side."""
    aois = [
        {"aoi_id": 0, "name": "am_donut",
         "ring": [(172.0, -8.0), (-172.0, -8.0), (-172.0, 8.0), (172.0, 8.0)],
         "holes": [[(-178.0, -3.0), (-174.0, -3.0), (-174.0, 3.0), (-178.0, 3.0)]]},
    ]
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "image_id": [f"ad{i:05d}" for i in range(2500)],
            "lon": ((rng.uniform(165.0, 195.0, 2500) + 180.0) % 360.0) - 180.0,
            "lat": rng.uniform(-12.0, 12.0, 2500),
        }
    )
    got = pip_join(spark, spark.createDataFrame(pdf), aois).toPandas()
    exp = _brute_pip_rings(pdf, aois)
    assert set(zip(got["aoi_id"].tolist(), got["image_id"].tolist())) == exp
    # hole exclusion really engaged (points in the hole exist)
    in_hole = pdf[(pdf.lon > -178) & (pdf.lon < -174) & (pdf.lat.abs() < 3)]
    assert len(in_hole) > 0
    assert not any((0, i) in exp for i in in_hole["image_id"])
    # hits on both sides of the antimeridian
    assert (got["lon"] > 170).any() and (got["lon"] < -170).any()


def test_points_in_rings_single_ring_equals_polygon():
    from gelos_spark.functions.geometry import points_in_polygon, points_in_rings

    ring = np.asarray([(-5.0, -5.0), (5.0, -5.0), (0.0, 6.0)])
    rng = np.random.default_rng(3)
    px, py = rng.uniform(-8, 8, 500), rng.uniform(-8, 8, 500)
    assert (points_in_rings(px, py, [ring]) == points_in_polygon(px, py, ring)).all()


def test_stale_classified_cover_is_loud(spark):
    """A precomputed cover list shorter than the AOI set must raise:
    for build_cover_df a zip would drop AOIs from the join; for
    aoi_cell_ranges the scan ranges would miss their files (silent
    wrong results in a pruned read)."""
    import pytest as _pytest

    from gelos_spark.operators.pip_join import (
        aoi_cell_ranges,
        build_cover_df,
        classify_covers,
    )
    from gelos_spark.sources import synth

    aois = synth.aoi_polygons(4, seed=42)
    short = classify_covers(aois[:2], 6)
    with _pytest.raises(ValueError, match="2 entries for 4"):
        build_cover_df(spark, aois, 6, classified=short)
    with _pytest.raises(ValueError, match="2 entries for 4"):
        aoi_cell_ranges(aois, 6, classified=short)
