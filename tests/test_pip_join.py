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
