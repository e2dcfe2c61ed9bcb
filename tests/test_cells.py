"""Cell index kernels vs brute-force per-point references
(SURVEY.md §7.1 M1)."""

import numpy as np
import pytest

from gelos_spark.functions import cells


def _brute_encode(lon, lat, res):
    n = 1 << res
    lon = ((lon + 180.0) % 360.0) - 180.0
    x = min(max(int(np.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    y = min(max(int(np.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
    out = 0
    for b in range(res):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_encode_matches_bruteforce():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for res in (0, 1, 5, 12, 20, 26):
        got = cells.cell_encode(lon, lat, res)
        exp = np.asarray([_brute_encode(a, b, res) for a, b in zip(lon, lat)])
        np.testing.assert_array_equal(got, exp)


def test_roundtrip_center_reencodes_to_same_cell():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    for res in (4, 10, 18):
        c = cells.cell_encode(lon, lat, res)
        clon, clat = cells.cell_to_lonlat(c, res)
        np.testing.assert_array_equal(cells.cell_encode(clon, clat, res), c)


def test_parent_is_prefix():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    fine = cells.cell_encode(lon, lat, 15)
    coarse = cells.cell_encode(lon, lat, 9)
    np.testing.assert_array_equal(cells.cell_parent(fine, 15, 9), coarse)


def test_ring_counts_and_disjoint():
    c = int(cells.cell_encode(np.asarray([10.0]), np.asarray([20.0]), 10)[0])
    seen = set()
    for r in range(4):
        ring = cells.cell_ring(c, 10, r)
        assert len(ring) == (1 if r == 0 else 8 * r)
        assert not (set(ring.tolist()) & seen)
        seen |= set(ring.tolist())
    # all ring members are within Chebyshev distance exactly r
    x0, y0 = cells.cell_to_xy(np.asarray([c]))
    for r in (1, 3):
        xs, ys = cells.cell_to_xy(cells.cell_ring(c, 10, r))
        cheb = np.maximum(np.abs(xs - x0[0]), np.abs(ys - y0[0]))
        np.testing.assert_array_equal(cheb, np.full_like(cheb, r))


def test_ring_wraps_antimeridian_and_clamps_pole():
    res = 6
    n = 1 << res
    # cell at x=0 (lon=-180 edge): ring must wrap to x=n-1, not go negative
    c = int(cells.xy_to_cell(np.asarray([0]), np.asarray([n // 2]))[0])
    ring = cells.cell_ring(c, res, 1)
    xs, _ = cells.cell_to_xy(ring)
    assert (n - 1) in xs.tolist() and len(ring) == 8
    # cell at y=n-1 (north edge): rows past the pole are dropped
    c2 = int(cells.xy_to_cell(np.asarray([5]), np.asarray([n - 1]))[0])
    ring2 = cells.cell_ring(c2, res, 1)
    assert len(ring2) == 5


def test_disk_batch_matches_single_rings():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-170, 170, 20)
    lat = rng.uniform(-80, 80, 20)
    cs = cells.cell_encode(lon, lat, 9)
    for r in (0, 1, 2):
        idx, shell = cells.cell_disk_batch(cs, 9, r)
        for i, c in enumerate(cs):
            got = np.sort(shell[idx == i])
            np.testing.assert_array_equal(got, cells.cell_ring(int(c), 9, r))


def test_cover_bbox_contains_all_inner_points():
    res = 8
    cover = set(cells.cover_bbox(-10.0, 20.0, -2.0, 31.0, res).tolist())
    rng = np.random.default_rng(4)
    lon = rng.uniform(-10, -2, 300)
    lat = rng.uniform(20, 31, 300)
    for c in cells.cell_encode(lon, lat, res):
        assert int(c) in cover


def test_polygon_cover_superset_of_inside_cells():
    ring = np.asarray([[0.0, 0.0], [4.0, 1.0], [5.0, 5.0], [1.0, 4.0]])
    res = 9
    cover = set(cells.polygon_cover(ring, res).tolist())
    rng = np.random.default_rng(5)
    lon = rng.uniform(-1, 6, 2000)
    lat = rng.uniform(-1, 6, 2000)
    from gelos_spark.functions.geometry import points_in_polygon

    inside = points_in_polygon(lon, lat, ring)
    for c in cells.cell_encode(lon[inside], lat[inside], res):
        assert int(c) in cover
    # pruning actually prunes vs the plain bbox
    bbox = cells.cover_bbox(0.0, 0.0, 5.0, 5.0, res)
    assert len(cover) < len(bbox)


def test_cell_encode_col_matches_numpy_kernel(spark):
    """The JVM column-expression encoder must be bit-identical to the
    NumPy kernel at several resolutions, including edge coordinates."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gelos_spark.functions import cells
    from gelos_spark.functions.cell_udfs import cell_encode_col

    rng = np.random.default_rng(7)
    lon = np.concatenate(
        [rng.uniform(-180, 180, 500), [-180.0, 179.999999, 0.0, -0.0, 180.0, 359.5]]
    )
    lat = np.concatenate(
        [rng.uniform(-90, 90, 500), [-90.0, 89.999999, 0.0, -0.0, 90.0, -89.999999]]
    )
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    for res in (1, 7, 16, 26):
        got = np.array(
            [
                r.c
                for r in df.select(
                    cell_encode_col(F.col("lon"), F.col("lat"), res).alias("c")
                ).collect()
            ]
        )
        want = cells.cell_encode(lon, lat, res)
        assert (got == want).all(), f"mismatch at res {res}"


def test_cell_ranges_prefix_blocks_and_merging():
    """cell_ranges turns a coarse cover into merged tile-res Morton
    ranges: membership in some range must EXACTLY equal parent-in-
    cover (the quadtree prefix property), and consecutive coarse cells
    must merge into one range."""
    import numpy as np

    from gelos_spark.functions import cells as C

    res, tile_res = 5, 9
    rng = np.random.default_rng(7)
    cover = np.unique(rng.integers(0, 1 << (2 * res), size=40, dtype=np.int64))
    ranges = C.cell_ranges(cover, res, tile_res)

    # exactness on random tile cells: in-some-range <=> parent in cover
    tiles = rng.integers(0, 1 << (2 * tile_res), size=5000, dtype=np.int64)
    parents = C.cell_parent(tiles, tile_res, res)
    in_cover = np.isin(parents, cover)
    in_range = np.zeros(len(tiles), dtype=bool)
    for lo, hi in ranges:
        in_range |= (tiles >= lo) & (tiles <= hi)
    assert (in_range == in_cover).all()

    # consecutive cells merge: [4,5,6] at delta=2 -> ONE range
    merged = C.cell_ranges(np.array([4, 5, 6]), 3, 5)
    assert merged.tolist() == [[4 << 4, (7 << 4) - 1]]
    # gap stays split
    split = C.cell_ranges(np.array([4, 6]), 3, 5)
    assert len(split) == 2

    assert C.cell_ranges(np.array([], dtype=np.int64), 3, 5).shape == (0, 2)
    with pytest.raises(ValueError):
        C.cell_ranges(np.array([1]), 5, 3)
