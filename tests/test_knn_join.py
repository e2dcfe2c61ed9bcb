"""kNN ring-expansion join vs full-distance-matrix oracle
(FIXTURES.md §6: engine rows must match exactly, including
(distance, image_id) tie-breaks)."""

import numpy as np
import pandas as pd
import pytest

from gelos_spark.functions.geometry import haversine_np
from gelos_spark.operators.knn_join import knn_join
from gelos_spark.sources import synth


def _brute_knn(tracker: pd.DataFrame, queries: pd.DataFrame) -> pd.DataFrame:
    rows = []
    tlon = tracker["lon"].to_numpy()
    tlat = tracker["lat"].to_numpy()
    tid = tracker["image_id"].to_numpy()
    for q in queries.itertuples():
        d = haversine_np(np.full_like(tlon, q.lon), np.full_like(tlat, q.lat), tlon, tlat)
        order = np.lexsort((tid, d))[: q.k]
        for rank, j in enumerate(order, start=1):
            rows.append((q.query_id, rank, tid[j], d[j]))
    return pd.DataFrame(rows, columns=["query_id", "rank", "image_id", "dist_km"])


@pytest.mark.parametrize(
    "n,q,k,seed,bf_pairs",
    [
        # bf_pairs=0 forces the ring-expansion path (the 10^12-tile
        # design); the default exercises the cost-based brute path
        (400, 16, 5, 42, 0),
        (2000, 40, 10, 11, 0),
        (2000, 40, 10, 11, 50_000_000),
    ],
)
def test_knn_exact_vs_bruteforce(spark, n, q, k, seed, bf_pairs):
    tracker = synth.tracker_df(spark, n, seed=seed)
    queries = synth.query_df(spark, q, n, seed=seed, k=k)
    got = knn_join(
        spark, tracker, queries, n_tiles_hint=n, brute_force_pairs=bf_pairs
    ).toPandas()
    exp = _brute_knn(tracker.toPandas(), queries.toPandas())
    assert got[["query_id", "rank", "image_id"]].values.tolist() == exp[
        ["query_id", "rank", "image_id"]
    ].values.tolist()
    np.testing.assert_allclose(got["dist_km"].to_numpy(), exp["dist_km"].to_numpy(), rtol=1e-12)


def test_knn_path_selection_identical(spark):
    """The optimizer's two physical strategies return identical rows."""
    tracker = synth.tracker_df(spark, 1500, seed=5)
    queries = synth.query_df(spark, 24, 1500, seed=5, k=7)
    ring = knn_join(spark, tracker, queries, n_tiles_hint=1500, brute_force_pairs=0)
    brute = knn_join(spark, tracker, queries, n_tiles_hint=1500)
    pd.testing.assert_frame_equal(ring.toPandas(), brute.toPandas())


def test_knn_k_exceeds_population(spark):
    """k larger than the tile count: returns every tile, ranked."""
    tracker = synth.tracker_df(spark, 7, seed=5)
    queries = synth.query_df(spark, 3, 7, seed=5, k=50)
    got = knn_join(spark, tracker, queries, n_tiles_hint=7).toPandas()
    assert (got.groupby("query_id").size() == 7).all()


def test_knn_resolution_invariant(spark):
    """The search resolution is a performance knob, never a results
    knob."""
    tracker = synth.tracker_df(spark, 300, seed=8)
    queries = synth.query_df(spark, 10, 300, seed=8, k=4)
    a = knn_join(spark, tracker, queries, res=4).toPandas()
    b = knn_join(spark, tracker, queries, res=9).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_knn_string_query_ids(spark):
    """String query ids flow through both physical paths (the id type
    is carried from the caller's schema, not hardcoded)."""
    tracker = synth.tracker_df(spark, 800, seed=8)
    qpdf = synth.query_df(spark, 10, 800, seed=8, k=4).toPandas()
    qpdf["query_id"] = ["q" + str(v) for v in qpdf["query_id"]]
    for bf in (0, 2_000_000):
        got = knn_join(
            spark, tracker, qpdf, n_tiles_hint=800, brute_force_pairs=bf
        ).toPandas()
        assert got["query_id"].str.startswith("q").all()
        assert len(got) == 40


# ------------------------------- distributed (corpus-sized) query path


def _sorted_rows(df):
    return sorted((r.query_id, r.rank, r.image_id, round(r.dist_km, 9)) for r in df.collect())


def test_knn_distributed_identical_to_driver_path(spark):
    from gelos_spark.operators.knn_join import knn_join_distributed

    tiles = synth.tracker_df(spark, 2000, seed=42)
    queries = synth.query_df(spark, 24, 2000, seed=42, k=6)
    a = knn_join(spark, tiles, queries, n_tiles_hint=2000, brute_force_pairs=0)
    b = knn_join_distributed(spark, tiles, queries, n_tiles_hint=2000)
    assert _sorted_rows(a) == _sorted_rows(b)


def test_knn_distributed_desert_and_small_population(spark):
    """Queries far from every tile must fall into the terminal
    cross-join pass and still return the exact top-k; k beyond the
    population returns all tiles ranked."""
    from gelos_spark.operators.knn_join import knn_join_distributed

    tiles = synth.tracker_df(spark, 40, seed=3)
    qpdf = pd.DataFrame(
        {
            "query_id": [0, 1],
            "lon": [-179.5, 12.0],
            "lat": [-54.0, 50.0],
            "k": [50, 3],
        }
    )
    queries = spark.createDataFrame(qpdf, "query_id long, lon double, lat double, k int")
    a = knn_join(spark, tiles, qpdf, n_tiles_hint=40)
    b = knn_join_distributed(spark, tiles, queries, n_tiles_hint=40)
    assert _sorted_rows(a) == _sorted_rows(b)
    got = {r.query_id: r for r in b.groupBy("query_id").count().collect()}
    assert got[0]["count"] == 40  # k=50 > population -> all ranked


def test_knn_distributed_checkpoint_false_composable(spark):
    from gelos_spark.operators.knn_join import knn_join_distributed

    tiles = synth.tracker_df(spark, 500, seed=9)
    queries = synth.query_df(spark, 8, 500, seed=9, k=4)
    b = knn_join_distributed(
        spark, tiles, queries, n_tiles_hint=500, checkpoint=False
    )
    plan = b._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" not in plan
    a = knn_join_distributed(spark, tiles, queries, n_tiles_hint=500)
    assert _sorted_rows(a) == _sorted_rows(b)


def test_knn_distributed_empty_queries(spark):
    from gelos_spark.operators.knn_join import knn_join_distributed

    tiles = synth.tracker_df(spark, 100, seed=2)
    queries = spark.createDataFrame(
        [], "query_id long, lon double, lat double, k int"
    )
    assert knn_join_distributed(spark, tiles, queries, n_tiles_hint=100).count() == 0


def test_knn_distributed_multi_round_finalization(spark, monkeypatch):
    """Force several ring rounds (initial radius pinned to 1) so
    queries finalize across DIFFERENT rounds via the column-math bound
    — exercising the per-round left_semi/left_anti splitting — and the
    result still matches the driver-resident path exactly."""
    from gelos_spark.operators import knn_join as kj

    monkeypatch.setattr(kj, "_initial_radius", lambda *a, **k: 1)
    tiles = synth.tracker_df(spark, 3000, seed=21)
    queries = synth.query_df(spark, 16, 3000, seed=21, k=5)
    a = kj.knn_join(spark, tiles, queries, n_tiles_hint=3000, brute_force_pairs=0)
    b = kj.knn_join_distributed(spark, tiles, queries, n_tiles_hint=3000)
    assert _sorted_rows(a) == _sorted_rows(b)


def test_knn_corpus_sized_queries_auto_dispatch(spark):
    """A Spark query frame past max_queries must NEVER be fully
    collected to the driver (the silent-OOM edge): knn_join probes via
    the bounded limit(max_queries+1).toPandas() collect the path
    already needs (zero extra Spark actions — the collect IS the
    guard), and on overflow routes to knn_join_distributed, returning
    rows identical to calling the distributed path directly. The trap
    below asserts the caller's unbounded frame never reaches
    toPandas() (knn_join only collects through its own limit())."""
    from gelos_spark.operators.knn_join import knn_join_distributed

    tiles = synth.tracker_df(spark, 800, seed=9)
    queries = synth.query_df(spark, 60, 800, seed=9, k=4)

    def _boom(*a, **k):  # instance-level trap: dispatch must not collect
        raise AssertionError("corpus-sized query frame reached toPandas()")

    queries.toPandas = _boom
    got = knn_join(spark, tiles, queries, n_tiles_hint=800, max_queries=50)
    exp = knn_join_distributed(spark, tiles, queries, n_tiles_hint=800)
    assert _sorted_rows(got) == _sorted_rows(exp)


def test_knn_max_queries_none_skips_probe(spark):
    """max_queries=None keeps the legacy contract: the caller asserts
    the frame is request-sized and the driver-resident path runs."""
    tiles = synth.tracker_df(spark, 400, seed=3)
    queries = synth.query_df(spark, 12, 400, seed=3, k=3)
    got = knn_join(spark, tiles, queries, n_tiles_hint=400, max_queries=None)
    brute = knn_join(spark, tiles, queries, n_tiles_hint=400)
    assert _sorted_rows(got) == _sorted_rows(brute)
