"""kNN tile retrieval per query point: ring expansion over quadtree
cell disks with a secondary sort on haversine distance (SURVEY.md
§2.3 J5 / §2.5 W5; north rule: "kNN tile retrieval per query point
using ring-expansion over H3 disks with a secondary sort on
haversine distance").

Algorithm (driver-side iterative DataFrame loop — SURVEY.md §4 item 2):

  round i explores the shell of cells with grid Chebyshev distance in
  (r_{i-1}, r_i] of each ACTIVE query's cell, with geometric radius
  growth r_i = 1, 2, 4, 8. Candidates = shell ⋈ tiles on cell
  (the shell side is tiny -> broadcast: the big tile table is never
  shuffled; only matched candidates shuffle, keyed by query_id, into
  the per-query top-k window). A query finalizes when it holds >= k
  candidates whose k-th distance is <= the conservative lower bound
  on anything living outside the explored disk
  (functions/cells.knn_bound_km).

  Queries still unresolved after the max ring (points in empty
  deserts at the chosen resolution) are finalized by ONE exact
  brute-force pass: broadcast the straggler queries against the tile
  table and window top-k. At scale this is the right trade — a
  bounded number of cheap ring rounds for the dense 99.9%, then a
  single full scan shared by the rare stragglers, instead of
  quadratically-growing shell explosions per straggler.

Determinism: ranking orders by (dist, image_id) — the id tie-break
makes the output exact-match reproducible at any parallelism
(SURVEY.md §7.3); distances are float64 column expressions (JVM,
whole-stage codegen), identical order of operations everywhere.

Scale: tiles are pre-hashed to their res-``res`` cell and persisted
partitioned by cell; each round touches only active queries (the
active set shrinks fast — typically 2-4 rounds at realistic density).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gelos_spark.functions import cells
from gelos_spark.functions.cell_udfs import cell_encode_udf
from gelos_spark.functions.geometry import haversine_col

_SHELL_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("qlon", T.DoubleType(), False),
        T.StructField("qlat", T.DoubleType(), False),
        T.StructField("k", T.IntegerType(), False),
        T.StructField("cell", T.LongType(), False),
    ]
)


def _shell_expand(res: int, r0: int, r1: int):
    """mapInArrow fn: queries(query_id, lon, lat, k, qcell) ->
    exploded (query_id, qlon, qlat, k, cell) shell pairs, fully
    vectorized."""

    def fn(batches):
        for b in batches:
            pdf = b.to_pandas()
            if len(pdf) == 0:
                continue
            idx, shell = cells.cell_shell_batch(pdf["qcell"].to_numpy(), res, r0, r1)
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy()[idx],
                    "qlon": pdf["lon"].to_numpy()[idx],
                    "qlat": pdf["lat"].to_numpy()[idx],
                    "k": pdf["k"].to_numpy()[idx].astype(np.int32),
                    "cell": shell,
                }
            ).drop_duplicates(["query_id", "cell"])
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return fn


def default_res(n_tiles: int) -> int:
    """Pick the search resolution so a handful of cells holds ~k
    tiles at average density (tiles span ~1/9 of the globe in the
    fixtures; the loop self-corrects either way)."""
    return int(np.clip(int(np.log2(max(n_tiles, 2)) / 2) + 1, 3, 14))


def knn_join(
    spark: SparkSession,
    tiles: DataFrame,
    queries: DataFrame,
    res: int | None = None,
    n_tiles_hint: int | None = None,
    max_ring: int = 8,
) -> DataFrame:
    """k nearest tiles per query point.

    tiles: (image_id, lon, lat); queries: (query_id, lon, lat, k).
    Returns (query_id, rank, image_id, dist_km), ordered by
    (query_id, rank).
    """
    if res is None:
        n_hint = n_tiles_hint if n_tiles_hint is not None else tiles.count()
        res = default_res(n_hint)
    n_grid = 1 << res

    tiles_c = (
        tiles.select("image_id", "lon", "lat")
        .withColumn("cell", cell_encode_udf(res)(F.col("lon"), F.col("lat")))
        .persist()
    )
    tiles_c.count()  # materialize once

    active = (
        queries.select("query_id", "lon", "lat", F.col("k").cast("int").alias("k"))
        .withColumn("qcell", cell_encode_udf(res)(F.col("lon"), F.col("lat")))
        .persist()
    )
    n_active = active.count()

    w = Window.partitionBy("query_id").orderBy(F.col("dist_km").asc(), F.col("image_id").asc())
    topk = None  # accumulated per-query top-k so far
    finalized = []
    r_prev, r_cur = -1, 1

    while n_active > 0 and r_prev < min(max_ring, n_grid):
        shell = active.mapInArrow(_shell_expand(res, r_prev, r_cur), _SHELL_SCHEMA)
        cand = (
            F.broadcast(shell)
            .join(tiles_c, "cell")
            .select(
                "query_id",
                "qlon",
                "qlat",
                "k",
                "image_id",
                haversine_col(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")).alias(
                    "dist_km"
                ),
            )
        )
        pool = cand if topk is None else topk.unionByName(cand)
        new_topk = (
            pool.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= F.col("k"))
            .drop("rank")
            .persist()
        )
        if topk is not None:
            topk.unpersist()
        topk = new_topk

        # resolution test: kth distance within the explored-disk bound
        r_done = r_cur

        @F.pandas_udf(T.DoubleType())
        def bound_udf(qlat: pd.Series) -> pd.Series:
            return pd.Series(cells.knn_bound_km(qlat.to_numpy(), res, r_done))

        stats = topk.groupBy("query_id").agg(
            F.count("*").alias("n"), F.max("dist_km").alias("kth"), F.first("qlat").alias("qlat"),
            F.first("k").alias("kk"),
        )
        done_ids = stats.where(
            ((F.col("n") >= F.col("kk")) & (F.col("kth") <= bound_udf(F.col("qlat"))))
            | F.lit(2 * r_cur + 1 >= n_grid)
        ).select("query_id")

        # materialize finalized rows eagerly: later rounds unpersist the
        # frames this selection was derived from, and the caller's
        # actions must not replay the whole loop
        done_rows = (
            topk.join(F.broadcast(done_ids), "query_id", "left_semi")
            .select("query_id", "image_id", "dist_km")
            .persist()
        )
        done_rows.count()
        finalized.append(done_rows)
        remaining = active.join(F.broadcast(done_ids), "query_id", "left_anti").persist()
        n_active = remaining.count()
        active.unpersist()
        active = remaining
        topk = topk.join(F.broadcast(done_ids), "query_id", "left_anti")

        r_prev, r_cur = r_cur, r_cur * 2

    if n_active > 0:
        # stragglers: one exact brute-force pass — broadcast the few
        # unresolved queries against the tile table (complete by
        # construction, so the partial ring candidates are dropped)
        brute = (
            tiles_c.crossJoin(
                F.broadcast(active.select("query_id", F.col("lon").alias("qlon"),
                                          F.col("lat").alias("qlat"), "k"))
            )
            .select(
                "query_id",
                "k",
                "image_id",
                haversine_col(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")).alias(
                    "dist_km"
                ),
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .select("query_id", "image_id", "dist_km")
            .persist()
        )
        brute.count()
        finalized.append(brute)

    if not finalized:
        return spark.createDataFrame(
            [], "query_id long, rank int, image_id string, dist_km double"
        )
    out = finalized[0]
    for f in finalized[1:]:
        out = out.unionByName(f)
    result = (
        out.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(queries.select("query_id", "k")), "query_id")
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "image_id", "dist_km")
        .orderBy("query_id", "rank")
        .persist()
    )
    result.count()
    tiles_c.unpersist()
    active.unpersist()
    for f in finalized:
        f.unpersist()
    return result
