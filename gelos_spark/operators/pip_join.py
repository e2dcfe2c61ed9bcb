"""Point-in-polygon spatial join: cell-prefix coarse join + exact
ray-cast refinement (SURVEY.md §2.3 J4; north rule: "point-in-polygon
assignment of tile centroids to AOI polygons via cell-prefix hash
join with ray-casting refinement").

Two-phase plan, designed for the 10^12-tile scale:

  1. COARSE: each AOI polygon is covered by quadtree cells at an
     adaptive resolution (functions/cells.polygon_cover). The exploded
     (aoi_id, cover_cell) table is tiny relative to tiles, so the join
     `tiles JOIN cover ON tile_cell_prefix = cover_cell` broadcasts —
     the tile table is NEVER shuffled; each tile partition streams
     against the broadcast map. With a huge AOI set the same plan
     degrades gracefully to a shuffled hash join on cover_cell (drop
     the broadcast hint) — still keyed on cell id, as the north rule
     requires.
  2. REFINE: exact even-odd ray casting, vectorized NumPy inside a
     scalar pandas UDF, grouped by aoi_id within each Arrow batch.
     Only (lon, lat, aoi_id) columns flow through the join — the
     image payload stays out of the shuffle entirely and is
     re-attached by image_id afterwards if the caller needs it
     (SURVEY.md §3.3 design rule).

Determinism: cover affects only performance (refinement is exact);
output is `orderBy(aoi_id, image_id)` with no floating-point
reductions, so results are identical at any parallelism level.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gelos_spark.functions import cells
from gelos_spark.functions.cell_udfs import cell_encode_col, cell_parent_col
from gelos_spark.functions.geometry import points_in_polygon

TILE_RES = 16  # fine tile cell resolution (~600 m cells); prefix-shifts to any coarser res


def pick_cover_res(aois: list[dict], max_cells_per_aoi: int = 512) -> int:
    """Adaptive covering resolution: fine enough to prune, coarse
    enough that no AOI explodes into more than ~max_cells."""
    max_extent = 1e-9
    for p in aois:
        ring = np.asarray(p["ring"], dtype=np.float64)
        max_extent = max(
            max_extent,
            float(ring[:, 0].max() - ring[:, 0].min()),
            float(ring[:, 1].max() - ring[:, 1].min()),
        )
    # cell height at res r is 180/2^r deg; want ~sqrt(max_cells)/2 cells across
    import math

    target = 180.0 / (max_extent / (math.sqrt(max_cells_per_aoi) / 2.0))
    res = int(np.clip(math.floor(math.log2(max(target, 1.0))), 3, TILE_RES))
    return res


def build_cover_df(spark: SparkSession, aois: list[dict], cover_res: int) -> DataFrame:
    """Exploded (aoi_id, cover_cell) DataFrame. Cover generation is
    driver-side NumPy: the AOI set is the engine's small dimension
    (SURVEY.md §2.6 G6); at scale with millions of AOIs this same
    construction runs inside mapInArrow over an AOI DataFrame."""
    ids, cels = [], []
    for p in aois:
        cover = cells.polygon_cover(np.asarray(p["ring"], dtype=np.float64), cover_res)
        ids.append(np.full(len(cover), p["aoi_id"], dtype=np.int64))
        cels.append(cover)
    pdf = pd.DataFrame(
        {
            "aoi_id": np.concatenate(ids) if ids else np.asarray([], dtype=np.int64),
            "cover_cell": np.concatenate(cels) if cels else np.asarray([], dtype=np.int64),
        }
    )
    return spark.createDataFrame(pdf, schema="aoi_id long, cover_cell long")


def contains_udf(spark: SparkSession, aois: list[dict]):
    """pandas_udf (aoi_id, lon, lat) -> bool, exact ray-cast PIP.
    Rings ship once per executor via a Spark broadcast variable;
    the kernel vectorizes over each distinct aoi in the batch."""
    rings = {int(p["aoi_id"]): np.asarray(p["ring"], dtype=np.float64) for p in aois}
    bc = spark.sparkContext.broadcast(rings)

    @F.pandas_udf(T.BooleanType())
    def _contains(aoi_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        r = bc.value
        ids = aoi_id.to_numpy()
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        out = np.zeros(len(ids), dtype=bool)
        for a in np.unique(ids):
            m = ids == a
            out[m] = points_in_polygon(px[m], py[m], r[int(a)])
        return pd.Series(out)

    return _contains


def pip_join(
    spark: SparkSession,
    tiles: DataFrame,
    aois: list[dict],
    cover_res: int | None = None,
    tile_cell_col: str | None = None,
    broadcast_cover: bool = True,
) -> DataFrame:
    """Assign every tile centroid to each AOI polygon containing it.

    tiles: DataFrame with (image_id, lon, lat [, cell]) — pass
    ``tile_cell_col`` naming a precomputed res-TILE_RES cell column to
    skip re-encoding (the base table stores one; SURVEY.md §1.4).
    Returns (aoi_id, image_id, lon, lat), one row per containment,
    ordered (aoi_id, image_id).
    """
    cover_res = cover_res or pick_cover_res(aois)
    cover = build_cover_df(spark, aois, cover_res)
    if broadcast_cover:
        cover = F.broadcast(cover)

    if tile_cell_col is None:
        # pure JVM column expression — the coarse phase runs entirely in
        # whole-stage codegen; Python appears only in the refine UDF
        tiles = tiles.withColumn("_cell", cell_encode_col(F.col("lon"), F.col("lat"), TILE_RES))
        tile_cell_col = "_cell"
    pts = tiles.select(
        "image_id",
        "lon",
        "lat",
        cell_parent_col(F.col(tile_cell_col), TILE_RES, cover_res).alias("cover_cell"),
    )
    coarse = pts.join(cover, "cover_cell")
    refined = coarse.where(contains_udf(spark, aois)(F.col("aoi_id"), F.col("lon"), F.col("lat")))
    return refined.select("aoi_id", "image_id", "lon", "lat").orderBy("aoi_id", "image_id")
