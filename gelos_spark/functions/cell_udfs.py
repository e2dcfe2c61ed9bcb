"""Vectorized Spark wrappers for the cell-index kernels.

Only two Python surfaces exist (input_hint: "no per-row Python"):
scalar pandas UDFs for lon/lat -> cell encoding, and pure column
expressions for everything hierarchical (parent/prefix arithmetic is
bit-shifting, which stays JVM-side in whole-stage codegen).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gelos_spark.functions import cells


def cell_encode_udf(res: int):
    """pandas_udf: (lon, lat) -> int64 cell id at ``res``."""

    @F.pandas_udf(T.LongType())
    def _encode(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(cells.cell_encode(lon.to_numpy(), lat.to_numpy(), res))

    return _encode


def cell_parent_col(cell: Column, res: int, parent_res: int) -> Column:
    """Ancestor prefix as a pure column expression (no UDF): the
    quadtree makes 'covering cell at res R' a right-shift."""
    return F.shiftrightunsigned(cell, 2 * (res - parent_res))


def cell_child_pos_col(cell: Column) -> Column:
    """Quad position (0..3) within the parent: bit0=x, bit1=y."""
    return cell.bitwiseAND(F.lit(3))


def cell_center_udf(res: int):
    """pandas_udf: cell -> struct(lon, lat) center."""

    @F.pandas_udf("lon double, lat double")
    def _center(cell: pd.Series) -> pd.DataFrame:
        lon, lat = cells.cell_to_lonlat(cell.to_numpy(), res)
        return pd.DataFrame({"lon": lon, "lat": lat})

    return _center
