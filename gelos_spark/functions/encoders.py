"""Sincos temporal / location encoders (SURVEY.md §2.6 G1/G2).

Re-expresses the reference's positional-metadata encoders —
``TemporalEncoder`` (models/prithvi_eo_v2.py:169-200: (year,
day-of-year) -> half-dim sincos each, concatenated) and
``LocationEncoder`` (:203-229: (lat, lon) likewise) over the shared
1-D sincos kernel (:93-119: omega_d = 1/10000^(d/(D/2)),
out = [sin(pos*omega), cos(pos*omega)]) — as pure NumPy kernels
wrapped in scalar pandas UDFs. No per-row Python: each Arrow batch is
one outer product.

These feed models as auxiliary inputs in the reference; in the engine
they are ordinary column functions (array<double> columns) usable in
any plan. The quadtree ``cell_encode`` remains the engine's geo->key
primitive for JOINS (G1's engine mapping); these encoders are the
model-input parity surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sincos_embed_1d(pos: np.ndarray, dim: int) -> np.ndarray:
    """[M] positions -> [M, dim] sincos embedding; the reference
    kernel's exact float64 arithmetic (omega cast to pos dtype there,
    float64 here — pytest cross-checks values against DuckDB's libm
    at 6 decimals, the engine's transcendental-rounding rule)."""
    if dim % 2 != 0:
        raise ValueError(f"embed dim must be even, got {dim}")
    pos = np.asarray(pos, dtype=np.float64).reshape(-1)
    omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
    omega = 1.0 / 10000.0**omega
    out = pos[:, None] * omega[None, :]
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def temporal_encode(year: np.ndarray, doy: np.ndarray, dim: int) -> np.ndarray:
    """(year, day-of-year) -> [M, dim]: year in the first dim//2
    columns, julian day in the rest (the reference's split at
    models/prithvi_eo_v2.py:173-174)."""
    half = dim // 2
    return np.concatenate(
        [sincos_embed_1d(year, half), sincos_embed_1d(doy, dim - half)], axis=1
    )


def location_encode(lat: np.ndarray, lon: np.ndarray, dim: int) -> np.ndarray:
    """(lat, lon) -> [M, dim]: lat first half, lon second (the
    reference's split at models/prithvi_eo_v2.py:206-207)."""
    half = dim // 2
    return np.concatenate(
        [sincos_embed_1d(lat, half), sincos_embed_1d(lon, dim - half)], axis=1
    )


def temporal_encode_col(ts: Column, dim: int) -> Column:
    """Timestamp column -> array<double> sincos temporal embedding.
    (year, dayofyear) extraction stays JVM-side; only the vectorized
    kernel runs in Python."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _enc(year: pd.Series, doy: pd.Series) -> pd.Series:
        out = temporal_encode(
            year.to_numpy(dtype=np.float64), doy.to_numpy(dtype=np.float64), dim
        )
        return pd.Series(list(out))

    return _enc(F.year(ts).cast("double"), F.dayofyear(ts).cast("double"))


def location_encode_col(lat: Column, lon: Column, dim: int) -> Column:
    """(lat, lon) columns -> array<double> sincos location embedding."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _enc(la: pd.Series, lo: pd.Series) -> pd.Series:
        out = location_encode(
            la.to_numpy(dtype=np.float64), lo.to_numpy(dtype=np.float64), dim
        )
        return pd.Series(list(out))

    return _enc(lat, lon)
