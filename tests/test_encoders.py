"""Sincos temporal/location encoders (functions/encoders.py) vs two
oracles: a from-first-principles NumPy recomputation and DuckDB's
libm sin/cos at the engine's 6-decimal transcendental rounding rule.
Reference semantics: models/prithvi_eo_v2.py:93-119 (kernel),
:169-200 (temporal), :203-229 (location).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from gelos_spark.functions import encoders as enc


def test_kernel_matches_first_principles():
    pos = np.array([0.0, 1.0, 2024.0, 365.0, -33.5])
    dim = 8
    got = enc.sincos_embed_1d(pos, dim)
    for m, p in enumerate(pos):
        for d in range(dim // 2):
            omega = 1.0 / 10000.0 ** (d / (dim / 2.0))
            assert got[m, d] == np.sin(p * omega)
            assert got[m, dim // 2 + d] == np.cos(p * omega)
    with pytest.raises(ValueError, match="even"):
        enc.sincos_embed_1d(pos, 7)


def test_splits_match_reference_layout():
    y, d = np.array([2020.0, 2024.0]), np.array([1.0, 366.0])
    t = enc.temporal_encode(y, d, 12)
    assert t.shape == (2, 12)
    assert np.array_equal(t[:, :6], enc.sincos_embed_1d(y, 6))
    assert np.array_equal(t[:, 6:], enc.sincos_embed_1d(d, 6))
    la, lo = np.array([-45.0, 60.0]), np.array([170.0, -175.0])
    loc = enc.location_encode(la, lo, 8)
    assert np.array_equal(loc[:, :4], enc.sincos_embed_1d(la, 4))
    assert np.array_equal(loc[:, 4:], enc.sincos_embed_1d(lo, 4))


def test_temporal_column_over_events(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(200)
    dim = 8
    out = events.select(
        "event_id",
        F.year("ts").cast("double").alias("y"),
        F.dayofyear("ts").cast("double").alias("d"),
        enc.temporal_encode_col(F.col("ts"), dim).alias("emb"),
    ).collect()
    assert len(out) == 200
    for r in out:
        exp = enc.temporal_encode(np.array([r.y]), np.array([r.d]), dim)[0]
        assert list(r.emb) == list(exp)


def test_duckdb_libm_cross_check(spark):
    """Engine sincos values agree with DuckDB's sin/cos to 6 decimals
    (the determinism rule every transcendental output follows).
    Layout for dim=8: [sin(la*om), cos(la*om), sin(lo*om), cos(lo*om)]
    blocks of 2 each, om_d = 1/10000^(d/2) for d in {0, 1}."""
    dim = 8  # each half must itself be even -> dim % 4 == 0
    half = dim // 2
    rows = [(float(i) * 1.7 - 40.0, float(17 + 3 * i)) for i in range(50)]
    df = spark.createDataFrame(rows, "la double, lo double")
    got = {
        (r.la, r.lo): list(r.emb)
        for r in df.select(
            "la", "lo", enc.location_encode_col(F.col("la"), F.col("lo"), dim).alias("emb")
        ).collect()
    }
    con = duckdb.connect()
    for (la, lo), emb in got.items():
        for block, p in ((0, la), (half, lo)):
            for d in range(half // 2):
                om = 1.0 / 10000.0 ** (d / (half / 2.0))
                s = con.execute("SELECT round(sin(? * ?), 6)", [p, om]).fetchone()[0]
                c = con.execute("SELECT round(cos(? * ?), 6)", [p, om]).fetchone()[0]
                assert round(emb[block + d], 6) == s
                assert round(emb[block + half // 2 + d], 6) == c


def test_partition_layout_invariant(spark):
    rows = [(float(i) * 0.7, float(i) * -1.3) for i in range(300)]
    df = spark.createDataFrame(rows, "la double, lo double")
    a = df.repartition(1).select(
        "la", enc.location_encode_col(F.col("la"), F.col("lo"), 4).alias("e")
    )
    b = df.repartition(9).select(
        "la", enc.location_encode_col(F.col("la"), F.col("lo"), 4).alias("e")
    )
    ca = sorted((r.la, tuple(r.e)) for r in a.collect())
    cb = sorted((r.la, tuple(r.e)) for r in b.collect())
    assert ca == cb
