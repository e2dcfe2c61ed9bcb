"""Chained extraction strategies vs the ACTUAL reference primitive:
PyArrow ``list_slice``/``list_flatten`` (the calls the reference makes
at gelos/embedding_extraction.py:27-36), applied step-for-step."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
from pyspark.sql import functions as F

from gelos_spark.functions import arrays as ar


def _ref_chain_py(lists: list[list], steps: list[dict]) -> list[list]:
    """Per-row python reference with PyArrow slice semantics
    (0-based start, exclusive stop, step)."""
    out = lists
    for st in steps:
        if st.get("flatten"):
            out = [[x for sub in row for x in sub] for row in out]
        else:
            s, e, k = st["start"], st["stop"], st.get("step", 1)
            out = [row[s:e:k] for row in out]
    return out


@pytest.fixture(scope="module")
def flat_df(spark):
    rng = np.random.default_rng(3)
    rows = [
        {"vec_id": i, "v": rng.standard_normal(rng.integers(0, 20)).round(4).tolist()}
        for i in range(50)
    ]
    return spark.createDataFrame(pd.DataFrame(rows)), [r["v"] for r in rows]


def test_slice_step_matches_pyarrow(spark, flat_df):
    df, lists = flat_df
    # pyarrow requires start < stop; the engine mirrors that domain
    for start, stop, step in [(0, 5, 1), (2, 17, 3), (1, 4, 2), (0, 100, 7)]:
        got = [
            r["s"]
            for r in df.orderBy("vec_id")
            .select(ar.slice_step_col(F.col("v"), start, stop, step).alias("s"))
            .collect()
        ]
        want = pc.list_slice(pa.array(lists), start, stop, step=step).to_pylist()
        assert [[round(float(x), 4) for x in g] for g in got] == [
            [round(float(x), 4) for x in w] for w in want
        ], (start, stop, step)


def test_chain_with_flatten_matches_reference(spark):
    rng = np.random.default_rng(9)
    rows = [
        {
            "vec_id": i,
            "v": [rng.standard_normal(6).round(4).tolist() for _ in range(5)],
        }
        for i in range(30)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    lists = [r["v"] for r in rows]
    steps = [
        {"start": 1, "stop": 5, "step": 2},
        {"flatten": True},
        {"start": 2, "stop": 11, "step": 3},
    ]
    got = [
        [round(float(x), 4) for x in r["out"]]
        for r in df.orderBy("vec_id")
        .select(ar.apply_strategy_chain(F.col("v"), steps).alias("out"))
        .collect()
    ]
    want = [[round(float(x), 4) for x in w] for w in _ref_chain_py(lists, steps)]
    assert got == want


def test_chunked(spark, flat_df):
    df, lists = flat_df
    got = {
        r["vec_id"]: r["c"]
        for r in df.select("vec_id", ar.chunked_col(F.col("v"), 4).alias("c")).collect()
    }
    for i, row in enumerate(lists):
        want = [row[j : j + 4] for j in range(0, 4 * (len(row) // 4), 4)]
        have = [[round(float(x), 4) for x in ch] for ch in got[i]]
        assert have == [[round(float(x), 4) for x in w] for w in want]


def test_sql_mirror_is_identical(spark, flat_df):
    import duckdb

    df, lists = flat_df
    steps = [{"start": 1, "stop": 15, "step": 2}]
    got = [
        tuple(round(float(x), 4) for x in r["out"])
        for r in df.orderBy("vec_id")
        .select(ar.apply_strategy_chain(F.col("v"), steps).alias("out"))
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"vec_id": range(len(lists)), "v": lists}))
    sql = ar.strategy_chain_sql("v", steps)
    want = [
        tuple(round(float(x), 4) for x in row[0])
        for row in con.execute(f"SELECT {sql} FROM t ORDER BY vec_id").fetchall()
    ]
    assert got == want
