"""asof_join (operators/asof.py) vs brute-force pandas oracles —
backward/forward, inclusivity at the boundary, tolerance, duplicate
(key, ts) tiebreak determinism, numeric on-column, null handling,
and the contract errors. The DuckDB ASOF LEFT JOIN equivalence is
enforced by the `asof_join` contract query
(tests/test_past_window_oracles.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gelos_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sides(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.where("event_type = 'purchase'").select("event_id", "user_id", "ts", "value")
    right = ev.where("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.col("value").alias("click_value")
    )
    return left, right, left.toPandas(), right.toPandas()


def _eq(a: pd.Series, b: pd.Series) -> bool:
    return bool(((a.isna() & b.isna()) | (a == b)).all())


def test_backward_matches_brute_force(spark, sides):
    left, right, lp, rp = sides
    out = (
        asof_join(left, right, on="ts", by="user_id",
                  right_cols=["click_id", "click_value"], tiebreak="click_id")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )

    def brute(row):
        c = rp[(rp.user_id == row.user_id) & (rp.ts <= row.ts)]
        if c.empty:
            return pd.Series([None, None], index=["cid", "cval"])
        c = c.sort_values(["ts", "click_id"]).iloc[-1]
        return pd.Series([c.click_id, c.click_value], index=["cid", "cval"])

    exp = pd.concat([lp, lp.apply(brute, axis=1)], axis=1).sort_values(
        "event_id").reset_index(drop=True)
    assert len(out) == len(lp) > 0
    assert _eq(out.click_id_r, exp.cid)
    assert _eq(out.click_value_r, exp.cval)
    assert out.click_id_r.notna().sum() > 0  # matches actually happen


def test_forward_and_tolerance(spark, sides):
    left, right, lp, rp = sides
    fwd = (
        asof_join(left, right, on="ts", by="user_id",
                  right_cols=["click_id"], direction="forward", tiebreak="click_id")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )

    def brute_f(row):
        c = rp[(rp.user_id == row.user_id) & (rp.ts >= row.ts)]
        if c.empty:
            return None
        return c.sort_values(["ts", "click_id"], ascending=[True, False]).iloc[0].click_id

    exp = lp.assign(cid=lp.apply(brute_f, axis=1)).sort_values(
        "event_id").reset_index(drop=True)
    assert _eq(fwd.click_id_r, exp.cid)

    hour = 3_600_000_000
    tol = asof_join(left, right, on="ts", by="user_id",
                    right_cols=["click_id"], tolerance_us=hour, tiebreak="click_id").toPandas()
    base = asof_join(left, right, on="ts", by="user_id",
                     right_cols=["click_id"], tiebreak="click_id").toPandas()
    m = (
        tol.set_index("event_id")[["click_id_r", "ts_r"]]
        .join(base.set_index("event_id")[["click_id_r", "ts_r"]], rsuffix="_b")
        .join(lp.set_index("event_id")[["ts"]])
    )
    within = m[m.click_id_r.notna()]
    # kept matches are exactly the base matches within the hour
    assert (within.click_id_r == within.click_id_r_b).all()
    assert ((within.ts - within.ts_r).dt.total_seconds() <= 3600).all()
    dropped = m[m.click_id_r.isna() & m.click_id_r_b.notna()]
    assert ((dropped.ts - dropped.ts_r_b).dt.total_seconds() > 3600).all()


def test_ties_inclusive_and_duplicate_right_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 50)], "lid long, k string, t long"
    )
    right = spark.createDataFrame(
        # two right rows at the SAME (k, t=100): greatest rid wins;
        # t=100 matches left t=100 (inclusive)
        [("u", 100, 7, 0.7), ("u", 100, 9, 0.9), ("u", 40, 1, 0.1)],
        "k string, t long, rid long, rv double",
    )
    out = {
        r.lid: (r.rid_r, r.rv_r, r.t_r)
        for r in asof_join(
            left, right, on="t", by="k", right_cols=["rid", "rv"], tiebreak="rid"
        ).collect()
    }
    assert out[1] == (9, 0.9, 100)  # inclusive + max-tiebreak row
    assert out[2] == (1, 0.1, 40)


def test_null_ts_never_matches(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", None)], "lid long, k string, t long"
    )
    right = spark.createDataFrame(
        [("u", None, 5), ("u", 90, 6)], "k string, t long, rid long"
    )
    out = {r.lid: r.rid_r for r in
           asof_join(left, right, on="t", by="k", right_cols=["rid"]).collect()}
    assert out[1] == 6  # the null-ts right row is never carried
    assert out[2] is None  # a null-ts left row picks nothing


def test_unmatched_left_rows_keep_nulls(spark):
    left = spark.createDataFrame([(1, "u", 10), (2, "v", 10)], "lid long, k string, t long")
    right = spark.createDataFrame([("u", 5, 3)], "k string, t long, rid long")
    rows = {r.lid: (r.rid_r, r.t_r) for r in
            asof_join(left, right, on="t", by="k", right_cols=["rid"]).collect()}
    assert rows[1] == (3, 5)
    assert rows[2] == (None, None)  # key v has no right rows at all


def test_contract_errors(spark):
    df = spark.createDataFrame([(1, "u", 10)], "lid long, k string, t long")
    with pytest.raises(ValueError, match="equality key"):
        asof_join(df, df, on="t", by=[])
    with pytest.raises(ValueError, match="backward"):
        asof_join(df, df, on="t", by="k", direction="nearest")
    with pytest.raises(ValueError, match="value columns"):
        asof_join(df, df.select("k", "t"), on="t", by="k")
