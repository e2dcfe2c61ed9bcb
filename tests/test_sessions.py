"""Gap-based sessionization (functions/sessions.py) vs brute-force
pandas oracles; the DuckDB window-algebra equivalence is enforced by
the `sessionize` contract query (tests/test_past_window_oracles.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gelos_spark.functions.sessions import session_stats, sessionize

SF = "/root/testdata/sf0.001"
GAP = 1_800_000_000  # 30 min


def _brute_ords(rp: pd.DataFrame) -> pd.Series:
    out = {}
    for _, grp in rp.groupby("user_id"):
        grp = grp.sort_values("ts")
        ordn = 0
        prev = None
        for idx, row in grp.iterrows():
            if prev is None or (row.ts - prev).total_seconds() * 1e6 > GAP:
                ordn += 1
            prev = row.ts
            out[idx] = ordn
    return pd.Series(out)


def test_sessionize_matches_brute_force(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id", "ts")
    got = sessionize(ev, on="ts", by="user_id", gap_us=GAP).toPandas()
    rp = ev.toPandas().set_index("event_id")
    exp = _brute_ords(rp)
    g = got.set_index("event_id").session_ord
    assert len(g) == len(exp) > 0
    assert (g.loc[exp.index] == exp).all()
    assert int(g.max()) > 1  # gaps actually split sessions


def test_session_stats_consistent(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id", "ts")
    st = session_stats(ev, gap_us=GAP).toPandas()
    assert st.n_events.sum() == ev.count()
    assert (st.session_start <= st.session_end).all()
    # within a user, sessions are disjoint and ordered: next session
    # starts more than GAP after the previous one ends
    for _, grp in st.groupby("user_id"):
        grp = grp.sort_values("session_ord")
        gaps = (grp.session_start.shift(-1) - grp.session_end).dropna()
        assert (gaps.dt.total_seconds() * 1e6 > GAP).all()


def test_numeric_on_null_and_contract(spark):
    df = spark.createDataFrame(
        [(1, "u", 0), (2, "u", 50), (3, "u", 200), (4, "u", None), (5, "v", 7)],
        "eid long, k string, t long",
    )
    got = {r.eid: r.session_ord for r in
           sessionize(df, on="t", by="k", gap_us=100).collect()}
    assert got[1] == 1 and got[2] == 1  # gap 50 <= 100
    assert got[3] == 2  # gap 150 splits
    assert got[4] is None  # null time -> no session
    assert got[5] == 1  # fresh key restarts at 1
    with pytest.raises(ValueError, match="key column"):
        sessionize(df, on="t", by=[])
