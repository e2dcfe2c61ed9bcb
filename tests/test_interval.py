"""range_join (operators/interval.py) vs brute-force pandas oracles —
half-open boundary semantics, keyed vs global intervals, fractional
numeric domains, zero-length/degenerate intervals, bucket-width
invariance, and the auto-width pre-pass. The DuckDB inequality-join
equivalence is enforced by the `range_join` contract query
(tests/test_past_window_oracles.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gelos_spark.operators.interval import range_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sides(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    )
    # error events open a 10-minute incident window for the same user
    iv = ev.where("event_type = 'error'").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end"),
    )
    return ev, iv, ev.toPandas(), iv.toPandas()


def _brute(ep, ip, keyed=True):
    rows = []
    for e in ep.itertuples():
        for i in ip.itertuples():
            if keyed and e.user_id != i.user_id:
                continue
            if i.start <= e.ts < i.end:
                rows.append((e.event_id, i.incident_id))
    return sorted(rows)


def test_keyed_matches_brute_force(spark, sides):
    ev, iv, ep, ip = sides
    out = range_join(ev, iv, on="ts", by="user_id").select(
        "event_id", "incident_id_i"
    ).collect()
    got = sorted((r.event_id, r.incident_id_i) for r in out)
    assert got == _brute(ep, ip, keyed=True)
    assert len(got) > 0


def test_global_intervals_match_brute_force(spark, sides):
    ev, iv, ep, ip = sides
    # drop the key: every user's events can land in any incident window
    iv_g = iv.drop("user_id").limit(20)
    ip_g = iv_g.toPandas()
    out = range_join(ev.limit(300), iv_g, on="ts").select(
        "event_id", "incident_id_i"
    ).collect()
    ep_s = ev.limit(300).toPandas()
    got = sorted((r.event_id, r.incident_id_i) for r in out)
    exp = sorted(
        (e.event_id, i.incident_id)
        for e in ep_s.itertuples()
        for i in ip_g.itertuples()
        if i.start <= e.ts < i.end
    )
    assert got == exp


def test_half_open_boundaries(spark):
    ev = spark.createDataFrame(
        pd.DataFrame({"eid": [0, 1, 2, 3], "t": [10.0, 20.0, 15.0, 9.999]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"iid": [7], "start": [10.0], "end": [20.0]})
    )
    out = range_join(ev, iv, on="t").select("eid").collect()
    # t==start included, t==end excluded, strictly-before excluded
    assert sorted(r.eid for r in out) == [0, 2]


def test_zero_length_and_reversed_intervals_match_nothing(spark):
    ev = spark.createDataFrame(pd.DataFrame({"eid": [0], "t": [5.0]}))
    iv = spark.createDataFrame(
        pd.DataFrame({"iid": [1, 2], "start": [5.0, 9.0], "end": [5.0, 3.0]})
    )
    assert range_join(ev, iv, on="t").count() == 0


def test_bucket_width_invariance(spark, sides):
    """The bucket width is a physical knob only: any positive width
    yields the identical result set."""
    ev, iv, *_ = sides
    base = sorted(
        (r.event_id, r.incident_id_i)
        for r in range_join(ev, iv, on="ts", by="user_id").collect()
    )
    for width_us in (60_000_000, 600_000_000, 7_200_000_000):
        got = sorted(
            (r.event_id, r.incident_id_i)
            for r in range_join(
                ev, iv, on="ts", by="user_id", bucket_us=width_us
            ).collect()
        )
        assert got == base, f"width {width_us} diverged"


def test_fractional_numeric_domain(spark):
    """Fractional double on/start/end must not be truncated: events at
    x.5 inside [x.25, x.75) windows."""
    ev = spark.createDataFrame(
        pd.DataFrame({"eid": [0, 1, 2], "t": [1.5, 2.5, 3.1]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"iid": [1, 2], "start": [1.25, 3.0], "end": [1.75, 3.05]})
    )
    out = range_join(ev, iv, on="t").collect()
    assert sorted((r.eid, r.iid_i) for r in out) == [(0, 1)]
    # an explicit fractional width must not truncate to zero (the
    # int() regression): same result at bucket_us=0.5
    frac = range_join(ev, iv, on="t", bucket_us=0.5).collect()
    assert sorted((r.eid, r.iid_i) for r in frac) == [(0, 1)]


def test_bad_bucket_raises(spark, sides):
    ev, iv, *_ = sides
    with pytest.raises(ValueError, match="bucket_us"):
        range_join(ev, iv, on="ts", bucket_us=0)
