"""The driver's correctness gate records only the first 50 registered
queries; the PAST_WINDOW_ORACLE_QUERIES below are oracle-backed
queries living past that window (see __spark_entry__.py's past-window
section; round 6 rotated hamming_pairs INTO the window and
array_repeat_concat out, added near_dup_components with a
recursive-CTE DuckDB oracle, hash_split_assign and
snapshot_pruned_scan with portable-arithmetic oracles, and upgraded
knn_distributed from rows-only to the same brute-force cross-join
oracle shape as knn_join). Their DuckDB-exactness
was previously checked only when scripts/check_oracle.py was run by
hand; this test runs the same compare (same canon, same oracle SQL) at
sf0.001 inside the suite so the evidence regenerates every round.
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys

import duckdb
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import __spark_entry__ as entrymod  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "check_oracle", ROOT / "scripts" / "check_oracle.py"
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)

SF_DIR = "/root/testdata/sf0.001"
PAST_WINDOW_ORACLE_QUERIES = [
    "fmt_latlon",
    "location_encode",
    "array_repeat_concat",
    "near_dup_components",
    "hash_split_assign",
    "snapshot_pruned_scan",
    "knn_distributed",
    "asof_join",
    "range_join",
    "sessionize",
    "snapshot_incremental",
    "top_terms",
    "tf_idf",
    "minhash_portable",
    "simhash_portable",
    "stream_interval_join",
    "quantile_filter",
    "lsh_portable",
    "ivf_portable",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in check_oracle.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_past_window_queries_have_oracles():
    """The names this file guards must still be registered past the
    window WITH oracle SQL — if a future slot rotation renames one,
    this fails loudly instead of silently un-checking it."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    window = list(qs)[:50]
    for name in PAST_WINDOW_ORACLE_QUERIES:
        assert name in qs and name in oracles
        assert name not in window, f"{name} moved INTO the window; update this test"


@pytest.mark.parametrize("name", PAST_WINDOW_ORACLE_QUERIES)
def test_past_window_oracle_exact(spark, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR).toPandas()
    odf = duck.execute(oracles[name]).fetchdf()
    scols, srows = check_oracle.canon(sdf)
    ocols, orows = check_oracle.canon(odf)
    assert [c.lower() for c in scols] == [c.lower() for c in ocols]
    assert len(srows) == len(orows) and len(srows) > 0
    bad = [(a, b) for a, b in zip(srows, orows) if repr(a) != repr(b)]
    assert not bad, f"{name}: {len(bad)}/{len(srows)} rows differ; first: {bad[0]}"
