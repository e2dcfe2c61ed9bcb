"""pairs -> connected components -> survivor selection
(operators/dedup.connected_components / dedup_near — the transitive
half of near-dedup: pair operators emit edges, these group them into
duplicate clusters and pick one survivor per cluster). Oracle:
pure-Python union-find over the same edge list."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gelos_spark.operators import dedup


def _uf(edges):
    """Union-find oracle: {node: min id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _pairs_df(spark, edges, typ="long"):
    pdf = pd.DataFrame(edges, columns=["id_a", "id_b"])
    return spark.createDataFrame(pdf, f"id_a {typ}, id_b {typ}")


def test_random_graph_matches_union_find(spark):
    """250 random edges over a sparse id space — components exactly
    equal the union-find oracle's, including multi-hop merges."""
    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 500, size=(250, 2))
        if a != b
    ]
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(_pairs_df(spark, edges)).collect()
    }
    assert got == _uf(edges)


def test_chain_converges_fast(spark):
    """A 64-node path graph has diameter 63 — min-label propagation
    would need 63 rounds; star contraction must collapse it to one
    component well inside the default max_rounds (it raises on
    non-convergence, so returning at all is the assertion)."""
    edges = [(i, i + 1) for i in range(63)]
    out = dedup.connected_components(_pairs_df(spark, edges)).collect()
    assert len(out) == 64
    assert {r["component"] for r in out} == {0}
    assert sorted(r["id"] for r in out) == list(range(64))


def test_cliques_stay_separate_and_unpaired_ids_absent(spark):
    edges = [(a, b) for a in range(0, 5) for b in range(a + 1, 5)] + [
        (a, b) for a in range(100, 104) for b in range(a + 1, 104)
    ]
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(_pairs_df(spark, edges)).collect()
    }
    assert got == {**{i: 0 for i in range(5)}, **{i: 100 for i in range(100, 104)}}
    assert 50 not in got  # ids not in any pair don't appear


def test_empty_pairs(spark):
    out = dedup.connected_components(_pairs_df(spark, []))
    assert out.columns == ["id", "component"]
    assert out.count() == 0


def test_string_ids(spark):
    """greatest/least and min are lexicographic on strings — the
    survivor is the lexicographic minimum."""
    edges = [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("zz", "zy")]
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(
            _pairs_df(spark, edges, typ="string")
        ).collect()
    }
    assert got == {
        "doc_a": "doc_a",
        "doc_b": "doc_a",
        "doc_c": "doc_a",
        "zy": "zy",
        "zz": "zy",
    }


def test_dedup_near_annotates_and_filters(spark):
    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    # clusters {0,1,2} (a chain) and {7,8}; the rest unpaired
    pairs = _pairs_df(spark, [(0, 1), (1, 2), (7, 8)])

    ann = dedup.dedup_near(docs, pairs, id_col="doc_id").collect()
    comp = {r["doc_id"]: r["component"] for r in ann}
    canon = {r["doc_id"]: r["is_canonical"] for r in ann}
    assert comp == {0: 0, 1: 0, 2: 0, 7: 7, 8: 7, **{i: i for i in (3, 4, 5, 6, 9, 10, 11)}}
    assert canon[0] and not canon[1] and not canon[2] and canon[7] and not canon[8]
    assert all(canon[i] for i in (3, 4, 5, 6, 9, 10, 11))

    kept = dedup.dedup_near(docs, pairs, id_col="doc_id", keep="canonical")
    assert kept.columns == ["doc_id", "component"]
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 3, 4, 5, 6, 7, 9, 10, 11]

    with pytest.raises(ValueError, match="keep"):
        dedup.dedup_near(docs, pairs, id_col="doc_id", keep="first")


def test_components_over_real_pair_operator(spark):
    """End-to-end with a real edge source: hamming_hash_pairs over a
    fingerprint designed so consecutive docs chain (hamming 2) within
    groups of 8 — components must be exactly the groups, found
    transitively (doc 0~2 is hamming 4, NOT an edge)."""
    docs = spark.range(0, 64).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "CAST(3 * shiftleft(CAST(1 AS BIGINT), CAST(id % 8 AS INT)) AS BIGINT)"
            " + CAST((CASE WHEN (id div 8) % 2 = 1 THEN 7 * shiftleft(CAST(1 AS BIGINT), 20) ELSE 0 END)"
            " + (CASE WHEN (id div 8) % 4 >= 2 THEN 7 * shiftleft(CAST(1 AS BIGINT), 23) ELSE 0 END)"
            " + (CASE WHEN (id div 8) >= 4 THEN 7 * shiftleft(CAST(1 AS BIGINT), 26) ELSE 0 END) AS BIGINT)"
        ).alias("fp"),
    )
    pairs = dedup.hamming_hash_pairs(docs, "doc_id", "fp", max_hamming=2)
    edge_list = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    # consecutive-within-group edges only
    assert edge_list == [
        (g * 8 + i, g * 8 + i + 1) for g in range(8) for i in range(7)
    ]
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {i: (i // 8) * 8 for i in range(64)}


def test_long_chain_pins_logarithmic_convergence(spark):
    """A 512-node path (diameter 511): min-label propagation would
    need 511 rounds; star contraction must converge within the
    default max_rounds=25 (it raises otherwise) — this pins the
    O(log^2 n) round-complexity claim, not just correctness."""
    edges = [(i, i + 1) for i in range(511)]
    out = dedup.connected_components(_pairs_df(spark, edges)).collect()
    assert len(out) == 512
    assert {r["component"] for r in out} == {0}
