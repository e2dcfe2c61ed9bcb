"""W4 random-mask kernel (operators/masking.py).

Oracle 1: the kernel's kept (pos, val) set equals the exploded
window-SQL form (argsort-of-hash-noise via row_number) — the same
relation the driver's DuckDB oracle checks for ``mask_topk``.
Oracle 2: the reference's random_masking invariants
(models/prithvi_eo_v2.py:317-348): mask has exactly L - len_keep
ones, kept positions carry mask 0, ids_restore inverts the shuffle.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gelos_spark.operators import masking

KEEP = 8


def _emb(spark, n=64, dim=24):
    rows = [
        (i, [float((i * 31 + j * 7) % 97) / 9.7 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _exploded_oracle(df):
    e = df.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
    # negative-safe mod-2^31 reduction (matches NumPy's non-negative %)
    id_r = (
        F.col("vec_id") % F.lit(masking.NOISE_ID_MOD) + F.lit(masking.NOISE_ID_MOD)
    ) % F.lit(masking.NOISE_ID_MOD)
    h = (
        id_r * F.lit(masking.NOISE_A)
        + (F.col("pos") + 1) * F.lit(masking.NOISE_B)
    ) % F.lit(masking.NOISE_MOD)
    w = Window.partitionBy("vec_id").orderBy(h.asc(), F.col("pos").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KEEP)
        .select("vec_id", "pos", "val")
    )


def test_kernel_matches_exploded_sql(spark):
    df = _emb(spark)
    masked = masking.random_mask(df, "embedding", "vec_id", len_keep=KEEP)
    kernel = {
        (r.vec_id, p, round(v, 9))
        for r in masked.collect()
        for p, v in zip(r.kept_pos, r.kept_val)
    }
    oracle = {
        (r.vec_id, r.pos, round(r.val, 9)) for r in _exploded_oracle(df).collect()
    }
    assert kernel == oracle


def test_reference_invariants(spark):
    df = _emb(spark, n=16, dim=12)
    out = {r.vec_id: r for r in masking.random_mask(df, "embedding", "vec_id", len_keep=5).collect()}
    vals = {r.vec_id: r.embedding for r in df.collect()}
    for vid, r in out.items():
        length = len(vals[vid])
        # binary mask: exactly L - len_keep removed, kept positions are 0
        assert sum(r.mask) == length - 5
        assert all(r.mask[p] == 0 for p in r.kept_pos)
        # kept_val gathers the original values at kept_pos (shuffle order)
        assert r.kept_val == [vals[vid][p] for p in r.kept_pos]
        # ids_restore inverts the argsort: restore[order] == identity
        noise = masking.noise_matrix(np.array([vid]), length)[0]
        order = np.argsort(noise, kind="stable")
        assert list(np.asarray(r.ids_restore)[order]) == list(range(length))
        # shuffle order is ascending noise; the kept set is its prefix
        assert list(r.kept_pos) == list(order[:5])


def test_mask_ratio_maps_to_len_keep(spark):
    df = _emb(spark, n=8, dim=16)
    out = masking.random_mask(df, "embedding", "vec_id", mask_ratio=0.75).collect()
    for r in out:
        assert len(r.kept_pos) == 4  # int(16 * 0.25)


def test_partition_layout_invariant(spark):
    df = _emb(spark, n=40, dim=10)
    a = masking.random_mask(df.repartition(1), "embedding", "vec_id", len_keep=3)
    b = masking.random_mask(df.repartition(7, "vec_id"), "embedding", "vec_id", len_keep=3)
    ca = sorted((r.vec_id, tuple(r.kept_pos), tuple(r.mask)) for r in a.collect())
    cb = sorted((r.vec_id, tuple(r.kept_pos), tuple(r.mask)) for r in b.collect())
    assert ca == cb


def test_ragged_lengths(spark):
    rows = [(i, [float(j) for j in range(6 + (i % 3) * 4)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = masking.random_mask(df, "embedding", "vec_id", mask_ratio=0.5).collect()
    for r in out:
        length = 6 + (r.vec_id % 3) * 4
        assert len(r.mask) == length
        assert len(r.kept_pos) == length // 2


def test_large_id_kernel_matches_duckdb(spark):
    """Corpus-scale ids (above 2^31 and ~3.5e9, where the pre-fix
    int64 multiply overflowed) and a negative id must keep the kernel
    bit-exact with the SQL oracle's arithmetic (ADVICE r3)."""
    import duckdb

    ids = [7, (1 << 31) + 5, 3_500_000_123, (1 << 62) + 11, -9]
    dim = 16
    rows = [(i, [float((abs(i) * 13 + j) % 50) for j in range(dim)]) for i in ids]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    masked = masking.random_mask(df, "embedding", "vec_id", len_keep=KEEP)
    kernel = {
        (r.vec_id, p + 1, round(v, 9))
        for r in masked.collect()
        for p, v in zip(r.kept_pos, r.kept_val)
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {list(v)!r}::DOUBLE[])" for i, v in rows)
        + ") t(vec_id, embedding)"
    )
    oracle_rows = con.execute(
        "WITH p AS (SELECT vec_id, unnest(list_transform(range(1, len(embedding) + 1), "
        "i -> {'pos': i, 'val': embedding[i]})) AS u FROM embeddings), "
        "e AS (SELECT vec_id, u.pos AS pos, u.val AS val FROM p), "
        "r AS (SELECT vec_id, pos, val, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY (((vec_id % {masking.NOISE_ID_MOD}) + {masking.NOISE_ID_MOD}) "
        f"% {masking.NOISE_ID_MOD} * {masking.NOISE_A} + pos * {masking.NOISE_B}) "
        f"% {masking.NOISE_MOD}, pos) AS rn FROM e) "
        f"SELECT vec_id, pos, val FROM r WHERE rn <= {KEEP}"
    ).fetchall()
    oracle = {(vid, pos, round(val, 9)) for vid, pos, val in oracle_rows}
    assert kernel == oracle


def test_rejects_bad_args(spark):
    df = _emb(spark, n=4, dim=8)
    with pytest.raises(ValueError):
        masking.random_mask(df, "embedding", "vec_id")
    with pytest.raises(ValueError):
        masking.random_mask(df, "embedding", "vec_id", len_keep=3, mask_ratio=0.5)
    s = df.withColumn("vec_id", F.col("vec_id").cast("string"))
    with pytest.raises(ValueError):
        masking.random_mask(s, "embedding", "vec_id", len_keep=3)
