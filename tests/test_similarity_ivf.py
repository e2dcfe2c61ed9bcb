"""IVF approximate-nearest-neighbor path: deterministic training,
inverted-list probing, recall vs the brute-force oracle, and the
nprobe=n_centroids exactness degeneration."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gelos_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(17)
    # 8 well-separated gaussian clusters in 16-d
    centers = rng.standard_normal((8, 16)) * 6.0
    rows = []
    for i in range(600):
        c = i % 8
        rows.append(
            {"vec_id": i, "embedding": (centers[c] + rng.standard_normal(16)).tolist()}
        )
    return spark.createDataFrame(pd.DataFrame(rows)).persist()


def test_list_matrix_validates_per_row_lengths():
    """The batch input kernel under the whole ANN family. Per-row
    lengths are validated from the list OFFSETS — an aggregate-size
    check alone would let deviations cancel (rows of len 3 and 5 with
    dim 4 flatten to 8 == 2*4) and reshape silently into wrong rows
    (round-5 advice). Ragged/null batches must fail loudly via the
    per-row fallback, never silently."""
    import pyarrow as pa

    good = pa.array([[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0]])
    m = sim._list_matrix(good, 2, 4)
    assert m.shape == (2, 4) and m[1, 0] == 5.0 and m.dtype == np.float64

    # a sliced ListArray's offsets don't start at 0 — still exact
    sl = pa.array([[9.0, 9.0, 9.0, 9.0], [1.0, 2.0, 3.0, 4.0]]).slice(1, 1)
    assert np.array_equal(sim._list_matrix(sl, 1, 4), [[1.0, 2.0, 3.0, 4.0]])

    ragged = pa.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0, 7.0, 8.0]])  # 3+5 == 2*4
    with pytest.raises(ValueError):
        sim._list_matrix(ragged, 2, 4)

    nulls = pa.array([[1.0, 2.0, 3.0, 4.0], None])
    with pytest.raises((TypeError, ValueError)):
        sim._list_matrix(nulls, 2, 4)


def test_fold_dot_bit_equals_jvm(spark):
    """Every top-k scorer now runs through the Arrow pair scorer
    (`_cosine_pairs_frame` / `_fold_dot`), whose contract is
    BIT-identity with the JVM `aggregate(zip_with(...))` left fold it
    replaced — not closeness. Pin the two against each other on
    adversarial float data (9 orders of magnitude, sign flips: any
    summation-order deviation shows up in the low bits here), at a
    dim (37) that exercises the odd/non-power-of-two path."""
    rng = np.random.default_rng(99)
    n, dim = 64, 37
    scale = 10.0 ** rng.integers(-4, 5, size=(n, dim))
    qv = rng.standard_normal((n, dim)) * scale
    cv = rng.standard_normal((n, dim)) * scale
    pdf = pd.DataFrame(
        {
            "query_id": range(n),
            "vec_id": range(n),
            "qv": [r.tolist() for r in qv],
            "cv": [r.tolist() for r in cv],
            "qn": 1.0,
            "cn": 1.0,
        }
    )
    df = spark.createDataFrame(pdf)
    jvm = {
        r["vec_id"]: r["d"]
        for r in df.select(
            "vec_id", (sim._dot_expr("cv", "qv")).alias("d")
        ).collect()
    }
    arrow = {
        r["vec_id"]: r["cosine"]
        for r in sim._cosine_pairs_frame(df).collect()  # qn=cn=1 -> raw dot
    }
    assert len(jvm) == n
    for i in range(n):
        assert jvm[i] == arrow[i], f"bit mismatch at row {i}: {jvm[i]!r} != {arrow[i]!r}"


def test_block_cosine_bit_equals_jvm_fold(spark):
    """`brute_force_topk` and the IVF cogroup scorer score whole
    blocks through `_block_cosine_batches` (one outer-product add per
    dimension). Its contract is the same BIT-identity with the JVM
    fold that `_fold_dot` carries — the self-search equality test
    can't prove it alone because both sides of that comparison share
    this kernel. Pin the block kernel's full nc x nq cross (with
    query chunking forced via a tiny max_cells, so the chunk seams
    are exercised) against the JVM `_dot_expr`/`_norm_expr` cosine on
    adversarial floats spanning 9 orders of magnitude."""
    import pyarrow as pa

    rng = np.random.default_rng(101)
    nc, nq, dim = 23, 11, 37
    C = rng.standard_normal((nc, dim)) * 10.0 ** rng.integers(-4, 5, size=(nc, dim))
    Q = rng.standard_normal((nq, dim)) * 10.0 ** rng.integers(-4, 5, size=(nq, dim))
    schema = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("cosine", pa.float64())]
    )
    got = {}
    for b in sim._block_cosine_batches(
        pa.array(np.arange(nc)), C, sim._fold_norms(C),
        pa.array(np.arange(nq)), Q, sim._fold_norms(Q),
        schema, max_cells=64,  # step=2 queries per chunk at nc=23
    ):
        qs, vs, cs = (col.to_pylist() for col in b.columns)
        got.update(zip(zip(qs, vs), cs))
    assert len(got) == nc * nq
    j = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(nc), "cv": [r.tolist() for r in C]})
    ).crossJoin(
        spark.createDataFrame(
            pd.DataFrame({"query_id": range(nq), "qv": [r.tolist() for r in Q]})
        )
    )
    jvm = {
        (r["query_id"], r["vec_id"]): r["c"]
        for r in j.select(
            "query_id",
            "vec_id",
            (
                sim._dot_expr("cv", "qv")
                / (sim._norm_expr("cv") * sim._norm_expr("qv"))
            ).alias("c"),
        ).collect()
    }
    for key, val in jvm.items():
        assert got[key] == val, f"bit mismatch at {key}: {got[key]!r} != {val!r}"


def test_cosine_pairs_frame_infers_dim_and_rejects_ragged(spark):
    """dim=None (the brute_force_topk path, which has no centroid
    matrix to read the dimensionality from) infers dim from the first
    row's offsets per batch; every other row is then validated against
    it by _list_matrix, so a ragged pair frame still fails loudly
    instead of reshaping wrong."""
    ok = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [0, 1],
                "vec_id": [10, 11],
                "qv": [[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]],
                "cv": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                "qn": [1.0, 2.0],
                "cn": [1.0, 1.0],
            }
        )
    )
    got = {r["vec_id"]: r["cosine"] for r in sim._cosine_pairs_frame(ok).collect()}
    assert got == {10: 1.0, 11: 1.0}

    ragged = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [0, 1],
                "vec_id": [10, 11],
                "qv": [[1.0, 0.0], [0.0, 2.0, 0.0, 1.0]],  # 2+4 rows, dim looks like 2
                "cv": [[1.0, 0.0], [0.0, 1.0, 0.0, 5.0]],
                "qn": [1.0, 2.0],
                "cn": [1.0, 1.0],
            }
        ).astype({"query_id": "int64"})
    )
    with pytest.raises(Exception):  # Spark surfaces the executor-side shape error
        sim._cosine_pairs_frame(ragged.coalesce(1)).collect()


def test_ivf_train_deterministic(spark, emb):
    c1 = sim.ivf_train(emb, n_centroids=8, iters=2, seed=7)
    c2 = sim.ivf_train(emb.repartition(13), n_centroids=8, iters=2, seed=7)
    assert np.allclose(c1, c2)


def test_ivf_recall_and_exact_degeneration(spark, emb):
    cents = sim.ivf_train(emb, n_centroids=8, iters=3, seed=7)
    index = sim.ivf_index(emb, cents).persist()
    q = emb.where(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(emb, q, k=10)
    ann = sim.ivf_topk(spark, index, cents, q, k=10, nprobe=2)
    r = sim.recall_at_k(ann, exact, 10)
    assert r >= 0.9, f"recall@10 too low: {r}"
    # probing every list == exact search
    full = sim.ivf_topk(spark, index, cents, q, k=10, nprobe=8)
    a = [(x.query_id, x.rank, x.vec_id) for x in full.collect()]
    b = [(x.query_id, x.rank, x.vec_id) for x in exact.collect()]
    assert a == b


def test_ivf_distributed_probe_identical_to_driver_path(spark):
    """collect_queries=False (distributed probe assignment) returns
    exactly the rows of the driver-side path, full and partial probe."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.ivf_train(emb, n_centroids=8, iters=2, seed=7)
    index = sim.ivf_index(emb, cents)
    q = emb.where("vec_id < 12").selectExpr("vec_id AS query_id", "embedding")
    for nprobe in (8, 2):
        a = sim.ivf_topk(spark, index, cents, q, k=10, nprobe=nprobe)
        b = sim.ivf_topk(
            spark, index, cents, q, k=10, nprobe=nprobe, collect_queries=False
        )
        assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_ivf_corpus_self_search_stays_distributed(spark):
    """The ann_topk no-query_ids path at engine level: corpus x corpus
    self-search with collect_queries=False must keep the query side
    distributed (the executed plan's join inputs are both parquet
    scans + MapInArrow — no LocalTableScan / Scan ExistingRDD from a
    driver-collected probe table), and with a full probe it equals
    brute force row for row."""
    import io
    from contextlib import redirect_stdout

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.ivf_train(emb, n_centroids=8, iters=2, seed=7)
    index = sim.ivf_index(emb, cents)
    self_q = emb.selectExpr("vec_id AS query_id", "embedding")
    out = sim.ivf_topk(spark, index, cents, self_q, k=5, nprobe=8,
                       collect_queries=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "LocalTableScan" not in plan and "Scan ExistingRDD" not in plan
    assert plan.count("Scan parquet") >= 2  # index side AND query side
    exact = sim.brute_force_topk(emb, self_q, k=5, qid_col="query_id",
                                 max_queries=None)
    assert [tuple(r) for r in out.collect()] == [tuple(r) for r in exact.collect()]


def test_brute_force_topk_guards_corpus_sized_query_side(spark):
    """The query side broadcasts, so a corpus-sized query table must
    raise with a pointer to the bucketed paths (VERDICT r3 item 5);
    max_queries=None opts out of the guard."""
    rows = [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="lsh_topk"):
        sim.brute_force_topk(emb, emb, k=3, max_queries=32)
    # under the bound (or opted out) it runs
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert sim.brute_force_topk(emb, q, k=3, max_queries=32).count() == 12
    assert sim.brute_force_topk(emb, q, k=3, max_queries=None).count() == 12


def test_lsh_topk_recall_vs_brute_force(spark):
    """Random-hyperplane LSH with enough tables recovers most of the
    exact top-k; returned scores are true cosines (exact re-rank), so
    every (query, vec) pair the ANN finds must carry the same cosine
    the brute-force path assigns it. Pins the vectorized (posexplode
    of array<long> codes) bucket emission to the pre-vectorized
    semantics."""
    rng = np.random.default_rng(17)
    base = rng.standard_normal((8, 16))
    rows = []
    for i in range(400):
        v = base[i % 8] + 0.15 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(emb, q, k=10)
    ann = sim.lsh_topk(spark, emb, q, k=10, nbits=8, ntables=12, seed=42)
    r = sim.recall_at_k(ann, exact, 10)
    assert r >= 0.85, f"LSH recall@10 too low: {r}"
    ex = {(x.query_id, x.vec_id): x.cosine for x in exact.collect()}
    for row in ann.collect():
        key = (row.query_id, row.vec_id)
        if key in ex:
            assert abs(row.cosine - ex[key]) < 1e-9
    # determinism: same seed, same buckets, same rows
    again = sim.lsh_topk(spark, emb, q, k=10, nbits=8, ntables=12, seed=42)
    assert sorted(map(tuple, ann.collect())) == sorted(map(tuple, again.collect()))


def test_lsh_topk_sparse_partitions(spark):
    """The Arrow bucketizer must survive empty input batches: a
    3-vector corpus spread over 16 partitions leaves most mapInArrow
    batches empty, and the result still matches brute force exactly
    (3 vectors -> every bucket join is also the exact candidate set)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"vec_id": [0, 1, 2], "embedding": [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]}
    )
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<double>").repartition(16)
    q = emb.where("vec_id = 0")
    ann = sim.lsh_topk(spark, emb, q, k=3, nbits=4, ntables=16, seed=1,
                       qid_col="vec_id").toPandas()
    exact = sim.brute_force_topk(emb, q, k=3, qid_col="vec_id").toPandas()
    got = ann.merge(exact, on=["query_id", "vec_id", "cosine"])
    # with 16 tables on 3 vectors the union of buckets is the full set
    assert len(exact) == 3 and len(got) == len(ann) == 3


def test_brute_force_topk_rejects_dim_mismatch(spark):
    """Corpus and query embeddings of different dimensionality must
    fail loudly — uniform rows of the WRONG length pass the ragged
    offsets check and would otherwise score only the overlapping
    prefix into plausible-but-wrong cosines (round-6 review)."""
    corpus = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(8)], "vec_id long, embedding array<double>"
    )
    q = spark.createDataFrame(
        [(0, [1.0, 2.0])], "query_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dimensionality|shape"):
        sim.brute_force_topk(corpus, q, k=2).collect()


def test_brute_force_topk_keeps_narrow_id_types(spark):
    """int32 query ids must survive the broadcast round-trip: the
    query side is collected via toArrow (type-faithful), so the
    emitted batches match the declared mapInArrow schema."""
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)], "vec_id long, embedding array<double>"
    )
    q = spark.range(2).selectExpr(
        "CAST(id AS INT) AS query_id", "array(CAST(id AS DOUBLE), 1.0D) AS embedding"
    )
    out = sim.brute_force_topk(corpus, q, k=3)
    assert out.schema["query_id"].dataType.simpleString() == "int"
    assert out.count() == 6


def test_lsh_portable_matches_numpy_reference(spark):
    """lsh_topk(portable=True) vs a from-first-principles NumPy
    reference of the whole pipeline: integer planes, quantized int64
    bucket codes, (table, code) candidate collisions, exact cosine
    re-rank — the same arithmetic the lsh_portable DuckDB oracle runs
    in SQL."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nt, nb = 4, 8
    out = sim.lsh_topk(spark, emb, q, k=5, nbits=nb, ntables=nt, portable=True)
    got = [(r.query_id, r.rank, r.vec_id, r.cosine) for r in out.collect()]

    pdf = emb.toPandas().sort_values("vec_id")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    dim = V.shape[1]
    P = sim._portable_planes(dim, nb, nt)
    Vq = np.floor(V * 1000.0 + 0.5).astype(np.int64)
    dots = np.einsum("tbd,nd->ntb", P, Vq)
    codes = ((dots > 0) * (1 << np.arange(nb, dtype=np.int64))).sum(axis=2)
    norm = np.sqrt((V * V).sum(axis=1))
    exp = []
    for qi in np.flatnonzero(ids < 4):
        cand = set()
        for t in range(nt):
            cand.update(np.flatnonzero(codes[:, t] == codes[qi, t]).tolist())
        # sequential per-dimension fold, matching the Arrow scorer
        scored = []
        for ci in sorted(cand):
            acc = 0.0
            for d in range(dim):
                acc += V[ci, d] * V[qi, d]
            scored.append((acc / (norm[ci] * norm[qi]), int(ids[ci])))
        ranked = sorted(scored, key=lambda cv: (-cv[0], cv[1]))[:5]
        for r, (cos, v) in enumerate(ranked, 1):
            exp.append((int(ids[qi]), r, v, round(cos, 6)))
    assert got == sorted(exp, key=lambda x: (x[0], x[1]))


def test_ivf_portable_matches_numpy_reference(spark):
    """ivf_index/ivf_topk(quantize=True) vs a from-first-principles
    NumPy reference: integer centroids (quantized first-C corpus
    vectors), exact-integer assignment + probe scoring with
    lowest-cid ties, candidates from probed lists, exact cosine
    re-rank — the arithmetic the ivf_portable DuckDB oracle runs."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    C, nprobe, k = 8, 3, 5
    cpdf = emb.where(F.col("vec_id") < C).orderBy("vec_id").toPandas()
    cents = np.floor(
        np.stack([np.asarray(v, dtype=np.float64) for v in cpdf.embedding]) * 1000.0
        + 0.5
    ).astype(np.int64)
    index = sim.ivf_index(emb, cents, quantize=True)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.ivf_topk(spark, index, cents, q, k=k, nprobe=nprobe, quantize=True)
    got = [(r.query_id, r.rank, r.vec_id, r.cosine) for r in out.collect()]

    pdf = emb.toPandas().sort_values("vec_id")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    Vq = np.floor(V * 1000.0 + 0.5).astype(np.int64)
    cnorm = np.sqrt((cents.astype(np.float64) ** 2).sum(axis=1))
    scores = (Vq @ cents.T).astype(np.float64) / cnorm[None, :]
    cid = scores.argmax(axis=1)
    norm = np.sqrt((V * V).sum(axis=1))
    exp = []
    for qi in np.flatnonzero(ids < 4):
        order = np.argsort(-scores[qi], kind="stable")[:nprobe]
        probed = set(int(c) for c in order)
        scored = []
        for ci in range(len(ids)):
            if int(cid[ci]) not in probed:
                continue
            acc = 0.0
            for d in range(V.shape[1]):
                acc += V[ci, d] * V[qi, d]
            scored.append((acc / (norm[ci] * norm[qi]), int(ids[ci])))
        ranked = sorted(scored, key=lambda cv: (-cv[0], cv[1]))[:k]
        for r, (cos, v) in enumerate(ranked, 1):
            exp.append((int(ids[qi]), r, v, round(cos, 6)))
    assert got == sorted(exp, key=lambda x: (x[0], x[1]))


def test_ivf_topk_corpus_sized_queries_auto_dispatch(spark):
    """ivf_topk(collect_queries=True) must NEVER fully collect a query
    frame past max_queries (the silent-OOM edge the knn_join /
    brute_force_topk guards already close): the probe is the bounded
    limit(max_queries+1).toPandas() collect the path needs anyway, and
    on overflow the call routes to the distributed probe, returning
    rows identical to calling it directly. The trap asserts the
    caller's unbounded frame never reaches toPandas()."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.ivf_train(emb, n_centroids=8, iters=2, seed=7)
    index = sim.ivf_index(emb, cents)
    q = emb.where("vec_id < 40").selectExpr("vec_id AS query_id", "embedding")

    def _boom(*a, **k):  # instance-level trap: dispatch must not collect
        raise AssertionError("corpus-sized query frame reached toPandas()")

    q.toPandas = _boom
    got = sim.ivf_topk(spark, index, cents, q, k=5, nprobe=4, max_queries=16)
    exp = sim.ivf_topk(
        spark, index, cents,
        emb.where("vec_id < 40").selectExpr("vec_id AS query_id", "embedding"),
        k=5, nprobe=4, collect_queries=False,
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in exp.collect()]
