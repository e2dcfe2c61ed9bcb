"""PCA / t-SNE projection stage: exact NumPy oracles, partitioning
invariance, determinism, and the reference's CSV-memo resume contract
(gelos/embedding_transformation.py:85-94)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gelos_spark.operators import projection as prj


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 12)) * 5.0
    rows = [
        {
            "vec_id": i,
            "label": i % 4,
            "embedding": (centers[i % 4] + rng.standard_normal(12)).tolist(),
        }
        for i in range(400)
    ]
    return spark.createDataFrame(pd.DataFrame(rows)).persist()


def _collect_matrix(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return pdf["vec_id"].to_numpy(), x


def test_covariance_matches_numpy(spark, emb):
    ids, x = _collect_matrix(emb)
    n, mean, cov = prj.covariance(emb)
    assert n == len(x)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    ref = (x.T @ x) / len(x) - np.outer(x.mean(axis=0), x.mean(axis=0))
    assert np.allclose(cov, ref, atol=1e-9)


def test_covariance_partitioning_invariant(spark, emb):
    _, _, c1 = prj.covariance(emb.coalesce(1))
    _, _, c2 = prj.covariance(emb.repartition(11))
    assert np.allclose(c1, c2, atol=1e-10)


def test_pca_components_and_projection(spark, emb):
    ids, x = _collect_matrix(emb)
    model = prj.pca_train(emb, k=2)
    # reference PCA straight from NumPy on the full matrix
    mean = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    ref = vecs[:, order].T
    for i in range(2):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(model.components, ref, atol=1e-8)
    assert model.explained_var[0] >= model.explained_var[1] > 0

    out = prj.pca_project(emb, model).toPandas()
    want = (x - mean[None, :]) @ model.components.T
    assert np.allclose(out[["pc1", "pc2"]].to_numpy(), want, atol=1e-8)
    # orthonormal axes
    g = model.components @ model.components.T
    assert np.allclose(g, np.eye(2), atol=1e-9)


def test_tsne_deterministic_and_clusters(spark, emb):
    a = prj.tsne_coords(emb, n_sample=200, n_iter=150, model_name="m", strategy="s")
    b = prj.tsne_coords(emb, n_sample=200, n_iter=150, model_name="m", strategy="s")
    assert list(a.columns) == ["vec_id", "m_s_tsne_x", "m_s_tsne_y"]
    assert (a.to_numpy() == b.to_numpy()).all()  # bit-identical, no draws

    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    y = a[["m_s_tsne_x", "m_s_tsne_y"]].to_numpy()
    lab = np.array([labels[i] for i in a["vec_id"]])
    same = lab[:, None] == lab[None, :]
    d = np.sqrt(((y[:, None, :] - y[None, :, :]) ** 2).sum(-1))
    iu = np.triu_indices(len(y), 1)
    intra = d[iu][same[iu]].mean()
    inter = d[iu][~same[iu]].mean()
    assert intra < 0.5 * inter, f"clusters not separated: intra {intra}, inter {inter}"


def test_coord_naming_contract():
    # gelos/tsne_transform.py:22-28 snake-case naming
    assert prj.coord_cols("Prithvi EO-V2", "cls token") == (
        "prithvi_eo_v2_cls_token_tsne_x",
        "prithvi_eo_v2_cls_token_tsne_y",
    )


def test_tsne_memo_skips_recompute(spark, emb, tmp_path):
    csv = str(tmp_path / "coords.csv")
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return prj.tsne_coords(emb, n_sample=60, n_iter=60)

    df1, hit1 = prj.tsne_with_memo(spark, csv, compute)
    df2, hit2 = prj.tsne_with_memo(spark, csv, compute)
    assert (hit1, hit2) == (False, True)
    assert calls["n"] == 1  # memo hit skipped the recompute
    a = df1.orderBy("vec_id").toPandas()
    b = df2.orderBy("vec_id").toPandas()
    assert list(a.columns) == list(b.columns)
    assert np.allclose(
        a[a.columns[1:]].to_numpy(), b[b.columns[1:]].to_numpy(), atol=1e-12
    )
