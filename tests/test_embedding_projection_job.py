"""End-to-end test of the reference's second CLI entry point analog
(jobs/embedding_projection.py): embeddings -> strategy chain -> t-SNE
-> named coordinate CSV -> label join, with the memo-hit resume
semantics of gelos/embedding_transformation.py:85-94."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def test_projection_job_end_to_end_and_memo(spark, tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs.embedding_projection import run

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "proj")
    conf = {"n_sample": 80, "n_iter": 60}

    r1 = run(spark, sf, out, conf)
    assert r1["memo_hit"] is False
    assert r1["rows"] == 80
    assert os.path.exists(r1["csv"])
    cx, cy = r1["coords_cols"]
    assert (cx, cy) == ("engine_full_tsne_x", "engine_full_tsne_y")

    final = spark.read.parquet(r1["out"]).orderBy("vec_id").toPandas()
    assert list(final.columns) == ["vec_id", "label", cx, cy]
    assert final["vec_id"].is_unique
    assert final[[cx, cy]].notna().all().all()

    # second run: CSV memo hit, t-SNE recompute skipped, same coords
    r2 = run(spark, sf, out, conf)
    assert r2["memo_hit"] is True
    final2 = spark.read.parquet(r2["out"]).orderBy("vec_id").toPandas()
    assert np.allclose(
        final[[cx, cy]].to_numpy(), final2[[cx, cy]].to_numpy(), atol=1e-12
    )

    # the memo is the authority: coords survive a round-trip through
    # the CSV (value-stable %.17g), reference tsne CSV contract
    csv = pd.read_csv(r1["csv"])
    assert list(csv.columns) == ["vec_id", cx, cy]
    assert len(csv) == 80
