"""Round-7 optimization instrumentation: per-STAGE isolation of the
expensive bench queries (guide §1.4 noop-sink methodology). NOT the
driver's bench — bench.py stays frozen; this file exists so
OPTIMIZATION_r07.md can cite stage-level numbers.

Usage: python bench_extra.py [stage ...]   (default: all)
Prints one JSON line: {"stages": {name: [cold, warm]}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entry
from gelos_spark.session import get_spark
from gelos_spark.operators.knn_join import knn_join
from gelos_spark.operators.pip_join import pip_join
from gelos_spark.operators.pyramid import vector_pyramid
from gelos_spark.operators import dedup, similarity
from gelos_spark.functions.cell_udfs import cell_encode_col

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    only = set(sys.argv[1:])
    spark = get_spark("gelos-bench-extra", cpus=CPUS)
    sc = spark.sparkContext
    read = lambda n: spark.read.parquet(f"{SF_DIR}/{n}.parquet")
    documents = read("documents")
    embeddings = read("embeddings")
    customer = read("customer")
    lineitem = read("lineitem")
    orders = read("orders")

    # pre-warm python workers like bench.py
    @F.pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, 256, 1, CPUS).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    stages: dict[str, list[float]] = {}

    def run(name, fn, reps=2):
        if only and not any(name.startswith(o) for o in only):
            return
        spark.catalog.clearCache()
        sc._jvm.System.gc()
        sc.setJobDescription(name)
        out = []
        for _ in range(1 + reps):
            t0 = time.time()
            fn()
            out.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        stages[name] = out
        print(f"## {name}: {out}", file=sys.stderr)

    docs_tbl = documents.select("doc_id", "text")

    # ---- q_dedup_cc decomposition -----------------------------------
    run("cc.simhash_sig", lambda: materialize(
        dedup._spread(docs_tbl).select(
            F.col("doc_id").alias("id"), dedup.simhash_udf(42)(F.col("text")).alias("sh")
        )
    ))

    run("cc.simhash_pairs", lambda: materialize(
        dedup.simhash_pairs(docs_tbl, max_hamming=6)
    ))

    prs_fixed = dedup.simhash_pairs(docs_tbl, max_hamming=6)  # checkpointed once
    run("cc.components_only", lambda: materialize(
        dedup.connected_components(prs_fixed)
    ))
    run("cc.dedup_near_total", lambda: materialize(
        dedup.dedup_near(docs_tbl, prs_fixed, keep="canonical")
    ))

    # ---- q_minhash decomposition ------------------------------------
    run("mh.sig", lambda: materialize(
        dedup._spread(documents).select(
            F.col("doc_id").alias("id"),
            dedup.minhash_udf(64, 5, 42)(F.col("text")).alias("sig"),
        )
    ))
    run("mh.total", lambda: materialize(
        dedup.minhash_lsh_pairs(documents, num_hashes=64, bands=16, min_jaccard=0.2)
    ))

    # ---- q_phash_pairs decomposition --------------------------------
    from gelos_spark.operators import images as imops
    from gelos_spark.sources import synth

    run("ph.synth", lambda: materialize(
        synth.images_df(spark, 4096, w=32, seed=42, parts=CPUS)
    ))
    run("ph.synth_perturb", lambda: materialize(
        imops.perturb_bands(
            synth.images_df(spark, 4096, w=32, seed=42, parts=CPUS),
            bands=(2,), alpha=0.1, seed=3,
        ).select("image_id", "phash")
    ))

    def ph_total():
        imgs = synth.images_df(spark, 4096, w=32, seed=42, parts=CPUS)
        near = imops.perturb_bands(imgs, bands=(2,), alpha=0.1, seed=3).select(
            F.concat(F.col("image_id"), F.lit("_p")).alias("image_id"), "phash"
        )
        both = imgs.select("image_id", "phash").unionByName(near)
        materialize(dedup.phash_dup_pairs(both, max_hamming=6))

    run("ph.total", ph_total)

    # banded join alone over a precomputed (id, phash) table
    imgs0 = synth.images_df(spark, 4096, w=32, seed=42, parts=CPUS)
    near0 = imops.perturb_bands(imgs0, bands=(2,), alpha=0.1, seed=3).select(
        F.concat(F.col("image_id"), F.lit("_p")).alias("image_id"), "phash"
    )
    both0 = imgs0.select("image_id", "phash").unionByName(near0).localCheckpoint()
    run("ph.banded_join_only", lambda: materialize(
        dedup.phash_dup_pairs(both0, max_hamming=6)
    ))

    # ---- q_knn decomposition ----------------------------------------
    cust_pts = entry._points_df(customer, "c_custkey")
    qdf = spark.createDataFrame(
        [(i, -55.0 + i * 1.7, -45.0 + i * 1.4, 10) for i in range(64)],
        "query_id long, lon double, lat double, k int",
    )
    n_cust = customer.count()
    run("knn.total", lambda: materialize(
        knn_join(spark, cust_pts, qdf, n_tiles_hint=n_cust)
    ))

    # stats-agg alone (the persist + aggregate knn_join front-loads)
    def knn_stats():
        from gelos_spark.operators.knn_join import default_res
        res = default_res(n_cust)
        tiles_c = (
            cust_pts.select("image_id", "lon", "lat")
            .withColumn("cell", cell_encode_col(F.col("lon"), F.col("lat"), res))
            .persist()
        )
        tiles_c.agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("cell").alias("occ"),
            F.min("lon"), F.max("lon"), F.min("lat"), F.max("lat"),
        ).collect()
        tiles_c.unpersist()

    run("knn.stats_agg", knn_stats)

    # ---- q_pyramid --------------------------------------------------
    li_pts = lineitem.select(
        F.col("l_orderkey").alias("k"),
        entry._coord_col("l_orderkey", entry._LON).alias("lon"),
        entry._coord_col("l_orderkey", entry._LAT).alias("lat"),
        F.col("l_returnflag").alias("cat"),
    )
    run("pyr.total", lambda: materialize(
        vector_pyramid(
            li_pts.withColumn("cell", cell_encode_col(F.col("lon"), F.col("lat"), 8)),
            8, 2, cat_col="cat",
        )
    ))
    run("pyr.pairs_only", lambda: materialize(
        li_pts.withColumn("cell", cell_encode_col(F.col("lon"), F.col("lat"), 8))
        .groupBy("cell", F.col("cat").alias("cat")).agg(F.count("*").alias("n"))
    ))

    # ---- q_embedding_topk / q_ann_self ------------------------------
    q_emb = embeddings.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    run("emb.topk", lambda: materialize(
        similarity.brute_force_topk(embeddings, q_emb, k=10)
    ))

    # ---- flagship ---------------------------------------------------
    tiles = entry._points_df(orders, "o_orderkey")
    flagship = pip_join(spark, tiles, entry.POLYGONS)
    run("pip.flagship", lambda: materialize(flagship))

    print(json.dumps({"stages": stages, "sf": SF_DIR, "cpus": CPUS}))


if __name__ == "__main__":
    main()
