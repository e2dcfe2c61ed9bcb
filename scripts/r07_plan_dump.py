"""Dump `.explain("formatted")` for the round-7-touched query paths.

Usage: python scripts/r07_plan_dump.py <outdir> <suffix>
Run from a tree root (uses that tree's gelos_spark + __spark_entry__);
writes <outdir>/<name>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F

import __spark_entry__ as entry
from gelos_spark.session import get_spark
from gelos_spark.operators import dedup
from gelos_spark.operators.knn_join import knn_join

OUT = sys.argv[1]
SUF = sys.argv[2]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dump(name, df):
    p = os.path.join(OUT, f"{name}_{SUF}.txt")
    with open(p, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
    print("wrote", p)


def main():
    spark = get_spark("plan-dump", cpus=32)
    read = lambda n: spark.read.parquet(f"{SF}/{n}.parquet")
    documents = read("documents")
    customer = read("customer")
    docs_tbl = documents.select("doc_id", "text")

    # hamming banded pairs (simhash corpus -> pairs), the q_dedup_cc front half
    dump("simhash_pairs", dedup.simhash_pairs(docs_tbl, max_hamming=6, checkpoint=False))

    # connected components over a fixed pair table (lazy: checkpoint=False)
    prs = dedup.simhash_pairs(docs_tbl, max_hamming=6)
    dump("near_dup_components", dedup.connected_components(prs, checkpoint=False))

    # one star-contraction ROUND (the part the loop repeats — the
    # final connected_components plan only shows the post-convergence
    # scan of checkpointed edges, so the round body is explained
    # separately, matching whichever implementation this tree has)
    import inspect

    from pyspark.sql import Window

    edges = (
        prs.select(
            F.greatest("id_a", "id_b").alias("u"), F.least("id_a", "id_b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint()
    )
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if "withColumn(\"m\"" in inspect.getsource(dedup.connected_components):
        wu = Window.partitionBy("u")
        large = (
            sym.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        j = large.withColumn("m", F.min("v").over(wu))
        nxt = (
            j.select(F.col("v").alias("u"), F.col("m").alias("v")).where(
                F.col("u") != F.col("v")
            )
            .union(j.select("u", F.col("m").alias("v")))
            .dropDuplicates(["u", "v"])
        )
    else:
        m = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("mn", "u").alias("m")
        )
        large = (
            sym.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .dropDuplicates(["u", "v"])
        )
        m2 = large.groupBy("u").agg(F.min("v").alias("m"))
        j = large.join(m2, "u")
        nxt = (
            j.select(F.col("v").alias("u"), F.col("m").alias("v")).where(
                F.col("u") != F.col("v")
            )
            .union(j.select("u", F.col("m").alias("v")))
            .dropDuplicates(["u", "v"])
        )
    dump("cc_round", nxt)

    # knn brute path as the bench runs it
    cust_pts = entry._points_df(customer, "c_custkey")
    qdf = spark.createDataFrame(
        [(i, -55.0 + i * 1.7, -45.0 + i * 1.4, 10) for i in range(64)],
        "query_id long, lon double, lat double, k int",
    )
    dump("knn_join", knn_join(spark, cust_pts, qdf, n_tiles_hint=15000, checkpoint=False))

    # minhash pairs (join-strategy change via session conf)
    dump(
        "minhash_pairs",
        dedup.minhash_lsh_pairs(
            documents, num_hashes=64, bands=16, min_jaccard=0.2, checkpoint=False
        ),
    )

    # phash banded join over the synthesized (id, phash) table
    from gelos_spark.operators import images as imops
    from gelos_spark.sources import synth

    imgs = synth.images_df(spark, 4096, w=32, seed=42, parts=32)
    near = imops.perturb_bands(imgs, bands=(2,), alpha=0.1, seed=3).select(
        F.concat(F.col("image_id"), F.lit("_p")).alias("image_id"), "phash"
    )
    both = imgs.select("image_id", "phash").unionByName(near)
    dump("phash_pairs", dedup.phash_dup_pairs(both, max_hamming=6))


if __name__ == "__main__":
    main()
