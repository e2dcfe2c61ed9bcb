"""The reference's SECOND CLI entry point, engine-side: embeddings ->
extraction strategies -> 2-D projection -> coordinate CSV (+memo) ->
category join (SURVEY.md §3.2; reference
gelos/embedding_transformation.py:43-128).

Pipeline stages, Spark-first:
  1. projected parquet scan of the embeddings table (Catalyst prunes
     to the two columns — gelos/embedding_extraction.py:51-52);
  2. config-driven extraction strategy CHAIN (list_slice/flatten
     steps, gelos/embedding_extraction.py:27-36) as one Catalyst
     projection (functions/arrays.py);
  3. distributed PCA moments + seeded driver t-SNE over a
     deterministic hash-ordered sample (gelos/tsne_transform.py:8-11;
     sampling per docs/PRD.md:151-153);
  4. coordinate CSV named ``{model}_{strategy}_tsne_x/_tsne_y``
     (gelos/tsne_transform.py:14-37) doubling as a MEMO: re-running
     with the same out dir loads the CSV and skips the recompute
     (gelos/embedding_transformation.py:85-94);
  5. broadcast join of the coords back to the corpus category column
     (the tracker-align step of gelos/plotting.py:34-35).

Usage:
    python jobs/embedding_projection.py --sf-dir /root/testdata/sf0.001 \
        --out-dir /tmp/proj [--config jobs/embedding_projection.yaml]

Prints ONE JSON line (rows, memo_hit, csv path, wall seconds).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CONF = {
    "model_name": "engine",
    "strategy_name": "full",
    "chunk_width": 8,
    # chained extraction strategies (reference example_config.yaml:66-82)
    "steps": [
        {"start": 0, "stop": 8, "step": 1},
        {"flatten": True},
    ],
    "n_sample": 500,
    "n_iter": 200,
    "perplexity": 30.0,
    "seed": 42,
}


def run(spark, sf_dir: str, out_dir: str, conf: dict | None = None) -> dict:
    from pyspark.sql import functions as F

    from gelos_spark.functions import arrays as ar
    from gelos_spark.operators import projection as prj

    conf = {**DEFAULT_CONF, **(conf or {})}
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nested = ar.chunked_col(F.col("embedding"), int(conf["chunk_width"]))
    extracted = emb.select(
        "vec_id", "label", ar.apply_strategy_chain(nested, conf["steps"]).alias("vec")
    )

    cx, cy = prj.coord_cols(conf["model_name"], conf["strategy_name"])
    csv_path = os.path.join(
        out_dir, f"{conf['model_name']}_{conf['strategy_name']}_tsne.csv"
    )

    def compute():
        return prj.tsne_coords(
            extracted,
            id_col="vec_id",
            vec_col="vec",
            model_name=conf["model_name"],
            strategy=conf["strategy_name"],
            n_sample=int(conf["n_sample"]),
            perplexity=float(conf["perplexity"]),
            n_iter=int(conf["n_iter"]),
            seed=int(conf["seed"]),
        )

    coords, memo_hit = prj.tsne_with_memo(spark, csv_path, compute, id_col="vec_id")

    # plotting.py:34-35 alignment: coords x category, order-preserving
    # broadcast the SMALL side: coords holds <= n_sample rows while the
    # corpus id/label column is corpus-sized — hinting the corpus would
    # ship it to every executor at scale
    final = (
        emb.select("vec_id", "label")
        .join(F.broadcast(coords), "vec_id")
        .select("vec_id", "label", cx, cy)
        .orderBy("vec_id")
    )
    out_path = os.path.join(out_dir, "coords_with_labels.parquet")
    final.write.mode("overwrite").parquet(out_path)
    n = spark.read.parquet(out_path).count()

    # S8 figure sink (gelos/plotting.py:48-58): category-colored
    # scatter rendered by the engine's own PNG writer — driver-side
    # over the small sampled coordinate frame, like the reference
    from gelos_spark.operators import plotting

    fig_path = os.path.join(
        out_dir, plotting.figure_name(conf["model_name"], conf["strategy_name"])
    )
    fig = plotting.scatter_png(final.toPandas(), cx, cy, "label", fig_path)
    return {
        "rows": n,
        "memo_hit": memo_hit,
        "csv": csv_path,
        "coords_cols": [cx, cy],
        "out": out_path,
        "figure": fig["path"],
        "figure_points": fig["n_points"],
        "elapsed_sec": round(time.time() - t0, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--config", default=None, help="YAML overriding DEFAULT_CONF keys")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from gelos_spark.session import get_spark

    conf = None
    if args.config:
        import yaml

        with open(args.config) as f:
            conf = yaml.safe_load(f)
    spark = get_spark("embedding-projection", cpus=args.cpus)
    print(json.dumps(run(spark, args.sf_dir, args.out_dir, conf)))


if __name__ == "__main__":
    main()
