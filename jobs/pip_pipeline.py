"""Flagship end-to-end job: synth tiles -> quadtree cell encode ->
PIP cell-prefix join -> tile assignment, checkpoint-resumable, run
via ``spark-submit --py-files gelos_spark.zip jobs/pip_pipeline.py``.

This is the north rule's measured pipeline; scripts/scaling_bench.py
runs it unchanged at two parallelism levels (local[8] vs local[32] —
the sandbox proxy for N vs 4N executors) and reports tiles/sec +
scaling efficiency into BENCH/BASELINE.md.

Stages (each committed to a SnapshotTable + checkpoint lineage rows;
re-running with the same --run-id skips completed stages):
  tiles   seeded synthetic tracker (counter-based RNG — identical
          bytes at any parallelism)
  cells   res-16 Morton cell id per tile (pure JVM column expression)
  assign  PIP join against the AOI set (broadcast cover + exact
          ray-cast refine), ordered output

Prints ONE JSON line with per-stage seconds + tiles/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow direct `python jobs/pip_pipeline.py`; under spark-submit the
# package arrives via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-tiles", type=int, default=1_000_000)
    ap.add_argument("--aois", type=int, default=64)
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--stop-after", choices=["tiles", "cells", "assign"], default="assign",
                    help="simulate a mid-pipeline crash for resume tests")
    args = ap.parse_args()

    from gelos_spark.operators.pip_join import TILE_RES, pip_join
    from gelos_spark.functions.cell_udfs import cell_encode_col
    from gelos_spark.plans.checkpoint import Pipeline
    from gelos_spark.session import get_spark
    from gelos_spark.sources import synth

    spark = get_spark("pip-pipeline", cpus=args.cpus)
    pipe = Pipeline(spark, args.out, args.run_id)
    aois = synth.aoi_polygons(args.aois, seed=args.seed)

    t0 = time.time()
    stage_s: dict[str, float] = {}

    def timed(name, fn):
        s = time.time()
        out = pipe.stage(name, fn)
        stage_s[name] = round(time.time() - s, 3)
        return out

    tiles = timed("tiles", lambda sp: synth.tracker_df(sp, args.n_tiles, seed=args.seed))
    if args.stop_after == "tiles":
        _finish(args, pipe, stage_s, t0)
        return

    cells = timed(
        "cells",
        lambda sp: pipe.output("tiles").withColumn(
            "cell", cell_encode_col(F.col("lon"), F.col("lat"), TILE_RES)
        ),
    )
    if args.stop_after == "cells":
        _finish(args, pipe, stage_s, t0)
        return

    timed(
        "assign",
        lambda sp: pip_join(sp, pipe.output("cells"), aois, tile_cell_col="cell"),
    )
    _finish(args, pipe, stage_s, t0)


def _finish(args, pipe, stage_s, t0):
    elapsed = time.time() - t0
    assigned = pipe.table("assign").total_rows() if "assign" in stage_s or not pipe.table("assign").is_empty() else 0
    print(
        json.dumps(
            {
                "n_tiles": args.n_tiles,
                "stages": stage_s,
                "skipped": pipe.skipped,
                "executed": pipe.executed,
                "assigned_rows": assigned,
                "elapsed_sec": round(elapsed, 3),
                "tiles_per_sec": round(args.n_tiles / elapsed, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
