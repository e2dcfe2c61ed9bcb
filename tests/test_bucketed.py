"""Bucketed co-located joins: the plan property (no Exchange on
either side) AND row equality with the plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gelos_spark.functions.cell_udfs import cell_encode_col
from gelos_spark.sources import synth
from gelos_spark.tables import bucketed as bk


@pytest.fixture(scope="module")
def cell_tables(spark):
    tiles = synth.tracker_df(spark, 3000, seed=42).withColumn(
        "cell", cell_encode_col(F.col("lon"), F.col("lat"), 8)
    )
    stats = tiles.groupBy("cell").agg(
        F.count("*").alias("n_tiles"), F.countDistinct("lulc").alias("n_cat")
    )
    bk.write_bucketed(tiles, "bk_tiles", "cell", 8)
    bk.write_bucketed(stats, "bk_stats", "cell", 8)
    yield tiles, stats
    spark.sql("DROP TABLE IF EXISTS bk_tiles")
    spark.sql("DROP TABLE IF EXISTS bk_stats")


def test_colocated_join_has_no_exchange(spark, cell_tables):
    # bucketed joins bypass AQE's coalescing requirement only when
    # Spark trusts the bucket spec; assert the planner used it
    joined = bk.colocated_join(spark, "bk_tiles", "bk_stats", "cell")
    assert not bk.plan_has_exchange(joined)
    # and the join actually produces every tile row
    assert joined.count() == 3000


def test_plain_join_of_same_data_does_exchange(spark, cell_tables):
    """Control: the identical join over the unbucketed frames shuffles
    — proving the no-Exchange plan above is the bucketing, not AQE."""
    tiles, stats = cell_tables
    plain = tiles.join(stats, "cell")
    assert bk.plan_has_exchange(plain)
    assert plain.count() == 3000


def test_colocated_rows_equal_plain_rows(spark, cell_tables):
    tiles, stats = cell_tables
    a = (
        bk.colocated_join(spark, "bk_tiles", "bk_stats", "cell")
        .select("image_id", "cell", "n_tiles", "n_cat")
        .orderBy("image_id")
        .collect()
    )
    b = (
        tiles.join(stats, "cell")
        .select("image_id", "cell", "n_tiles", "n_cat")
        .orderBy("image_id")
        .collect()
    )
    assert a == b


def test_bucketed_join_as_config_pipeline(spark, tmp_path):
    """Engine-surface wiring (VERDICT r3 item 3): a config pipeline
    writes tiles + per-cell stats bucketed on `cell` via the
    write_bucketed op, then the bucketed_join op runs the co-located
    join — asserting (by default, require_no_exchange) a zero-Exchange
    plan — with every stage's rows in the checkpoint lineage."""
    from gelos_spark.plans import config as cfg

    conf = {
        "run_id": "bkt",
        "stages": [
            {"name": "tiles", "op": "synth_tracker", "args": {"n": 1200, "seed": 7}},
            {"name": "cells", "op": "cell_encode", "input": "tiles", "args": {"res": 8}},
            {
                "name": "stats",
                "op": "vector_pyramid",
                "input": "cells",
                "args": {"leaf_res": 8, "min_res": 8},
            },
            {
                "name": "tiles_bk",
                "op": "write_bucketed",
                "input": "cells",
                "args": {"table": "cfg_bk_tiles", "key": "cell", "n_buckets": 8},
            },
            {
                "name": "stats_bk",
                "op": "write_bucketed",
                "input": "stats",
                "args": {"table": "cfg_bk_stats", "key": "cell", "n_buckets": 8},
            },
            {
                "name": "joined",
                "op": "bucketed_join",
                "args": {
                    "left_table": "cfg_bk_tiles",
                    "right_table": "cfg_bk_stats",
                    "key": "cell",
                },
            },
        ],
    }
    try:
        pipe = cfg.build_pipeline(spark, conf, root=str(tmp_path / "run"))
        assert pipe.output("joined").count() == 1200
        done = {
            r.stage: r.rows_out
            for r in pipe.log.lineage("bkt").where("status = 'done'").collect()
        }
        assert done["joined"] == 1200 and done["tiles_bk"] == 1
        # drifted layout (different bucket count) must refuse by default
        from gelos_spark.tables import bucketed as bk

        bk.write_bucketed(
            spark.table("cfg_bk_stats"), "cfg_bk_stats12", "cell", 12
        )
        import pytest as _p

        bad = {
            "run_id": "bkt2",
            "stages": [
                {
                    "name": "joined",
                    "op": "bucketed_join",
                    "args": {
                        "left_table": "cfg_bk_tiles",
                        "right_table": "cfg_bk_stats12",
                        "key": "cell",
                    },
                },
            ],
        }
        with _p.raises(ValueError, match="shuffle Exchange"):
            cfg.build_pipeline(spark, bad, root=str(tmp_path / "run2"))
    finally:
        for t in ("cfg_bk_tiles", "cfg_bk_stats", "cfg_bk_stats12"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
