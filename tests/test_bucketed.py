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
