"""Multimodal resize + frame-sample operators vs NumPy/python oracles."""
from __future__ import annotations

import numpy as np
import pytest

from gelos_spark.functions import codec
from gelos_spark.operators import images as imops
from gelos_spark.operators import multisensor as ms
from gelos_spark.operators.pyramid import downsample2x2
from gelos_spark.sources import synth


def test_resize_matches_numpy_oracle(spark):
    imgs = synth.images_df(spark, 32, w=24, seed=42, parts=4)
    src = {r.image_id: codec.decode(r.bytes, r.fmt, r.w, r.h) for r in imgs.collect()}
    out = imops.resize(imgs, 10, 6).collect()
    assert len(out) == 32
    for r in out:
        exp = imops.area_resize(src[r.image_id], 6, 10)
        got = codec.decode(r.bytes, r.fmt, r.w, r.h)
        assert (got == exp).all()
        assert (r.w, r.h) == (10, 6)
        assert r.phash == codec.phash64(exp)


def test_resize_2to1_equals_pyramid_downsample(spark):
    imgs = synth.images_df(spark, 8, w=16, seed=7, parts=2)
    src = {r.image_id: codec.decode(r.bytes, r.fmt, r.w, r.h) for r in imgs.collect()}
    out = imops.resize(imgs, 8, 8).collect()
    for r in out:
        got = codec.decode(r.bytes, r.fmt, r.w, r.h)
        assert (got == downsample2x2(src[r.image_id])).all()


def test_resize_partition_invariant(spark):
    a = imops.resize(synth.images_df(spark, 16, w=20, seed=3, parts=1), 7, 5)
    b = imops.resize(synth.images_df(spark, 16, w=20, seed=3, parts=8), 7, 5)
    ca = sorted((r.image_id, r.bytes) for r in a.collect())
    cb = sorted((r.image_id, r.bytes) for r in b.collect())
    assert ca == cb


def test_resize_rejects_bad_dims(spark):
    imgs = synth.images_df(spark, 2, w=8, seed=1)
    with pytest.raises(ValueError):
        imops.resize(imgs, 0, 4)


def test_frame_sample_matches_python_slice(spark):
    sensors = {"s1": ["VV", "VH"], "s2l2a": ["B02", "B03"]}
    df = ms.multisensor_df(spark, 12, sensors=sensors, t_steps=7, w=8, seed=42)
    before = {r.image_id: (list(r.s1_frames), list(r.s2l2a_frames)) for r in df.collect()}
    out = ms.frame_sample(df, list(sensors), stride=3, offset=1).collect()
    for r in out:
        b1, b2 = before[r.image_id]
        assert list(r.s1_frames) == b1[1::3]
        assert list(r.s2l2a_frames) == b2[1::3]


def test_frame_sample_feeds_stack(spark):
    sensors = {"s1": ["VV", "VH"]}
    df = ms.multisensor_df(spark, 6, sensors=sensors, t_steps=6, w=8, seed=5)
    sampled = ms.frame_sample(df, ["s1"], stride=2)
    stacked = ms.stack_sensors(sampled, sensors)
    for r in stacked.collect():
        assert r.t == 3  # 6 frames, stride 2


def test_frame_sample_validation():
    import pytest as _p

    with _p.raises(ValueError):
        ms.frame_sample_col("x_frames", 0)
    with _p.raises(ValueError):
        ms.frame_sample_col("x_frames", 2, -1)
