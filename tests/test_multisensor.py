"""Multi-sensor payload contract tests, mirroring the reference's
dataset tests: shape/stacking (tests/test_data.py:236-254), dict vs
channel-concat output (:262-282), band validation errors (:200-209),
repeat tiling (:315-327), and the normalize cascade + untouched-band
bit-identity (gelos/gelosdatamodule.py:68-94, test :291-307)."""

from __future__ import annotations

import numpy as np
import pytest

from gelos_spark.operators import multisensor as ms

SENSORS = {"s1": ["VV", "VH"], "s2l2a": ["B02", "B03", "B04", "B08"]}


def _decode(row):
    return np.frombuffer(row["data"], dtype=np.uint8).reshape(
        row["t"], row["h"], row["w"], row["c"]
    )


def test_band_indices_validation():
    assert ms.band_indices(SENSORS, {"s1": ["VH"]}) == {"s1": [1]}
    assert ms.band_indices(SENSORS, {"s2l2a": ["B08", "B02"]}) == {"s2l2a": [3, 0]}
    with pytest.raises(ValueError, match="unknown sensors"):
        ms.band_indices(SENSORS, {"landsat": ["B1"]})
    with pytest.raises(ValueError, match="unknown band"):
        ms.band_indices(SENSORS, {"s1": ["HH"]})


def test_stack_dict_shapes(spark):
    df = ms.multisensor_df(spark, 6, sensors=SENSORS, t_steps=3, w=8, seed=42)
    out = ms.stack_sensors(df, SENSORS, output="dict").collect()
    by = {(r["image_id"], r["sensor"]): r for r in out}
    assert len(by) == 12  # 6 images x 2 sensors
    r = by[("img00000000", "s2l2a")]
    assert (r["t"], r["h"], r["w"], r["c"]) == (3, 8, 8, 4)
    assert _decode(r).shape == (3, 8, 8, 4)
    r1 = by[("img00000000", "s1")]
    assert (r1["t"], r1["c"]) == (3, 2)


def test_stack_band_subset_and_order(spark):
    df = ms.multisensor_df(spark, 2, sensors=SENSORS, t_steps=2, w=8, seed=42)
    full = {r["image_id"]: _decode(r) for r in ms.stack_sensors(
        df, SENSORS, want={"s2l2a": ["B02", "B03", "B04", "B08"]}, output="dict"
    ).collect()}
    sub = {r["image_id"]: _decode(r) for r in ms.stack_sensors(
        df, SENSORS, want={"s2l2a": ["B08", "B02"]}, output="dict"
    ).collect()}
    for k, s in sub.items():
        assert s.shape[3] == 2
        assert (s[..., 0] == full[k][..., 3]).all()  # B08 first, as requested
        assert (s[..., 1] == full[k][..., 0]).all()  # then B02


def test_stack_concat_is_sorted_sensor_channel_concat(spark):
    df = ms.multisensor_df(spark, 3, sensors=SENSORS, t_steps=2, w=8, seed=42)
    dic = {(r["image_id"], r["sensor"]): _decode(r) for r in ms.stack_sensors(
        df, SENSORS, output="dict"
    ).collect()}
    cat = {r["image_id"]: (r["sensor"], _decode(r)) for r in ms.stack_sensors(
        df, SENSORS, output="concat"
    ).collect()}
    for img, (sensor, st) in cat.items():
        assert sensor == ms.CONCAT_KEY
        assert st.shape[3] == 6  # 2 + 4 channels
        want = np.concatenate([dic[(img, "s1")], dic[(img, "s2l2a")]], axis=3)
        assert (st == want).all()


def test_stack_repeat_t(spark):
    df = ms.multisensor_df(spark, 2, sensors={"s1": ["VV", "VH"]}, t_steps=2, w=8)
    once = {r["image_id"]: _decode(r) for r in ms.stack_sensors(
        df, {"s1": ["VV", "VH"]}, output="dict"
    ).collect()}
    thrice = {r["image_id"]: _decode(r) for r in ms.stack_sensors(
        df, {"s1": ["VV", "VH"]}, output="dict", repeat_t=3
    ).collect()}
    for k, st in thrice.items():
        assert st.shape[0] == 6
        assert (st == np.tile(once[k], (3, 1, 1, 1))).all()


def test_stack_partitioning_invariant(spark):
    a = sorted(
        (r["image_id"], r["sensor"], r["checksum"])
        for r in ms.stack_sensors(
            ms.multisensor_df(spark, 8, sensors=SENSORS, w=8, parts=1), SENSORS
        ).collect()
    )
    b = sorted(
        (r["image_id"], r["sensor"], r["checksum"])
        for r in ms.stack_sensors(
            ms.multisensor_df(spark, 8, sensors=SENSORS, w=8, parts=7), SENSORS
        ).collect()
    )
    assert a == b


def test_normalize_cascade_resolution():
    mu, sd = ms.resolve_norm_cascade(
        ["B02", "B03", "B04"],
        means={"B02": 10.0},
        stds=None,
        class_means={"B02": 99.0, "B03": 20.0},
        class_stds={"B03": 4.0},
    )
    # arg beats class default beats identity, per band
    assert mu.tolist() == [10.0, 20.0, 0.0]
    assert sd.tolist() == [1.0, 4.0, 1.0]
    with pytest.raises(ValueError, match="zero std"):
        ms.resolve_norm_cascade(["a"], None, {"a": 0.0})


def test_normalize_touches_only_configured_bands(spark):
    sensors = {"s2l2a": ["B02", "B03", "B04"]}
    df = ms.multisensor_df(spark, 4, sensors=sensors, t_steps=2, w=8, seed=42)
    stacked = ms.stack_sensors(df, sensors, output="dict").persist()
    raw = {r["image_id"]: _decode(r) for r in stacked.collect()}
    out = ms.normalize_stacks(
        stacked, sensors, means={"B03": 100.0}, stds={"B03": 8.0}
    ).collect()
    for r in out:
        got = np.frombuffer(r["data"], dtype=np.float32).reshape(
            r["t"], r["h"], r["w"], r["c"]
        )
        src = raw[r["image_id"]]
        # untouched bands: BIT-identical to the float32 cast
        assert (got[..., 0] == src[..., 0].astype(np.float32)).all()
        assert (got[..., 2] == src[..., 2].astype(np.float32)).all()
        want = ((src[..., 1].astype(np.float64) - 100.0) / 8.0).astype(np.float32)
        assert (got[..., 1] == want).all()
    stacked.unpersist()


def test_normalize_rejects_unknown_sensor_and_bad_width(spark):
    sensors = {"s1": ["VV", "VH"]}
    df = ms.multisensor_df(spark, 2, sensors=sensors, t_steps=1, w=8)
    stacked = ms.stack_sensors(df, sensors, output="dict")
    with pytest.raises(Exception, match="no band config"):
        ms.normalize_stacks(stacked, {"other": ["a", "b"]}).collect()
    with pytest.raises(Exception, match="channels"):
        ms.normalize_stacks(stacked, {"s1": ["VV"]}).collect()
