"""Pluggable model-inference stage (operators/model.py).

Oracle: the stand-in models are seeded integer networks over integer
channel-sum features, so every embedding value is recomputable exactly
with NumPy from the decoded stack payloads — and the whole chain
(stack -> normalize -> embed) is deterministic at any partitioning.
"""

from __future__ import annotations

import numpy as np
import pytest

from gelos_spark.operators import model as mdl
from gelos_spark.operators import multisensor as ms

BANDS = {"s1": ["VV", "VH"], "s2l2a": ["B02", "B03", "B04", "B08"]}
SEL = {"s1": ["VV", "VH"], "s2l2a": ["B03", "B08"]}


def _stacked(spark, n=24):
    df = ms.multisensor_df(spark, n, sensors=BANDS, t_steps=2, w=8, seed=42)
    return ms.stack_sensors(df, BANDS, want=SEL)


def _expected(spark, stacked, model_name, model_args, dtype=np.uint8):
    build, apply_fn = mdl._MODELS[model_name]
    wts = build(model_args)
    out = {}
    for r in stacked.collect():
        st = np.frombuffer(r.data, dtype=dtype).reshape(r.t, r.h, r.w, r.c)
        feats = st.astype(np.float64).sum(axis=(0, 1, 2))
        out[(r.image_id, r.sensor)] = apply_fn(wts, feats[None, :])[0]
    return out


@pytest.mark.parametrize("model_name", ["linear_seeded", "mlp_seeded"])
def test_embeddings_exact_vs_numpy(spark, model_name):
    stacked = _stacked(spark)
    args = {"d_in": 2, "d_out": 5, "seed": 7}
    exp = _expected(spark, stacked, model_name, args)
    got = mdl.embed_stacks(stacked, model_name, args, dtype="uint8").collect()
    assert len(got) == len(exp)
    for r in got:
        e = exp[(r.image_id, r.sensor)]
        assert r.d == 5
        # integer-exact math: equality, not allclose
        assert list(r.embedding) == list(e)
        assert r.checksum == float(e.sum())


def test_partition_layout_invariant(spark):
    args = {"d_in": 2, "d_out": 4, "seed": 3}
    a = mdl.embed_stacks(_stacked(spark).repartition(1), "linear_seeded", args, dtype="uint8")
    b = mdl.embed_stacks(_stacked(spark).repartition(6), "linear_seeded", args, dtype="uint8")
    ca = sorted((r.image_id, r.sensor, tuple(r.embedding)) for r in a.collect())
    cb = sorted((r.image_id, r.sensor, tuple(r.embedding)) for r in b.collect())
    assert ca == cb


def test_float32_normalized_path(spark):
    stacked = _stacked(spark, n=12)
    norm = ms.normalize_stacks(stacked, SEL, means={"B03": 100.0}, stds={"B03": 8.0})
    args = {"d_in": 2, "d_out": 3, "seed": 1}
    exp = _expected(spark, norm, "linear_seeded", args, dtype=np.float32)
    got = mdl.embed_stacks(norm, "linear_seeded", args, dtype="float32").collect()
    for r in got:
        e = exp[(r.image_id, r.sensor)]
        assert np.allclose(np.asarray(r.embedding), e, rtol=0, atol=0)


def test_registry_and_validation(spark):
    stacked = _stacked(spark, n=4)
    assert "linear_seeded" in mdl.registered_models()
    assert "mlp_seeded" in mdl.registered_models()
    with pytest.raises(ValueError, match="unknown model"):
        mdl.embed_stacks(stacked, "prithvi_600m", {"d_in": 2})
    with pytest.raises(ValueError, match="dtype"):
        mdl.embed_stacks(stacked, "linear_seeded", {"d_in": 2}, dtype="float16")


def test_weights_deterministic():
    a = mdl._seeded_matrix(42, 4, 6, 1)
    b = mdl._seeded_matrix(42, 4, 6, 1)
    c = mdl._seeded_matrix(43, 4, 6, 1)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.min() >= -20 and a.max() <= 20


def test_mlp_is_nonlinear():
    build, apply_fn = mdl._MODELS["mlp_seeded"]
    wts = build({"d_in": 3, "hidden": 5, "d_out": 2, "seed": 9})
    # relu is positively homogeneous (f(2x) == 2 f(x) always), so
    # nonlinearity shows up as non-additivity: f(x+y) != f(x) + f(y)
    x = np.array([[1.0, 2.0, 3.0]])
    y = np.array([[-3.0, 1.0, -2.0]])
    assert not np.allclose(
        apply_fn(wts, x + y), apply_fn(wts, x) + apply_fn(wts, y)
    )
