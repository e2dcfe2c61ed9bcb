"""Figure sink (SURVEY §2.1 S8): from-scratch scatter PNG — decodes
through the engine's own codec, category colors deterministic, same
input -> byte-identical artifact."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gelos_spark.functions import codec
from gelos_spark.operators import plotting


def _coords(n=120, seed=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "vec_id": range(n),
            "x": rng.standard_normal(n),
            "y": rng.standard_normal(n),
            "label": [f"c{i % 3}" for i in range(n)],
        }
    )


def test_scatter_png_roundtrip(tmp_path):
    pdf = _coords()
    path = str(tmp_path / "fig.png")
    meta = plotting.scatter_png(pdf, "x", "y", "label", path, size=200, point=3)
    assert meta["n_points"] == 120
    img = codec.decode(open(path, "rb").read(), "png", 200, 200)
    assert img.shape == (200, 200, 3)
    # every painted pixel is either background white or a palette color
    palette = {(255, 255, 255), *meta["colors"].values()}
    seen = {tuple(px) for px in img.reshape(-1, 3)}
    assert seen <= palette
    assert len(seen) == 4  # white + one color per category
    # non-trivial coverage
    assert (img != 255).any(axis=2).sum() >= 120


def test_scatter_png_deterministic(tmp_path):
    pdf = _coords()
    a, b = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    plotting.scatter_png(pdf, "x", "y", "label", a)
    plotting.scatter_png(pdf, "x", "y", "label", b)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_category_colors_stable():
    c1 = plotting.category_colors(["b", "a", "c", "a"])
    c2 = plotting.category_colors(["c", "b", "a"])
    assert c1 == c2
    assert len(set(c1.values())) == 3


def test_figure_name_contract():
    assert (
        plotting.figure_name("Prithvi EO-V2", "cls token")
        == "prithvi_eo_v2_cls_token_tsne.png"
    )


def test_empty_coords(tmp_path):
    pdf = _coords(0)
    path = str(tmp_path / "empty.png")
    meta = plotting.scatter_png(pdf, "x", "y", "label", path, size=64)
    assert meta["n_points"] == 0
    img = codec.decode(open(path, "rb").read(), "png", 64, 64)
    assert (img == 255).all()
