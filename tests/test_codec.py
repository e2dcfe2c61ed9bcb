"""Codec round-trip + PSNR invariants (FIXTURES.md §6: decode(encode(x))
allclose for lossless; PSNR >= 40 dB for qdct; matches the reference's
determinism discipline, gelos tests/utils.py:13-55 dummy tiffs)."""

import numpy as np
import pytest

from gelos_spark.functions import codec


def _img(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # palette + gradient structure like the reference's dummy tiffs
    base = rng.choice(np.asarray([0, 32, 96, 160, 255], dtype=np.uint8), size=(h, w, 3))
    grad = (np.linspace(0, 64, w)[None, :, None]).astype(np.uint8)
    return (base // 2 + grad).astype(np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "png"])
def test_lossless_roundtrip(fmt):
    img = _img(1)
    out = codec.decode(codec.encode(img, fmt), fmt, 64, 64)
    np.testing.assert_array_equal(img, out)


def test_qdct_psnr_above_40():
    for seed in range(5):
        img = _img(seed, 96, 96)
        out = codec.decode(codec.encode(img, "qdct"), "qdct", 96, 96)
        assert out.shape == img.shape
        assert codec.psnr(img, out) >= 40.0


def test_qdct_nonsquare_and_pad():
    img = _img(7, 50, 70)  # non-multiple-of-8 dims exercise edge padding
    out = codec.decode(codec.encode(img, "qdct"), "qdct", 70, 50)
    assert out.shape == (50, 70, 3)
    assert codec.psnr(img, out) >= 40.0


def test_encode_deterministic():
    img = _img(3)
    for fmt in codec.FORMATS:
        assert codec.encode(img, fmt) == codec.encode(img, fmt)


def test_phash_properties():
    a = _img(10)
    b = _img(11)
    ha, hb = codec.phash64(a), codec.phash64(b)
    assert isinstance(ha, int) and -(2**63) <= ha < 2**63
    assert ha == codec.phash64(a)  # deterministic
    # near-duplicate (tiny noise) stays close; different image is far
    noisy = np.clip(a.astype(int) + np.random.default_rng(0).integers(-2, 3, a.shape), 0, 255).astype(
        np.uint8
    )
    assert codec.hamming64(ha, codec.phash64(noisy)) <= 10
    assert codec.hamming64(ha, hb) > 10


def test_psnr_identity_inf():
    img = _img(5)
    assert codec.psnr(img, img) == float("inf")
