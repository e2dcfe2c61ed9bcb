"""Batch (vectorized) MinHash/SimHash kernels must be value-identical
to the scalar reference implementations (dedup.minhash_signature /
dedup.simhash64)."""

from __future__ import annotations

import numpy as np
import pytest

from gelos_spark.operators import dedup

CASES = [
    "",
    "a",
    "tiny",
    "exact",
    "hello world hello world",
    "the quick brown fox jumps over the lazy dog " * 8,
    "naïve café über straße — unicode ¡señor! " * 3,
    "word",
    "  leading and   trailing   whitespace  ",
    "x" * 4,
    "y" * 5,
    "z" * 6,
]


def test_minhash_batch_matches_scalar():
    got = dedup.minhash_batch(CASES, num_hashes=32, k=5, seed=42)
    for i, t in enumerate(CASES):
        want = dedup.minhash_signature(t, 32, 5, 42).astype(np.int64)
        assert (got[i] == want).all(), f"minhash mismatch for case {i}: {t!r}"


def test_minhash_batch_other_seed_and_k():
    got = dedup.minhash_batch(CASES, num_hashes=16, k=3, seed=7)
    for i, t in enumerate(CASES):
        want = dedup.minhash_signature(t, 16, 3, 7).astype(np.int64)
        assert (got[i] == want).all()


def test_simhash_batch_matches_scalar():
    got = dedup.simhash_batch(CASES, seed=42)
    for i, t in enumerate(CASES):
        assert got[i] == dedup.simhash64(t, 42), f"simhash mismatch for case {i}: {t!r}"


def test_simhash_batch_random_docs():
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = [
        " ".join(rng.choice(words, size=rng.integers(0, 40)).tolist()) for _ in range(50)
    ]
    got = dedup.simhash_batch(docs, seed=42)
    for i, t in enumerate(docs):
        assert got[i] == dedup.simhash64(t, 42)
