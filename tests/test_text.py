"""Text-analysis column builders vs pure-Python/NumPy references.

The SQL-expressible ones (langid, token_count, quality, md5
fingerprint) are DuckDB-oracle-checked through the driver contract;
``rolling_fingerprint_col`` folds crc32 word hashes (no DuckDB
analog), so its oracle lives here: an exact zlib.crc32 reference.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import functions as F

from gelos_spark.functions import text as tx

MOD = (1 << 61) - 1
BASE = 257


def rolling_ref(text: str, modulus: int = MOD, base: int = 257) -> int:
    """Reference rolling hash: fold h = (h*base + crc32(word)) % p over
    the first 32 lowercased whitespace-split words. re.split(r'\\s+')
    matches Spark split(lower(text), '\\\\s+') token-for-token
    (both keep leading/trailing empty tokens at limit -1)."""
    words = re.split(r"\s+", (text or "").lower())[:32]
    h = 0
    for w in words:
        h = (h * base + zlib.crc32(w.encode("utf-8"))) % modulus
    return h


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",  # case-normalized == above
    "dog lazy the over jumps fox brown quick The",  # same bag, different order
    " leading whitespace token",
    "trailing whitespace token ",
    "",
    "single",
    "unicode façade naïve — ünïcödé tokens",
    " ".join(f"w{i}" for i in range(100)),  # > 32 words: only first 32 count
    " ".join(f"w{i}" for i in range(32)),  # exactly the first-32 prefix
    "tabs\tand\nnewlines   collapse",
]


def test_rolling_fingerprint_matches_crc32_reference(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    got = {
        r["doc_id"]: r["rfp"]
        for r in df.select(
            "doc_id", tx.rolling_fingerprint_col("text").alias("rfp")
        ).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == rolling_ref(t), f"doc {i}: {t!r}"


def test_rolling_fingerprint_is_order_sensitive(spark):
    # same word bag, different order -> different fingerprint (the
    # property that distinguishes it from the md5 bag fingerprint)
    assert rolling_ref(TEXTS[1]) != rolling_ref(TEXTS[2])
    # >32-word doc fingerprints only its first-32-word prefix
    assert rolling_ref(TEXTS[8]) == rolling_ref(" ".join(f"w{i}" for i in range(32)))


def test_rolling_fingerprint_partitioning_invariant(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    a = sorted(
        (r["doc_id"], r["rfp"])
        for r in df.coalesce(1)
        .select("doc_id", tx.rolling_fingerprint_col("text").alias("rfp"))
        .collect()
    )
    b = sorted(
        (r["doc_id"], r["rfp"])
        for r in df.repartition(7)
        .select("doc_id", tx.rolling_fingerprint_col("text").alias("rfp"))
        .collect()
    )
    assert a == b
