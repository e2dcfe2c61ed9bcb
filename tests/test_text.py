"""Text-analysis column builders vs pure-Python/NumPy references.

The SQL-expressible ones (langid, token_count, quality, md5
fingerprint) are DuckDB-oracle-checked through the driver contract;
``rolling_fingerprint_col`` folds crc32 word hashes (no DuckDB
analog), so its oracle lives here: an exact zlib.crc32 reference.
"""

from __future__ import annotations

import re
import zlib

import pytest

import pandas as pd
from pyspark.sql import functions as F

from gelos_spark.functions import text as tx

MOD = (1 << 61) - 1
BASE = 257


def rolling_ref(text: str, modulus: int = MOD, base: int = 257) -> int:
    """Reference rolling hash: fold h = (h*base + crc32(word)) % p over
    the first 32 lowercased whitespace-split words. The explicit class
    [ \\t\\n\\x0b\\f\\r] is exactly Java's \\s (the engine tokenizer's
    semantics) — unlike Python's Unicode-aware \\s, which would also
    split on \\xa0/\\u2028 and silently diverge; both keep
    leading/trailing empty tokens at limit -1."""
    words = re.split(r"[ \t\n\x0b\f\r]+", (text or "").lower())[:32]
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
    "vertical\x0btab splits in java regex but not re2 \\s",
    "nbsp\xa0and line-sep do NOT split (java \\s is ascii-only)",
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


def test_top_terms_brute_force_and_grouped(spark):
    """top_terms vs a pandas Counter oracle, globally and per group;
    the (n DESC, term ASC) contract makes ranks deterministic."""
    from collections import Counter

    from gelos_spark.functions.text import top_terms

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = top_terms(docs, k=10).collect()
    pdf = docs.select("text").toPandas()
    # explicit class == Java \s (the words() contract), NOT str.split()
    # whose Unicode whitespace rules differ on \xa0 and U+2028
    cnt = Counter(
        w
        for t in pdf.text.fillna("")
        for w in re.split(r"[ \t\n\x0b\f\r]+", t.lower())
        if len(w) >= 1
    )
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.term, r.n) for r in got] == exp
    assert [r.rank for r in got] == list(range(1, len(exp) + 1))

    # grouped: one independent ranking per lang bucket
    docs2 = docs.withColumn("bucket", (F.col("doc_id") % 2).cast("long"))
    grouped = top_terms(docs2, k=3, by="bucket").collect()
    by_bucket = {}
    for r in grouped:
        by_bucket.setdefault(r.bucket, []).append((r.term, r.n, r.rank))
    pdf2 = docs2.select("bucket", "text").toPandas()
    for b, rows in by_bucket.items():
        c = Counter(
            w
            for t in pdf2[pdf2.bucket == b].text.fillna("")
            for w in re.split(r"[ \t\n\x0b\f\r]+", t.lower())
            if len(w) >= 1
        )
        e = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert [(t, n) for t, n, _ in rows] == e
        assert [r for _, _, r in rows] == [1, 2, 3][: len(e)]


def test_tf_idf_brute_force_and_topk(spark):
    """tf_idf vs a pure-Python reference (same explicit Java-\\s
    tokenizer), plus the per-doc top-k rank contract and the lazy
    n_docs passthrough."""
    import math
    from collections import Counter

    from gelos_spark.functions.text import tf_idf

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r.doc_id, r.term): (r.tf, r.df_docs, r.tfidf)
        for r in tf_idf(docs, min_len=2).collect()
    }

    pdf = docs.select("doc_id", "text").toPandas()
    tf = {
        row.doc_id: Counter(
            w
            for w in re.split(r"[ \t\n\x0b\f\r]+", (row.text or "").lower())
            if len(w) >= 2
        )
        for row in pdf.itertuples()
    }
    dfreq = Counter(t for c in tf.values() for t in c)
    n = len(pdf)
    assert len(got) == sum(len(c) for c in tf.values())
    for (d, t), (tfv, dfv, w) in got.items():
        assert tfv == tf[d][t] and dfv == dfreq[t]
        assert w == pytest.approx(
            tfv * (math.log((n + 1.0) / (dfv + 1.0)) + 1.0), abs=1e-9
        )

    # top-k: rank 1..k per doc, ordered by (tfidf DESC, term ASC)
    topk = tf_idf(docs, min_len=2, k=3).collect()
    per_doc = {}
    for r in sorted(topk, key=lambda r: (r.doc_id, r.rank)):
        per_doc.setdefault(r.doc_id, []).append(r)
    for d, rows in per_doc.items():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        full = sorted(
            ((got[(d, t)][2], t) for t in tf[d]),
            key=lambda x: (-x[0], x[1]),
        )[: len(rows)]
        assert [(pytest.approx(w, abs=1e-9), t) for w, t in full] == [
            (r.tfidf, r.term) for r in rows
        ]

    # caller-supplied corpus size keeps the plan lazy and must agree
    lazy = {
        (r.doc_id, r.term): r.tfidf
        for r in tf_idf(docs, min_len=2, n_docs=n).collect()
    }
    assert lazy == {k: v[2] for k, v in got.items()}
