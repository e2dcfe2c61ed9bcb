"""Per-row random masking over array columns (SURVEY.md §2.5 W4).

Re-expresses the reference's MAE-style masking
(models/prithvi_eo_v2.py:317-348 ``random_masking``: per-sample
argsort of noise keeps the first ``len_keep`` tokens in shuffle
order, the binary mask and ``ids_restore`` recover original order)
as a vectorized ``mapInPandas`` kernel over an array column — one
NumPy argsort per Arrow batch, no shuffle, no per-row Python.

Determinism: instead of ``torch.rand`` global state, noise is a
counter-based integer hash of (row id, position) shared bit-exactly
with the SQL oracle in ``__spark_entry__`` (``mask_topk``), so the
kept set is identical at any partitioning and recomputable by DuckDB.

Scale: the kernel is a narrow map over the corpus — each batch stacks
its equal-length rows into one [n, L] matrix and does a single
vectorized ``argsort`` (ragged batches fall back to per-length
groups). At 10^12 rows this stays embarrassingly parallel: no state,
no driver traffic, output bounded by len_keep per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# multiplicative hash constants shared with the mask_topk SQL oracle
NOISE_A = 2654435761
NOISE_B = 40503
NOISE_MOD = 1 << 32
# the id is reduced mod 2^31 BEFORE the multiply: (2^31 - 1) * A +
# pos * B < 2^63, so the product can never overflow int64 — NumPy's
# silent wraparound and SQL's negative-dividend % would otherwise
# diverge for ids above ~3.5e9 (corpus-scale ids)
NOISE_ID_MOD = 1 << 31


def noise_matrix(ids: np.ndarray, length: int) -> np.ndarray:
    """Deterministic per-(id, pos) noise, identical to the SQL
    ``((id % 2^31) * A + (pos+1) * B) % MOD`` expression (pos 0-based
    here, 1-based in the hash — matching the oracle's 1-based unnest).
    All intermediates fit int64 for ANY int64 id, so the kernel and
    the DuckDB/Spark oracle stay bit-exact at corpus scale."""
    pos = np.arange(1, length + 1, dtype=np.int64)
    ids_r = ids.astype(np.int64) % NOISE_ID_MOD  # non-negative, < 2^31
    return (ids_r[:, None] * NOISE_A + pos[None, :] * NOISE_B) % NOISE_MOD


def random_mask(
    df: DataFrame,
    arr_col: str = "embedding",
    id_col: str = "vec_id",
    len_keep: int | None = None,
    mask_ratio: float | None = None,
) -> DataFrame:
    """W4 random-mask: per row keep ``len_keep`` elements of
    ``arr_col`` chosen by argsort of deterministic noise.

    Output per row (id preserved):
      - ``kept_pos``  array<long>  0-based positions kept, in shuffle
        (ascending-noise) order — the reference's ``ids_keep``;
      - ``kept_val``  array<double> values gathered at ``kept_pos``
        (``sequence_unmasked``);
      - ``mask``      array<int>   0 = keep / 1 = remove, in ORIGINAL
        order (the unshuffled binary mask);
      - ``ids_restore`` array<long> inverse permutation of the noise
        argsort (gather by it to undo the shuffle).

    Exactly one of ``len_keep`` / ``mask_ratio`` must be given
    (``mask_ratio`` maps to ``len_keep = int(L * (1 - ratio))`` like
    the reference). ``id_col`` must be integral — it seeds the noise
    hash; hash non-integer ids to a long first (e.g. xxhash64).
    """
    if (len_keep is None) == (mask_ratio is None):
        raise ValueError("give exactly one of len_keep / mask_ratio")
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("int", "bigint", "smallint", "tinyint"):
        raise ValueError(
            f"id_col '{id_col}' must be integral (got {id_type}); "
            "hash string ids to a long first (xxhash64)"
        )

    out_schema = (
        f"{id_col} {id_type}, kept_pos array<bigint>, kept_val array<double>, "
        "mask array<int>, ids_restore array<bigint>"
    )
    keep_fixed = len_keep
    ratio = mask_ratio

    def _mask_block(ids: np.ndarray, vals: np.ndarray) -> dict:
        n, length = vals.shape
        k = keep_fixed if keep_fixed is not None else int(length * (1.0 - ratio))
        k = max(0, min(k, length))
        noise = noise_matrix(ids, length)
        # stable sort -> ties broken by position, same as the oracle's
        # ORDER BY noise, pos window
        order = np.argsort(noise, axis=1, kind="stable")
        restore = np.argsort(order, axis=1, kind="stable")
        keep = order[:, :k]
        kept_val = np.take_along_axis(vals, keep, axis=1)
        mask = np.ones((n, length), dtype=np.int32)
        np.put_along_axis(mask, keep, 0, axis=1)
        return {
            "kept_pos": list(keep.astype(np.int64)),
            "kept_val": list(kept_val.astype(np.float64)),
            "mask": list(mask),
            "ids_restore": list(restore.astype(np.int64)),
        }

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_all = pdf[id_col].to_numpy(dtype=np.int64)
            lens = np.fromiter((len(v) for v in pdf[arr_col]), dtype=np.int64, count=len(pdf))
            out = {
                id_col: pdf[id_col],
                "kept_pos": [None] * len(pdf),
                "kept_val": [None] * len(pdf),
                "mask": [None] * len(pdf),
                "ids_restore": [None] * len(pdf),
            }
            # one vectorized argsort per distinct length (batches are
            # uniform-length in practice -> a single [n, L] stack)
            for length in np.unique(lens):
                idx = np.nonzero(lens == length)[0]
                vals = np.stack(
                    [np.asarray(pdf[arr_col].iloc[i], dtype=np.float64) for i in idx]
                )
                block = _mask_block(ids_all[idx], vals)
                for col in ("kept_pos", "kept_val", "mask", "ids_restore"):
                    for j, i in enumerate(idx):
                        out[col][i] = block[col][j]
            yield pd.DataFrame(out)

    return df.select(id_col, arr_col).mapInPandas(fn, schema=out_schema)
