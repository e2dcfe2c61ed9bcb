"""Image-payload operators over the ``images`` base table
(SURVEY.md §2.1 S2 raster scan+decode, §2.4 A5 masked-MSE/PSNR kernel,
§2.7 F6 seeded Gaussian band perturbation; reference per-row pipeline
gelos/gelosdataset.py:97-134 collapsed into vectorized mapInArrow
stages per SURVEY.md §3.3).

All payload work happens inside ``mapInArrow`` batches: bytes ->
NumPy decode -> per-image kernels -> re-encode/stats, bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Nothing
payload-sized ever reaches the driver; shuffles never carry pixels
(the outputs here are metadata rows or re-encoded payload columns).

Determinism: every stochastic kernel (perturb) draws from a
counter-based Philox generator keyed by (seed, image_id) — identical
output at any batch/partition layout, the property the reference
lacks (gelos/gelosdataset.py:143-151 draws from global state) and the
engine's exact-match/resume contract requires (SURVEY.md §2.7 F6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

from gelos_spark.functions import codec

DECODE_STATS_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_lum double, phash_ok boolean"
)

PSNR_SCHEMA = "image_id string, fmt string, psnr double, pass_40db boolean"

IMAGES_OUT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def _iter_decoded(batch: pa.RecordBatch):
    pdf = batch.to_pandas()
    for row in pdf.itertuples():
        px = codec.decode(row.bytes, row.fmt, int(row.w), int(row.h))
        yield row, px


def decode_stats(images: DataFrame) -> DataFrame:
    """S2 scan+decode as an engine operator: decode every payload,
    emit per-image metadata (mean luminance, recomputed-phash match).
    The per-image loop is batch-level (decode of variable-size
    payloads), all pixel math NumPy."""

    def fn(batches):
        for b in batches:
            rows = []
            for row, px in _iter_decoded(b):
                rows.append(
                    {
                        "image_id": row.image_id,
                        "w": np.int32(row.w),
                        "h": np.int32(row.h),
                        "fmt": row.fmt,
                        "mean_lum": round(float(px.astype(np.float64).mean()), 6),
                        "phash_ok": codec.hamming64(codec.phash64(px), int(row.phash)) <= 2,
                    }
                )
            if rows:
                yield pa.RecordBatch.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return images.mapInArrow(fn, DECODE_STATS_SCHEMA)


def psnr_roundtrip(images: DataFrame, fmt: str = "qdct") -> DataFrame:
    """A5/F9 PSNR kernel as an operator: decode -> re-encode through
    ``fmt`` -> decode -> PSNR against the original. The payload
    invariant (north rule: PSNR >= 40 dB for lossy formats) becomes a
    queryable per-row metric; lossless round-trips report inf (stored
    as 999.0 for finite SQL comparison)."""

    def fn(batches):
        for b in batches:
            rows = []
            for row, px in _iter_decoded(b):
                rt = codec.decode(codec.encode(px, fmt), fmt, int(row.w), int(row.h))
                p = codec.psnr(px, rt)
                p = 999.0 if np.isinf(p) else round(p, 6)
                rows.append(
                    {
                        "image_id": row.image_id,
                        "fmt": fmt,
                        "psnr": p,
                        "pass_40db": bool(p >= 40.0),
                    }
                )
            if rows:
                yield pa.RecordBatch.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return images.mapInArrow(fn, PSNR_SCHEMA)


def _id_counter(image_id: str) -> int:
    """Stable integer per image_id (digits if present, else FNV hash)."""
    digits = "".join(ch for ch in image_id if ch.isdigit())
    if digits:
        return int(digits) & 0x7FFFFFFFFFFFFFFF
    h = 0xCBF29CE484222325
    for c in image_id.encode():
        h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def perturb_bands(
    images: DataFrame, bands: tuple[int, ...] = (0,), alpha: float = 0.3, seed: int = 42
) -> DataFrame:
    """F6 Gaussian band perturbation: for each listed channel,
    blend (1-alpha)*x + alpha*noise with noise ~ N(mean(band),
    std(band)); other channels stay BIT-identical (the reference's
    test contract, gelos tests/test_data.py:291-307). Noise is keyed
    by (seed, image_id) so results are partition-layout-invariant —
    unlike the reference's unseeded draw. Output keeps the images
    schema; perturbed payloads re-encode losslessly (raw) and phash
    is recomputed."""

    def fn(batches):
        for b in batches:
            rows = []
            for row, px in _iter_decoded(b):
                rng = np.random.Generator(
                    np.random.Philox(key=np.uint64(seed) ^ np.uint64(_id_counter(row.image_id)))
                )
                out = px.astype(np.float64)
                for band in bands:
                    ch = out[:, :, band]
                    noise = rng.normal(ch.mean(), ch.std() or 1.0, ch.shape)
                    out[:, :, band] = (1.0 - alpha) * ch + alpha * noise
                out_u8 = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
                # untouched bands must stay bit-identical
                keep = [c for c in range(px.shape[2]) if c not in bands]
                out_u8[:, :, keep] = px[:, :, keep]
                rows.append(
                    {
                        "image_id": row.image_id,
                        "bytes": codec.encode(out_u8, "raw"),
                        "w": np.int32(row.w),
                        "h": np.int32(row.h),
                        "fmt": "raw",
                        "caption": row.caption,
                        "phash": np.int64(codec.phash64(out_u8)),
                    }
                )
            if rows:
                yield pa.RecordBatch.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return images.mapInArrow(fn, IMAGES_OUT_SCHEMA)


def area_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area (mean-pool) resize of an [H, W, C] uint8 image by index
    binning — no scipy/PIL. Each output pixel averages the source
    pixels whose bin maps to it (float64 accumulate, round-half-up),
    the same arithmetic as the pyramid's 2x2 downsample so a 2:1
    area_resize equals pyramid.downsample2x2 exactly."""
    h, w, _ = px.shape
    ybin = (np.arange(h) * out_h) // h
    xbin = (np.arange(w) * out_w) // w
    acc = np.zeros((out_h, out_w, px.shape[2]), dtype=np.float64)
    cnt = np.zeros((out_h, out_w, 1), dtype=np.float64)
    np.add.at(acc, (ybin[:, None], xbin[None, :]), px.astype(np.float64))
    np.add.at(cnt, (ybin[:, None], xbin[None, :]), 1.0)
    return np.floor(acc / cnt + 0.5).astype(np.uint8)


def resize(images: DataFrame, out_w: int, out_h: int, fmt: str = "raw") -> DataFrame:
    """Multimodal resize operator (training-data pipeline family):
    decode -> area mean-pool to (out_h, out_w) -> re-encode. All pixel
    math inside the Arrow batch; output keeps the images schema with
    updated dims and recomputed phash. Deterministic at any
    partitioning (pure per-row function)."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize dims must be positive")

    def fn(batches):
        for b in batches:
            rows = []
            for row, px in _iter_decoded(b):
                out = area_resize(px, out_h, out_w)
                rows.append(
                    {
                        "image_id": row.image_id,
                        "bytes": codec.encode(out, fmt),
                        "w": np.int32(out_w),
                        "h": np.int32(out_h),
                        "fmt": fmt,
                        "caption": row.caption,
                        "phash": np.int64(codec.phash64(out)),
                    }
                )
            if rows:
                yield pa.RecordBatch.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return images.mapInArrow(fn, IMAGES_OUT_SCHEMA)
