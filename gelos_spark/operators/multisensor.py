"""Multi-sensor payload support (SURVEY.md §1.1 sample-dict contract).

Reference parity:
  - per-sensor [T, H, W, C] stacks built from per-timestep frames
    (/root/reference/gelos/gelosdataset.py:136-141 ``np.stack(axis=0)``),
  - band-name -> index projection with subset validation — unknown
    sensor fails the subset assert, unknown band raises via
    ``list.index`` (gelosdataset.py:61-68; tests/test_data.py:200-209),
  - ``repeat_bands`` tiling along T (gelosdataset.py:104-106),
  - output either a dict of per-sensor tensors or a single
    channel-concat tensor (gelosdataset.py:119-127;
    tests/test_data.py:262-282),
  - per-band (x-mu)/sigma normalization with the arg -> class-default
    -> identity cascade (gelos/gelosdatamodule.py:68-94), resolved
    once at plan-build time like the reference's ``__init__``.

Engine shape: payloads are opaque binary frame arrays; ALL pixel work
happens in vectorized ``mapInArrow`` batches (bytes -> NumPy -> bytes,
no per-row Python dispatch beyond the unavoidable variable-size frame
loop, no payload at the driver, no payload in any shuffle).

Frame encoding: C-order uint8 ``[H, W, C]`` per frame (``fmt='raw'``
with an explicit channel count — sensors are not 3-channel RGB);
stacked outputs are C-order ``[T, H, W, C]`` uint8, normalized
outputs C-order float32.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CONCAT_KEY = "__concat__"

STACK_SCHEMA = (
    "image_id string, sensor string, t int, h int, w int, c int, "
    "data binary, checksum double"
)

NORM_SCHEMA = (
    "image_id string, sensor string, t int, h int, w int, c int, "
    "data binary, checksum double"
)


def band_indices(
    all_bands: dict[str, list[str]], want: dict[str, list[str]]
) -> dict[str, list[int]]:
    """Resolve requested band names to per-sensor indices, with the
    reference's validation contract: requested sensors must be a
    subset of known sensors (assert at gelosdataset.py:61-63), and an
    unknown band name raises ValueError (list.index semantics,
    gelosdataset.py:65-68)."""
    unknown = set(want) - set(all_bands)
    if unknown:
        raise ValueError(
            f"unknown sensors {sorted(unknown)}; known: {sorted(all_bands)}"
        )
    out: dict[str, list[int]] = {}
    for sensor, names in want.items():
        known = all_bands[sensor]
        try:
            out[sensor] = [known.index(b) for b in names]
        except ValueError as e:
            raise ValueError(
                f"unknown band in {sensor!r}: {e}; known bands: {known}"
            ) from e
    return out


def _decode_frame(data: bytes, h: int, w: int, c: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, c)


def stack_sensors(
    df: DataFrame,
    all_bands: dict[str, list[str]],
    want: dict[str, list[str]] | None = None,
    output: str = "dict",
    repeat_t: int = 1,
) -> DataFrame:
    """Per-sensor frame lists -> [T, H, W, C_sel] stacks.

    ``df`` columns: image_id string, w int, h int, plus one
    ``{sensor}_frames: array<binary>`` column per sensor in
    ``all_bands`` (each element one raw uint8 [H, W, C_sensor] frame).

    ``want`` selects bands by name per sensor (default: all bands of
    every sensor); validation per ``band_indices``. ``repeat_t`` tiles
    the stack along T (the reference's repeat_bands). ``output``:

      - ``"dict"``: one row per (image, sensor) — the sample-dict
        variant (gelosdataset.py:126-127);
      - ``"concat"``: one row per image with sensors channel-concat
        in sorted sensor-name order (gelosdataset.py:123-125),
        sensor = ``"__concat__"``.

    Output rows carry the re-encoded stack + its shape + a float64
    pixel checksum (sum of all values — order-independent because
    integer-valued)."""
    if output not in ("dict", "concat"):
        raise ValueError(f"output must be 'dict' or 'concat', got {output!r}")
    want = want if want is not None else {s: list(b) for s, b in all_bands.items()}
    idx = band_indices(all_bands, want)
    sensors = sorted(idx)  # deterministic concat/emit order
    n_chan = {s: len(all_bands[s]) for s in sensors}

    def fn(batches):
        for b in batches:
            pdf = b.to_pandas()
            rows = []
            for row in pdf.itertuples():
                h, w = int(row.h), int(row.w)
                stacks = {}
                for s in sensors:
                    frames = getattr(row, f"{s}_frames")
                    sel = idx[s]
                    frs = [
                        _decode_frame(f, h, w, n_chan[s])[:, :, sel] for f in frames
                    ]
                    st = np.stack(frs, axis=0)  # [T, H, W, C_sel]
                    if repeat_t > 1:
                        st = np.tile(st, (repeat_t, 1, 1, 1))
                    stacks[s] = st
                if output == "concat":
                    st = np.concatenate([stacks[s] for s in sensors], axis=3)
                    stacks = {CONCAT_KEY: st}
                for s, st in stacks.items():
                    rows.append(
                        {
                            "image_id": row.image_id,
                            "sensor": s,
                            "t": np.int32(st.shape[0]),
                            "h": np.int32(st.shape[1]),
                            "w": np.int32(st.shape[2]),
                            "c": np.int32(st.shape[3]),
                            "data": st.tobytes(),
                            "checksum": float(st.astype(np.float64).sum()),
                        }
                    )
            if rows:
                yield pa.RecordBatch.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return df.mapInArrow(fn, STACK_SCHEMA)


def resolve_norm_cascade(
    bands: list[str],
    means: dict[str, float] | None,
    stds: dict[str, float] | None,
    class_means: dict[str, float] | None = None,
    class_stds: dict[str, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """The reference's per-band default cascade
    (gelos/gelosdatamodule.py:68-94): explicit arg value -> class
    default -> identity (mean 0.0 / std 1.0), resolved per band name
    once at plan-build time."""
    mu = np.array(
        [(means or {}).get(b, (class_means or {}).get(b, 0.0)) for b in bands],
        dtype=np.float64,
    )
    sd = np.array(
        [(stds or {}).get(b, (class_stds or {}).get(b, 1.0)) for b in bands],
        dtype=np.float64,
    )
    if np.any(sd == 0.0):
        raise ValueError("normalize cascade resolved a zero std")
    return mu, sd


def normalize_stacks(
    stacked: DataFrame,
    bands_by_sensor: dict[str, list[str]],
    means: dict[str, float] | None = None,
    stds: dict[str, float] | None = None,
    class_means: dict[str, float] | None = None,
    class_stds: dict[str, float] | None = None,
) -> DataFrame:
    """Per-band (x - mu) / sigma over ``stack_sensors`` dict-mode rows
    -> float32 stacks. Bands whose cascade resolves to (0, 1) come out
    BIT-identical to the float32 cast of the input (the reference's
    untouched-band contract, tests/test_data.py:291-307)."""
    resolved = {
        s: resolve_norm_cascade(b, means, stds, class_means, class_stds)
        for s, b in bands_by_sensor.items()
    }

    def fn(batches):
        for b in batches:
            pdf = b.to_pandas()
            rows = []
            for row in pdf.itertuples():
                if row.sensor not in resolved:
                    raise ValueError(f"no band config for sensor {row.sensor!r}")
                mu, sd = resolved[row.sensor]
                t, h, w, c = int(row.t), int(row.h), int(row.w), int(row.c)
                if c != len(mu):
                    raise ValueError(
                        f"{row.sensor!r}: stack has {c} channels, config has {len(mu)}"
                    )
                st = np.frombuffer(row.data, dtype=np.uint8).reshape(t, h, w, c)
                out = st.astype(np.float32)
                # touch only bands with a non-identity cascade so the
                # identity path is a bit-exact float32 cast
                hot = np.flatnonzero((mu != 0.0) | (sd != 1.0))
                for ch in hot:
                    out[..., ch] = ((st[..., ch] - mu[ch]) / sd[ch]).astype(np.float32)
                rows.append(
                    {
                        "image_id": row.image_id,
                        "sensor": row.sensor,
                        "t": np.int32(t),
                        "h": np.int32(h),
                        "w": np.int32(w),
                        "c": np.int32(c),
                        "data": out.tobytes(),
                        # fixed C-order accumulation -> deterministic
                        "checksum": float(out.astype(np.float64).sum()),
                    }
                )
            if rows:
                yield pa.RecordBatch.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return stacked.mapInArrow(fn, NORM_SCHEMA)


# ------------------------------------------------- synthetic source


def multisensor_df(
    spark: SparkSession,
    n: int,
    sensors: dict[str, list[str]] | None = None,
    t_steps: int = 3,
    w: int = 16,
    seed: int = 42,
    parts: int | None = None,
) -> DataFrame:
    """Deterministic multi-sensor frame table: one row per image with
    a ``{sensor}_frames`` binary list per sensor; pixel values are a
    pure function of (seed, image index, sensor index, t, position) so
    any partitioning produces identical bytes."""
    sensors = sensors or {"s1": ["VV", "VH"], "s2l2a": ["B02", "B03", "B04", "B08"]}
    names = sorted(sensors)
    parts = parts or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, parts)

    fields = ", ".join(f"{s}_frames array<binary>" for s in names)
    schema = f"image_id string, w int, h int, {fields}"

    def gen(batches):
        for b in batches:
            ids = b.to_pandas()["id"].to_numpy()
            rows = []
            for i in ids:
                rec = {"image_id": f"img{int(i):08d}", "w": np.int32(w), "h": np.int32(w)}
                for si, s in enumerate(names):
                    c = len(sensors[s])
                    frames = []
                    for t in range(t_steps):
                        # counter-based value grid: splitmix-ish mix of
                        # (seed, id, sensor, t) then a position ramp
                        base_v = (seed * 1000003 + int(i) * 7919 + si * 104729 + t * 131) % 251
                        yy, xx = np.mgrid[0:w, 0:w]
                        px = ((base_v + yy * 3 + xx * 5)[:, :, None] + np.arange(c) * 17) % 256
                        frames.append(px.astype(np.uint8).tobytes())
                    rec[f"{s}_frames"] = frames
                rows.append(rec)
            yield pa.RecordBatch.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return base.mapInArrow(gen, schema)


def frame_sample_col(frames: "F.Column | str", stride: int, offset: int = 0) -> F.Column:
    """Temporal frame sampling over a ``{sensor}_frames`` array column:
    keep frames at positions offset, offset+stride, ... — a pure JVM
    array filter (zero Python, stays in whole-stage codegen). The
    multimodal 'frame-sample' operator of the training-data pipeline
    family; compose with ``stack_sensors`` downstream (its T dimension
    follows the sampled length)."""
    if stride <= 0:
        raise ValueError("stride must be positive")
    if offset < 0:
        raise ValueError("offset must be >= 0")
    col = F.col(frames) if isinstance(frames, str) else frames
    return F.filter(
        col, lambda _x, i: (i >= F.lit(offset)) & ((i - F.lit(offset)) % F.lit(stride) == 0)
    )


def frame_sample(df: DataFrame, sensors: list[str], stride: int, offset: int = 0) -> DataFrame:
    """Apply ``frame_sample_col`` to every ``{sensor}_frames`` column."""
    for s in sensors:
        df = df.withColumn(f"{s}_frames", frame_sample_col(f"{s}_frames", stride, offset))
    return df
