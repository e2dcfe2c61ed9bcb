"""Range (interval) join — the second join shape Spark's syntax
lacks (with as-of, operators/asof.py): every event row matched to
every interval containing it, ``start <= on < end`` (half-open),
optionally under an equality key. Classic uses: incident-window /
maintenance-window attribution, ad-flight assignment, joining points
to validity periods of slowly-changing dimensions.

Spark-first plan — NEVER the naive inequality join, which Catalyst
can only execute as a (broadcast) nested-loop over events x
intervals:

  1. pick a bucket width ``b`` (default: the max interval length,
     one tiny scalar pre-pass like operators/skew.skew_stats — so
     every interval spans only a handful of buckets whatever the
     corpus size);
  2. intervals explode to their covered bucket ids
     (``sequence(floor(s/b), floor(e/b))`` — pure JVM, <= 3
     rows/interval at the default width);
  3. events compute their single bucket id — a narrow map;
  4. equi-join on (``by``..., bucket) — hash-partitioned, AQE
     handles hot buckets — then the exact ``s <= t < e`` residual
     filter in whole-stage codegen.

Each event lives in exactly one bucket and an interval's exploded
bucket ids are distinct, so a qualifying (event, interval) pair
meets in exactly one bucket: no dedup pass is needed, the candidate
volume is bounded by bucket occupancy, and the output is exactly the
inequality-join result (DuckDB-oracle-exact through the driver
contract, ``range_join``).

No reference analog (GELOS has no timeseries ops); part of the
engine's training-data event-attribution family with asof_join and
sessionize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_us(df: DataFrame, col: str):
    """Column -> integer microseconds (timestamps) or the raw numeric
    value (already-numeric ordering columns), matching asof_join."""
    is_ts = df.schema[col].dataType.simpleString().startswith("timestamp")
    c = F.col(col)
    # numeric columns stay untouched (possibly fractional) — casting
    # would silently truncate the exact residual comparison
    return F.unix_micros(c.cast("timestamp")) if is_ts else c


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    start: str = "start",
    end: str = "end",
    by: list[str] | str | None = None,
    interval_cols: list[str] | None = None,
    bucket_us: int | None = None,
    suffix: str = "_i",
) -> DataFrame:
    """Inner range join: event rows x containing intervals
    (``start <= on < end``, half-open so zero-length intervals match
    nothing and back-to-back intervals never double-count a boundary
    event).

    on: event ordering column (timestamp or numeric), on ``events``.
    start/end: interval bound columns on ``intervals``, same type
        family as ``on``.
    by: optional equality key column(s) present on both sides
        (e.g. user_id); without it intervals are global and the
        bucket id alone is the join key — still blocked, the bucket
        plays the role the block column plays in operators/dedup.py.
    interval_cols: interval columns to attach (default: all but
        start/end/by), emitted as ``<col><suffix>``; the bounds are
        always attached as ``<start><suffix>``/``<end><suffix>``.
    bucket_us: bucket width in microseconds (numeric ``on``: same
        units as the column; may be fractional for fractional
        domains). Default = max interval length over ``intervals`` —
        one scalar pre-pass job — so each interval explodes to at
        most 3 bucket rows. Tune DOWN only when one outlier interval
        would otherwise set a width so large that dense buckets
        dominate the join.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    vals = interval_cols or [
        c for c in intervals.columns if c not in (start, end) and c not in by
    ]
    s_us, e_us = _to_us(intervals, start), _to_us(intervals, end)
    t_us = _to_us(events, on)

    # half-open: e <= s can never match; drop before the scalar
    # pre-pass so a degenerate interval cannot poison the width
    iv = intervals.where(e_us > s_us)

    if bucket_us is None:
        row = iv.agg(F.max(e_us - s_us).alias("w")).collect()[0]
        bucket_us = float(row["w"]) if row["w"] is not None else 1.0
    # validate AFTER conversion — fractional widths are legal for
    # fractional numeric domains and must not truncate to 0
    bucket_us = float(bucket_us)
    if not bucket_us > 0:
        raise ValueError(f"range_join: bucket_us must be positive, got {bucket_us}")

    b = F.lit(bucket_us)
    iv2 = iv.select(
        *[F.col(c).alias(f"__by_{c}") for c in by],
        *[F.col(c).alias(f"{c}{suffix}") for c in vals],
        F.col(start).alias(f"{start}{suffix}"),
        F.col(end).alias(f"{end}{suffix}"),
        # upper bound floor(e/b), not floor((e-1)/b): correct for
        # continuous (fractional) domains too; when e sits exactly on
        # a bucket boundary this adds one spurious candidate bucket,
        # which the exact residual filter removes
        F.explode(
            F.sequence(F.floor(s_us / b), F.floor(e_us / b))
        ).alias("__bkt"),
    )
    ev = events.withColumn("__bkt", F.floor(t_us / b))

    cond = [ev["__bkt"] == iv2["__bkt"]] + [
        ev[c] == iv2[f"__by_{c}"] for c in by
    ]

    # frame-qualified refs so a shared column name on both sides can
    # never make the residual comparison ambiguous
    def _us_ref(frame, src_df, src_col, ref):
        is_ts = src_df.schema[src_col].dataType.simpleString().startswith("timestamp")
        c = frame[ref]
        return F.unix_micros(c.cast("timestamp")) if is_ts else c

    s_j = _us_ref(iv2, intervals, start, f"{start}{suffix}")
    e_j = _us_ref(iv2, intervals, end, f"{end}{suffix}")
    t_j = _us_ref(ev, events, on, on)
    out = ev.join(iv2, cond).where((s_j <= t_j) & (t_j < e_j))
    return out.select(
        *[ev[c] for c in events.columns],
        *[iv2[f"{c}{suffix}"] for c in vals],
        iv2[f"{start}{suffix}"],
        iv2[f"{end}{suffix}"],
    )
