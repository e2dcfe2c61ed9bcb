"""As-of (nearest-event) join — the timeseries operator Spark's
join syntax lacks, composed from one shuffle + one running window.

For every left row, pick the single right row with the greatest
``on`` <= left's ``on`` (direction="backward", inclusive; "forward"
mirrors to the smallest ``on`` >= left's), within the same ``by``
key and an optional ``tolerance``. The classic uses: attach the most
recent sensor reading / model snapshot / session-start event to each
observation.

Spark-first plan (no per-row Python, no range-join explosion):

  1. union the two sides into one frame tagged ``_m`` (right=0,
     left=1), right value columns packed into ONE struct;
  2. ``Window.partitionBy(by).orderBy(sort_key, _m, tiebreak)`` with
     ``last(struct, ignorenulls=True)`` over
     ``rowsBetween(unboundedPreceding, currentRow)`` — a running
     carry-forward, evaluated streamingly by Spark's window exec
     (state = one struct, never a buffered frame);
  3. keep left rows, unpack the struct, null out matches beyond
     ``tolerance``.

One shuffle total (the window's partitionBy — AQE handles key skew),
sort-within-partition, linear scan. A sort-merge "range join" or a
per-key ``applyInPandas`` would shuffle the same bytes and buffer
more. Left-right ties at the same instant sort right-before-left
(``_m`` 0 < 1), so an event AT the boundary matches (inclusive, same
as DuckDB/pandas ASOF semantics); duplicate right rows at one
(key, ts) resolve to the greatest ``tiebreak`` so results are
deterministic and oracle-comparable.

No reference analog (GELOS has no timeseries ops); included as part
of the engine's training-data family (event/session attribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | str = "user_id",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row + the nearest preceding
    (or following) right row's columns, or nulls when none qualifies.

    on: ordering column, TIMESTAMP or numeric, present on both sides.
    by: equality key column(s) — REQUIRED non-empty (a keyless as-of
        funnels the whole table through one window partition; at
        engine scale that is always a mistake, mirroring the blocked
        self-join contracts in operators/dedup.py).
    right_cols: right columns to attach (default: all but on/by),
        emitted as ``<col><suffix>``; the matched right ``on`` is
        always attached as ``<on><suffix>``.
    direction: "backward" (greatest right on <= left on) or
        "forward" (smallest right on >= left on), both inclusive.
    tolerance_us: max |left.on - right.on| in microseconds (numeric
        ``on``: same units as the column); farther matches null out.
    tiebreak: right column deciding among duplicate (by, on) rows —
        the row with the GREATEST tiebreak wins. Defaults to the
        first right value column.
    """
    by = [by] if isinstance(by, str) else list(by)
    if not by:
        raise ValueError(
            "asof_join: 'by' must name at least one equality key column "
            "(a keyless as-of is a single-partition window at scale)"
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    vals = right_cols or [c for c in right.columns if c != on and c not in by]
    if not vals:
        raise ValueError("asof_join: right side carries no value columns to attach")
    tiebreak = tiebreak or vals[0]

    rv = F.struct(
        *[F.col(c).alias(c) for c in vals],
        F.col(on).alias("__on"),
    )
    # a null-ts right row must never be carried forward as a "match";
    # null-ts LEFT rows sort to the frame's start and so correctly
    # pick nothing
    right = right.where(F.col(on).isNotNull())
    r2 = right.select(
        *by,
        F.col(on).alias("_t"),
        F.col(tiebreak).alias("_tb"),
        rv.alias("_rv"),
        F.lit(0).alias("_m"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l2 = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(None).cast(r2.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r2.schema["_rv"].dataType).alias("_rv"),
        F.lit(1).alias("_m"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )

    # backward walks time ascending, forward descending — either way
    # the running last() sees "everything at-or-before me in the walk".
    # Right rows order before left at the same instant (_m 0 < 1:
    # inclusive); duplicate right (by, on) rows ascend by tiebreak so
    # the carry lands on the greatest one — deterministic
    t_ord = (
        F.col("_t").asc_nulls_first()
        if direction == "backward"
        else F.col("_t").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(t_ord, F.col("_m").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = l2.unionByName(r2).withColumn("_pick", F.last("_rv", ignorenulls=True).over(w))

    out = picked.where(F.col("_m") == 1)
    if tolerance_us is not None:
        is_ts = right.schema[on].dataType.simpleString().startswith("timestamp")
        # NTZ and TZ timestamps both cast consistently on the two sides,
        # so the DIFFERENCE is timezone-independent
        num = (
            (lambda c: F.unix_micros(c.cast("timestamp")))
            if is_ts
            else (lambda c: c)
        )
        dist = F.abs(num(F.col(f"_l_{on}")) - num(F.col("_pick.__on")))
        out = out.withColumn(
            "_pick", F.when(dist <= F.lit(int(tolerance_us)), F.col("_pick"))
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_pick.{c}").alias(f"{c}{suffix}") for c in vals],
        F.col("_pick.__on").alias(f"{on}{suffix}"),
    )
