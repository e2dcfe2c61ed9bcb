"""Materialization policy for operator returns (SURVEY.md §7.0).

Operators that persist intermediates during their driver loop end by
materializing their result so those caches can be released before
returning. How that materialization happens is the caller's durability
/ composability tradeoff, so every such operator exposes a
``checkpoint`` parameter routed through :func:`finalize`:

  - ``True`` (default) — eager ``localCheckpoint``: same cost as the
    compute, blocks are reference-counted by the context cleaner and
    freed when the caller drops the frame. Executor-LOCAL: on a real
    cluster the blocks die with their executor and the lineage needed
    to recompute them is severed — fine for a result consumed within
    the job, wrong for one a later job depends on.
  - ``"reliable"`` — eager ``DataFrame.checkpoint()`` against the
    session's configured checkpoint directory (HDFS/object store on a
    cluster): survives executor loss, the engine analog of the
    reference's durable marker-file commit protocol
    (gelos/embedding_generation.py:58-61,80). Requires
    ``spark.sparkContext.setCheckpointDir(...)`` first.
  - ``False`` — return the un-materialized plan for ``.explain``
    auditing or further composition (filters/projections applied by
    the caller stay visible to Catalyst instead of stopping at a
    checkpoint scan). The operator's internal caches then stay
    persisted until the session drops them — the caller owns that
    lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def finalize(
    df: DataFrame,
    checkpoint: bool | str,
    caches: tuple[DataFrame, ...] | list[DataFrame] = (),
) -> DataFrame:
    """Apply the operator-return materialization policy (see module
    docstring). ``caches`` are unpersisted only when the result was
    actually materialized (True / "reliable") — with ``False`` the
    returned plan still reads through them."""
    if checkpoint is False:
        return df
    if checkpoint == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "checkpoint='reliable' needs a checkpoint directory: call "
                "spark.sparkContext.setCheckpointDir(<HDFS/object-store path>) first"
            )
        out = df.checkpoint(eager=True)
    elif checkpoint is True:
        out = df.localCheckpoint(eager=True)
    else:
        raise ValueError(f"checkpoint must be True, False, or 'reliable', got {checkpoint!r}")
    for c in caches:
        c.unpersist()
    return out
