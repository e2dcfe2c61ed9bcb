"""Chained array-extraction strategies (SURVEY.md §2.7 F1/F2).

The reference extracts embedding subsets by applying a config-driven
LIST of strategy steps in sequence — each step a
``pa.compute.list_slice(start, stop, step)`` and/or a
``list_flatten`` (/root/reference/gelos/embedding_extraction.py:27-36,
strategies configured at tests/fixtures/example_config.yaml:66-82),
ending with a recursive flatten + fixed-width reshape (:57-58).

Engine mapping: each step is a pure Catalyst column expression
(transform/filter/flatten — JVM, codegen), so a whole strategy chain
compiles into ONE projection over the scan, and the identical chain
is emitted as DuckDB SQL for the oracle. Slice semantics follow
PyArrow ``list_slice``: 0-based start, exclusive stop, positive step
(verified against PyArrow itself in tests/test_arrays.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def slice_step_col(arr: Column, start: int, stop: int, step: int = 1) -> Column:
    """PyArrow-list_slice semantics as a column expression: elements
    at 0-based indices ``start <= i < min(stop, len)`` stepping by
    ``step``. Index-filter form so empty results need no type-cast
    special case."""
    if step < 1:
        raise ValueError("step must be >= 1")
    picked = F.filter(
        F.sequence(F.lit(0), F.size(arr) - 1),
        lambda i: (i >= F.lit(start))
        & (i < F.lit(stop))
        & ((i - F.lit(start)) % F.lit(step) == 0),
    )
    body = F.transform(picked, lambda i: F.element_at(arr, i + 1))
    # sequence(0, -1) errors on empty input arrays — guard with a
    # typed empty slice of the same array type
    return F.when(F.size(arr) > 0, body).otherwise(F.slice(arr, 1, 0))


def slice_step_sql(arr_sql: str, start: int, stop: int, step: int = 1) -> str:
    """The identical step as DuckDB SQL (range is 0-based/exclusive,
    matching the PyArrow semantics directly)."""
    return (
        f"list_transform(list_filter(range(0, len({arr_sql})), "
        f"i -> i >= {start} AND i < {stop} AND (i - {start}) % {step} = 0), "
        f"i -> ({arr_sql})[i + 1])"
    )


def chunked_col(arr: Column, width: int) -> Column:
    """Flat array -> array of ``width``-wide chunks (the nested-list
    shape the reference's 'terramind embeddings are nested lists'
    strategies operate on, example_config.yaml:67). Trailing partial
    chunks are dropped (fixed-width contract)."""
    n_chunks = (F.size(arr) / width).cast("int")
    empty_nested = F.slice(F.array(F.slice(arr, 1, 0)), 1, 0)  # typed []
    return F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(arr, i * width + 1, width),
        ),
    ).otherwise(empty_nested)


def chunked_sql(arr_sql: str, width: int) -> str:
    return (
        f"list_transform(range(0, len({arr_sql}) // {width}), "
        f"i -> list_slice({arr_sql}, i * {width} + 1, i * {width} + {width}))"
    )


def apply_strategy_chain(arr: Column, steps: list[dict]) -> Column:
    """Fold a config-style strategy list over an array column. Each
    step dict: ``{"start": s, "stop": e, "step": k}`` (list_slice) or
    ``{"flatten": true}`` — the two primitives the reference chains
    (embedding_extraction.py:27-36)."""
    out = arr
    for st in steps:
        if st.get("flatten"):
            out = F.flatten(out)
        else:
            out = slice_step_col(
                out, int(st["start"]), int(st["stop"]), int(st.get("step", 1))
            )
    return out


def strategy_chain_sql(arr_sql: str, steps: list[dict]) -> str:
    """The identical chain as one DuckDB SQL expression."""
    out = arr_sql
    for st in steps:
        if st.get("flatten"):
            out = f"flatten({out})"
        else:
            out = slice_step_sql(out, int(st["start"]), int(st["stop"]), int(st.get("step", 1)))
    return out
