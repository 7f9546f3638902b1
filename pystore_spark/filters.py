"""Tuple-DNF predicate sugar → Spark ``Column`` expressions.

The reference exposes pyarrow-style filters on reads:
``[('col','==',v), ...]`` = AND of terms; a list of such lists = OR of
ANDs; ops: == = != < <= > >= in not-in (reference: pystore/item.py:64-65,
exercised by tests/test_performance.py:224-251).

Here the tuples compile to a single Catalyst ``Column`` predicate, so
predicate pushdown to Parquet row groups (min/max stats) and partition
pruning happen automatically — no engine-side row filtering.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

FilterTuple = tuple  # (column, op, value)

_OPS = {"==", "=", "!=", "<", "<=", ">", ">=", "in", "not in", "not-in"}


def _term(col: str, op: str, value: Any) -> Column:
    c = F.col(col)
    if op in ("==", "="):
        return c == F.lit(value)
    if op == "!=":
        return c != F.lit(value)
    if op == "<":
        return c < F.lit(value)
    if op == "<=":
        return c <= F.lit(value)
    if op == ">":
        return c > F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    if op == "in":
        return c.isin(list(value))
    if op in ("not in", "not-in"):
        return ~c.isin(list(value))
    raise ValueError(f"unsupported filter op {op!r}; supported: {sorted(_OPS)}")


def filters_to_column(filters: Sequence | None) -> Column | None:
    """Compile tuple-DNF filters to one boolean Column (or None)."""
    if not filters:
        return None
    flist = list(filters)
    # single conjunction: [(c,op,v), ...]
    if all(isinstance(f, tuple) and len(f) == 3 for f in flist):
        groups = [flist]
    else:
        groups = [list(g) for g in flist]
    disjuncts: list[Column] = []
    for g in groups:
        conj: Column | None = None
        for col, op, value in g:
            t = _term(col, op, value)
            conj = t if conj is None else (conj & t)
        if conj is not None:
            disjuncts.append(conj)
    if not disjuncts:
        return None
    out = disjuncts[0]
    for d in disjuncts[1:]:
        out = out | d
    return out


def filters_to_arrow_expression(filters: Sequence | None, schema=None):
    """Compile the same tuple-DNF to a ``pyarrow.dataset`` expression
    (None when no filters) — for the driver-side Arrow read fast path
    that serves reads without a Spark job.

    ``schema`` (the dataset schema) localizes naive timestamp literals
    against tz-aware storage columns (TIMESTAMP_MICROS adjusted-to-UTC
    files read back as ``timestamp[us, tz=UTC]``; Arrow refuses naive
    vs aware comparisons, unlike Spark's session-tz semantics)."""
    if not filters:
        return None
    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    def _coerce(col, v):
        if schema is None or col not in schema.names:
            return v
        t = schema.field(col).type
        if pa.types.is_timestamp(t) and t.tz is not None:
            import pandas as pd

            def one(x):
                ts = pd.Timestamp(x)
                return (
                    ts.tz_localize(t.tz) if ts.tzinfo is None
                    else ts.tz_convert(t.tz)
                )

            try:
                if isinstance(v, (list, tuple, set)):
                    return [one(x) for x in v]
                return one(v)
            except Exception:
                return v
        return v

    def _norm(t):
        col, op, v = t
        op = {"=": "==", "not-in": "not in"}.get(op, op)
        return (col, op, _coerce(col, v))

    flist = list(filters)
    if all(isinstance(f, tuple) and len(f) == 3 for f in flist):
        dnf = [_norm(f) for f in flist]
    else:
        dnf = [[_norm(f) for f in g] for g in flist]
    return pa_pq.filters_to_expression(dnf)
