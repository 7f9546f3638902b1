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

_OPS = {
    "==", "=", "!=", "<", "<=", ">", ">=", "in", "not in", "not-in",
    # beyond-reference: substring match (LIKE '%v%'). Row-level it is
    # Column.contains; file-level a token-mode bloom (bloom.py) skips
    # files missing any INTERIOR token of the needle — the
    # contamination-audit shape ("which files mention this benchmark
    # string") at 100 TB.
    "contains",
    # token-boundary match: the needle occurs with non-token chars (or
    # string edges) on both sides, lowercased — bloom.TOKEN_RE word
    # semantics. Stronger file skipping than `contains` (EVERY needle
    # token is index-testable, including single-token needles).
    "has_token",
}


def _token_boundary_regex(needle: str) -> str:
    """Lowercased token-boundary pattern for ``has_token`` — shared
    semantics with bloom.TOKEN_RE tokens (alnum runs): the needle must
    not extend into an adjacent alnum char on either side. Plain
    groups, no lookaround, so the same pattern runs on Java regex
    (Spark rlike), RE2 (DuckDB regexp_matches) and Python — the
    oracle can replay it verbatim."""
    import re as _re

    return "(^|[^0-9a-z])" + _re.escape(needle.lower()) + "([^0-9a-z]|$)"


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
    if op == "contains":
        return c.contains(value)
    if op == "has_token":
        return F.lower(c).rlike(_token_boundary_regex(value))
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
        dnf = [[_norm(f) for f in flist]]
    else:
        dnf = [[_norm(f) for f in g] for g in flist]
    if not any(
        op in ("contains", "has_token") for g in dnf for _, op, _v in g
    ):
        # pyarrow's own converter handles the reference op set
        return pa_pq.filters_to_expression(
            dnf if len(dnf) > 1 else dnf[0]
        )
    # manual expression build — filters_to_expression has no substring
    # op, so a DNF containing `contains` terms compiles here with
    # pc.match_substring for those terms and the standard comparisons
    # for the rest
    import operator
    from functools import reduce

    import pyarrow.compute as pc
    import pyarrow.dataset as pa_ds

    def _one(t):
        col, op, v = t
        f = pa_ds.field(col)
        if op == "==":
            return f == v
        if op == "!=":
            return f != v
        if op == "<":
            return f < v
        if op == "<=":
            return f <= v
        if op == ">":
            return f > v
        if op == ">=":
            return f >= v
        if op == "in":
            return f.isin(list(v))
        if op == "not in":
            return ~f.isin(list(v))
        if op == "contains":
            return pc.match_substring(f, v)
        if op == "has_token":
            return pc.match_substring_regex(
                pc.utf8_lower(f), _token_boundary_regex(v)
            )
        raise ValueError(f"unsupported filter op {op!r}")

    return reduce(
        operator.or_,
        (reduce(operator.and_, (_one(t) for t in g)) for g in dnf),
    )
