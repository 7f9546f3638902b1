"""Incremental materialized rollups — hypertable-style continuous
aggregates over a stored item.

``create_rollup`` materializes a time-bucketed aggregate of a source
item as a second item; ``refresh_rollup`` brings it up to date after
appends/upserts by recomputing ONLY the time range the storage layer
actually touched. The change detection is pure driver-side string
work: the rollup's sidecar records the source manifest's file list at
materialization time, and because the commit protocol never rewrites
a committed file, the symmetric difference of file lists names
exactly the changed ``_pb=`` storage buckets. Refresh then

1. re-aggregates the live item restricted to those buckets (the
   ``_pb`` filter prunes at the manifest level before any I/O), and
2. carries over every rollup row outside them untouched,

so refresh cost is O(changed storage buckets) + O(rollup), never
O(item) — the property that makes continuous aggregates viable when
the item is 100 TB and an append touches one day. Because affected
buckets come from path strings, refresh never needs the *old* data
files and is immune to stale-file garbage collection.

Any aggregate works (recompute-based maintenance has no
decomposability requirement — ``count_distinct`` and ``avg`` are as
safe as ``sum``). Sources without a time-bucketed layout fall back to
full recompute, which is the right answer for the small items that
layout implies.

The reference engine has no analog (its users re-run pandas
``resample().agg()`` over the whole item); the design follows the
continuous-aggregate pattern of time-series databases re-expressed on
the manifest protocol.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pystore_spark.exceptions import ValidationError

ROLLUP_META_KEY = "_rollup"

_AGG_FNS = {
    "sum": lambda c: F.sum(F.col(c).cast("decimal(20,6)")).cast("double"),
    "count": lambda c: F.count(F.col(c)),
    "min": lambda c: F.min(F.col(c)),
    "max": lambda c: F.max(F.col(c)),
    "avg": lambda c: F.avg(F.col(c)),
    "count_distinct": lambda c: F.count_distinct(F.col(c)),
}

#: rollup units, with the time-layout freqs each ``_pb`` bucket scheme
#: can contain without splitting a rollup bucket across storage buckets
_UNITS = ("hour", "day", "week", "month")


def agg_exprs(aggs: Mapping[str, Sequence[str]]) -> list[Column]:
    """``{col: [fn, ...]}`` → aliased aggregate columns named
    ``{col}_{fn}``. Sums accumulate in decimal so refresh produces
    bit-identical values regardless of partial-aggregation order
    (a float sum would make refreshed vs full-recompute rollups
    hash-diverge)."""
    out: list[Column] = []
    for col, fns in aggs.items():
        for fn in fns:
            if fn not in _AGG_FNS:
                raise ValidationError(
                    f"unsupported rollup aggregate {fn!r}; "
                    f"supported: {sorted(_AGG_FNS)}"
                )
            out.append(_AGG_FNS[fn](col).alias(f"{col}_{fn}"))
    if not out:
        raise ValidationError("rollup needs at least one aggregate")
    return out


def compute_rollup(
    df: DataFrame,
    index_col: str,
    unit: str,
    dims: Sequence[str],
    aggs: Mapping[str, Sequence[str]],
) -> DataFrame:
    """One shuffle on (bucket, dims) with map-side partial
    aggregation — the same shape at any scale."""
    if unit not in _UNITS:
        raise ValidationError(
            f"unsupported rollup unit {unit!r}; supported: {_UNITS}"
        )
    bucket = F.date_trunc(unit, F.col(index_col)).alias("bucket")
    return df.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        *agg_exprs(aggs)
    )


def changed_pb_buckets(
    old_files: Sequence[str], new_files: Sequence[str]
) -> set[str] | None:
    """``_pb`` bucket values whose file set changed between two
    manifest snapshots — pure string work on relative paths. Returns
    ``None`` when any changed file carries no ``_pb=`` prefix (layout
    without time buckets → caller must full-recompute)."""
    from pystore_spark.manifest import _bucket_of

    changed = set(old_files) ^ set(new_files)
    out: set[str] = set()
    for rel in changed:
        b = _bucket_of(rel)
        if b is None:
            return None
        out.add(b)
    return out


def _pb_period(freq: str, bucket: str):
    """[start, end) timestamps of a ``_pb`` bucket string."""
    import pandas as pd

    if freq == "D":
        lo = pd.Timestamp(bucket)
        return lo, lo + pd.Timedelta(days=1)
    if freq == "M":
        lo = pd.Timestamp(f"{bucket}-01")
        return lo, lo + pd.offsets.MonthBegin(1)
    if freq == "Q":
        year, q = bucket.split("-Q")
        lo = pd.Timestamp(year=int(year), month=(int(q) - 1) * 3 + 1, day=1)
        return lo, lo + pd.offsets.MonthBegin(3)
    if freq == "Y":
        lo = pd.Timestamp(year=int(bucket), month=1, day=1)
        return lo, lo + pd.offsets.YearBegin(1)
    raise ValidationError(f"unknown partition freq {freq!r}")


def _floor_unit(ts, unit: str):
    import pandas as pd

    if unit == "hour":
        return ts.floor("h")
    if unit == "day":
        return ts.normalize()
    if unit == "week":  # ISO Monday, matching Spark date_trunc('week')
        return (ts - pd.Timedelta(days=ts.dayofweek)).normalize()
    if unit == "month":
        return ts.normalize().replace(day=1)
    raise ValidationError(f"unsupported rollup unit {unit!r}")


def _next_boundary(ts, unit: str):
    import pandas as pd

    step = {
        "hour": pd.Timedelta(hours=1),
        "day": pd.Timedelta(days=1),
        "week": pd.Timedelta(weeks=1),
    }.get(unit)
    if step is not None:
        return _floor_unit(ts, unit) + step
    return _floor_unit(ts, unit) + pd.offsets.MonthBegin(1)


def recompute_ranges(
    changed_buckets: Sequence[str], freq: str, unit: str
) -> list[tuple]:
    """Merged, unit-aligned [start, end) index windows covering every
    rollup bucket that intersects a changed storage bucket. Expanding
    the window to unit boundaries is what keeps straddling buckets
    correct — a week rollup bucket crossing a month edge, or a month
    rollup over day-bucketed storage, is recomputed from ALL its
    source rows, not just the changed storage bucket's share."""
    import pandas as pd

    eps = pd.Timedelta(microseconds=1)
    windows = []
    for b in sorted(set(changed_buckets)):
        lo, hi = _pb_period(freq, b)
        flo = _floor_unit(lo, unit)
        fhi = hi if hi == _floor_unit(hi, unit) else _next_boundary(hi - eps, unit)
        windows.append((flo, fhi))
    windows.sort()
    merged: list[tuple] = []
    for lo, hi in windows:
        if merged and lo <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return [(lo.to_pydatetime(), hi.to_pydatetime()) for lo, hi in merged]
