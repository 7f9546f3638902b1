"""Keyed upsert/merge strategies for append.

The reference's append semantics (spec'd by tests/test_append.py:53-163
and pystore/collection.py:391-436,516-520,586-617):

* ``keep_last`` (default): incoming rows win on index conflict.
* ``keep_first``: existing rows win (anti-join drops conflicting
  incoming rows).
* ``keep_all``: plain union, duplicates retained.
* ``error``: raise ``DataIntegrityError`` when any index overlaps.

Spark formulation: anti/semi joins + a ``row_number`` window with a
deterministic tiebreaker. Spark's ``dropDuplicates`` keeps an
*arbitrary* row, so keep-first/keep-last need an explicit ordering
column: ``_src`` (0=existing, 1=incoming) and ``_ord``.

Which duplicate within the *incoming* frame wins is decided by
``order_col`` when the caller supplies one (the deterministic choice
for frames read from Parquet or produced by a shuffle, where physical
row order is arbitrary).  Without it, ``_ord`` falls back to
``monotonically_increasing_id``, which reflects input row order ONLY
for driver-originated (pandas/createDataFrame) input whose partition
ids are sequential — matching the reference's pandas keep=first/last
semantics at the ingest boundary.

Scale note: the window shuffles on the key. ``Collection.append``
restricts the merge to the time-partitions that actually contain
incoming keys (partition-scoped read + dynamic partition overwrite),
so the shuffle is proportional to the touched partitions, not the item.
"""

from __future__ import annotations

import re
import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pystore_spark.exceptions import DataIntegrityError

SRC_COL = "_src"
ORD_COL = "_ord"

#: Reserved name for a caller-stamped input-order ordinal. Ingest
#: paths that reshuffle their batch before appending (the dedup-index
#: anti-join against the drop set) stamp this column on the ORIGINAL
#: frame — while its row order is still the meaningful "input order"
#: — and pass ``order_col=INPUT_ORD_COL``: keep-first/keep-last
#: winners are then pinned to the pre-shuffle order instead of task
#: scheduling, and the merge strips the column after ranking so it
#: never reaches storage (round-10 verdict #4).
INPUT_ORD_COL = "_ord_input"

STRATEGIES = ("keep_last", "keep_first", "keep_all", "error")

# logical operators whose output row order is a shuffle artifact —
# when one appears in the incoming frame's lineage, "input order" is
# not a meaningful tiebreaker and the caller must supply order_col
_SHUFFLE_OPS = re.compile(
    r"\b(Join|Aggregate|RepartitionByExpression|Repartition|"
    r"Window|Distinct|Deduplicate|Sort)\b"
)


def _warn_if_order_unreliable(df: DataFrame, context: str) -> None:
    """Warn when keep-first/keep-last must fall back to input order
    (``monotonically_increasing_id``) but the frame's lineage contains
    a shuffle-producing operator: which duplicate "came last" is then
    a nondeterministic artifact of task scheduling, and the caller
    should pass ``order_col`` to pin the winner."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    except Exception:
        return
    m = _SHUFFLE_OPS.search(plan)
    if m is None:
        return
    if m.group(1) == "Sort":
        # the analyzed plan prints top-down, so the FIRST match being
        # a GLOBAL Sort (global flag `true` on the node line) means
        # only order-preserving ops (Project/Filter) sit above a total
        # sort. A global sort pins the order of rows with DISTINCT
        # sort keys — but the range-partitioning shuffle it implies
        # still delivers rows TYING on the sort keys in scheduling
        # order, and ties are exactly the duplicates keep-first/last
        # must break when the sort key is the dedup key. So a sorted
        # frame gets the narrower tie warning, never silence.
        # `sortWithinPartitions` prints global=false and falls through
        # to the full warning: partition order remains arbitrary.
        line = plan[m.start():].split("\n", 1)[0]
        if re.search(r"\],\s*true\b", line):
            warnings.warn(
                f"{context}: the input frame is globally sorted, "
                "which pins input order only for rows with DISTINCT "
                "sort keys — duplicates tying on them still arrive "
                "in nondeterministic scheduling order. If ties are "
                "possible, pass order_col= with a tiebreaking column "
                "to pin the keep-first/keep-last winner.",
                stacklevel=3,
            )
            return
    warnings.warn(
        f"{context}: the input frame's plan contains {m.group(1)}, "
        "whose output row order is nondeterministic — keep-first/"
        "keep-last within this batch will pick an arbitrary "
        "winner. Pass order_col= to make the choice deterministic.",
        stacklevel=3,
    )


def _union(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    return existing.unionByName(incoming, allowMissingColumns=True)


def dedup_within(
    df: DataFrame,
    keys: list[str],
    keep: str = "last",
    order_col: str | None = None,
) -> DataFrame:
    """Deduplicate a single frame on ``keys`` keeping first/last by
    ``order_col`` — or by input order when none is given (reference:
    pystore/dataframe.py:189-198; see module docstring for the
    driver-originated-input restriction)."""
    if order_col is not None:
        ordered = df
        ord_expr = F.col(order_col)
        # the reserved stamped ordinal is plumbing, not data
        drop_cols = (
            ["_rn", INPUT_ORD_COL]
            if order_col == INPUT_ORD_COL
            else ["_rn"]
        )
    else:
        _warn_if_order_unreliable(df, "dedup_within")
        ordered = df.withColumn(ORD_COL, F.monotonically_increasing_id())
        ord_expr = F.col(ORD_COL)
        drop_cols = ["_rn", ORD_COL]
    order = ord_expr.desc() if keep == "last" else ord_expr.asc()
    w = Window.partitionBy(*keys).orderBy(order)
    return (
        ordered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop(*drop_cols)
    )


def merge_append(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    strategy: str = "keep_last",
    order_col: str | None = None,
) -> DataFrame:
    """Merge ``incoming`` into ``existing`` under a duplicate-handling
    strategy. Returns the merged DataFrame (not yet written)."""
    if strategy not in STRATEGIES:
        raise ValueError(f"duplicate_handling must be one of {STRATEGIES}")

    def _strip(df: DataFrame) -> DataFrame:
        # the reserved stamped ordinal never reaches storage
        return (
            df.drop(INPUT_ORD_COL)
            if order_col == INPUT_ORD_COL
            else df
        )

    if strategy == "keep_all":
        return _strip(_union(existing, incoming))

    if strategy == "error":
        overlap = (
            incoming.select(keys)
            .join(existing.select(keys), on=keys, how="left_semi")
            .count()
        )
        if overlap:
            raise DataIntegrityError(
                f"append would create {overlap} duplicate index entries "
                "(duplicate_handling='error')"
            )
        return _strip(_union(existing, incoming))

    if strategy == "keep_first":
        # existing wins: drop incoming rows whose key already exists
        # (left-anti join — reference pystore/collection.py:391-407),
        # and keep only the first occurrence within the incoming frame.
        fresh = dedup_within(
            incoming, keys, keep="first", order_col=order_col
        ).join(existing.select(keys), on=keys, how="left_anti")
        return _union(existing, fresh)

    # keep_last: newest wins across existing ∪ incoming.  _src ranks
    # incoming over existing; order_col (if any) then ranks within the
    # incoming frame deterministically; _ord is the final input-order
    # fallback.
    if order_col is None:
        _warn_if_order_unreliable(incoming, "merge_append(keep_last)")
    ex = existing.withColumn(SRC_COL, F.lit(0)).withColumn(
        ORD_COL, F.lit(0).cast("bigint")
    )
    inc = incoming.withColumn(SRC_COL, F.lit(1)).withColumn(
        ORD_COL, F.monotonically_increasing_id()
    )
    unioned = ex.unionByName(inc, allowMissingColumns=True)
    order_exprs = [F.col(SRC_COL).desc()]
    if order_col is not None:
        order_exprs.append(F.col(order_col).desc())
    order_exprs.append(F.col(ORD_COL).desc())
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    return _strip(
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", SRC_COL, ORD_COL)
    )
