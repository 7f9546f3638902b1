"""Time-series grid operators: gap-filling and last-observation-
carried-forward (LOCF).

The reference engine's users lean on pandas ``resample``/``ffill`` for
this; the distributed formulation is a generated time grid (one
``sequence`` + ``explode``, no driver loop) left-joined to the bucketed
aggregate, then a per-key ``last(ignorenulls)`` running window. One
shuffle on the key for the join, reused by the window — the grid join
and the LOCF window co-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_grid(
    keys: DataFrame,
    start: str,
    end: str,
    step: str = "interval 1 day",
    grid_col: str = "grid_ts",
) -> DataFrame:
    """Cross every key row with a dense timestamp grid
    ``[start, end]`` stepped by ``step``. The grid is generated
    per-row with ``sequence`` (executor-side, no driver
    materialization); grid size = keys × steps, so keep the step
    coarse enough that the grid fits the cluster like any other fact
    table.
    """
    return keys.withColumn(
        grid_col,
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(step),
            )
        ),
    )


def locf(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
    suffix: str = "_filled",
) -> DataFrame:
    """Last-observation-carried-forward per key: nulls in each value
    column take the most recent non-null earlier value in ``order_col``
    order. Rows before the first observation stay null.

    A single running window per key — Spark evaluates all
    ``last(ignorenulls=True)`` columns in one pass over one shuffle.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out
