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


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    lookback: int = 19,
    min_periods: int = 5,
) -> DataFrame:
    """Rolling z-score of ``value_col`` against the trailing window of
    the ``lookback`` PRIOR rows per key (the current row is excluded,
    so a spike doesn't inflate its own baseline) — the distributed
    anomaly-detection primitive pandas users build with
    ``rolling().mean()/.std()``.

    Engine-exact math: the window sum and sum-of-squares accumulate in
    ``decimal`` (exact, order-independent), convert to double once,
    and the remaining mean/variance/sqrt arithmetic is IEEE-exact —
    so any engine computing the same formula over the same rows gets
    bit-identical z-scores (float ``sum()`` would depend on partial-
    aggregation order). One shuffle on the key; the window is
    ROWS-bounded so state per row is O(lookback).

    Adds ``_z`` (null until ``min_periods`` prior rows exist) and
    ``_n_prior``.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col)
    # decimal(18,6): the product is decimal(37,12) — EXACT. At (19,6)
    # Spark resolves the product to decimal(38,11), silently rounding
    # the 12th decimal digit, which diverges from engines (DuckDB)
    # that keep the exact (38,12) product
    dec = v.cast("decimal(18,6)")
    n = F.count(v).over(w)
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum(dec * dec).over(w).cast("double")
    mean = s1 / n
    # sample variance from exact sums; identical operands → identical
    # IEEE doubles on every engine (+,-,/,sqrt are correctly rounded)
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    z = (v - mean) / F.sqrt(var)
    return df.withColumn("_n_prior", n).withColumn(
        "_z", F.when(n >= min_periods, z)
    )
