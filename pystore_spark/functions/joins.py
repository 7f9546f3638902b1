"""Join helpers for skewed keys at cluster scale.

AQE's skew-join splitting handles sort-merge skew automatically; this
module adds the explicit *salted* formulation for cases AQE can't
rewrite (e.g. aggregations after the join keyed on the skewed column,
or forced shuffle-hash joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join a skewed large side against ``other`` by salting: the
    skewed side gets a random salt in [0, num_salts); ``other`` is
    replicated once per salt, so each hot key spreads over
    ``num_salts`` reducers instead of one.

    Use when one/few keys dominate (power-law user ids, null-ish
    defaults). Cost: ``other`` is shuffled ``num_salts``×, so keep it
    the smaller side.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted = skewed.withColumn(
        "_salt", (F.rand(seed) * num_salts).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted.join(replicated, on + ["_salt"], how).drop("_salt")


def banded_interval_join(
    intervals: DataFrame,
    probe: DataFrame,
    start_col: str,
    end_col: str,
    time_col: str,
    band_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Interval join (probe.ts ∈ [start, end)) without an equi-key,
    made shuffle-joinable by banding the time axis: each interval
    replicates to every ``band_seconds`` band it overlaps, each probe
    row lands in exactly one band, so band equality + the residual
    range predicate becomes an equi-join Catalyst can hash/sort-merge.
    Without the band the only physical plan is BroadcastNestedLoopJoin
    (driver-OOM at scale) or a cartesian product.

    Each matching (interval, probe) pair appears exactly once: the
    probe's band is unique, so only the interval replica in that band
    can pair with it. Choose ``band_seconds`` ≈ the typical interval
    length — shorter bands replicate intervals more; longer bands put
    more non-matching rows in each band.

    Column names must be disjoint between the two frames. ``how`` may
    be ``inner`` or ``left`` (left keeps intervals with no probe rows;
    an interval spanning b bands yields b null-extended rows, so
    aggregate with null-skipping functions like ``count(col)``).
    """
    overlap = set(intervals.columns) & set(probe.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, both have {sorted(overlap)}")
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"banded_interval_join supports inner/left, got {how!r}")

    def band_of(col: F.Column) -> F.Column:
        # TIMESTAMP_NTZ has no direct → BIGINT cast; route through LTZ
        # (session tz is pinned to UTC, so NTZ epoch == DuckDB's epoch()).
        return F.floor(col.cast("timestamp").cast("long") / band_seconds).cast(
            "long"
        )

    iv = intervals.withColumn(
        "_band",
        F.explode(
            F.sequence(
                band_of(F.col(start_col)),
                # end is exclusive: a range end exactly on a band edge
                # never matches inside that band
                band_of(F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")),
            )
        ),
    )
    pr = probe.withColumn("_band", band_of(F.col(time_col)))
    cond = (
        (iv["_band"] == pr["_band"])
        & (pr[time_col] >= iv[start_col])
        & (pr[time_col] < iv[end_col])
    )
    return iv.join(pr, cond, how).drop("_band")


def salted_count_per_key(
    df: DataFrame, key_cols: list[str], num_salts: int = 16, seed: int = 42
) -> DataFrame:
    """Two-stage (salted partial → final) count for heavily skewed
    group-by keys — the classic map-side-combine-resistant case is a
    count over exploded data where one key holds most rows."""
    salted = df.withColumn("_salt", (F.rand(seed) * num_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").alias("n")
    )
