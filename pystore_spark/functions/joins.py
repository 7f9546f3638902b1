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
