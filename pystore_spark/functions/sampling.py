"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is not reproducible across engines or
re-runs with different partitioning; these operators derive the sample
from a content hash instead, so the SAME rows are selected on any
engine, any partition layout, any cluster size — which is what a
training-data pipeline needs for auditable data mixes.

Scale notes:
- ``stratified_sample_hash`` is a pure projection + filter — no
  shuffle at all; the predicate pushes down to the scan when the rate
  column is a literal CASE over a partition column.
- ``fixed_sample_per_stratum`` needs one shuffle on the stratum key
  (window). A single giant stratum funnels into one task; pre-thin
  with ``stratified_sample_hash`` at a generous rate first (hash order
  is stable, so thinning then ranking gives the same head) when a
  stratum exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: str | Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5 of the key —
    portable across engines (DuckDB: ``CAST(('0x' || substr(md5(k),
    1, 14)) AS BIGINT) % buckets``), unlike xxhash64/crc32 which
    differ per engine. 14 hex chars < 2^56 so the bigint never
    overflows."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 14), 16, 10)
        .cast("bigint")
        % buckets
    )


def stratified_sample_hash(
    df: DataFrame,
    key_col: str,
    rate_col: Column,
    buckets: int = 100,
) -> DataFrame:
    """Keep rows whose hash bucket falls below a per-row (usually
    per-stratum) rate out of ``buckets``. ``rate_col`` is a Column so
    strata can get different rates (e.g. a CASE over ``source``)."""
    return df.withColumn("bucket", hash_bucket(key_col, buckets)).filter(
        F.col("bucket") < rate_col
    )


def fixed_sample_per_stratum(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    n: int,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by
    md5-hash order (deterministic, engine-portable, uniform)."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def weighted_sample_per_stratum(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weight_col: str | Column,
    n: int,
) -> DataFrame:
    """Weighted sampling without replacement, ``min(n, |stratum|)``
    rows per stratum (Efraimidis–Spirakis A-ES): each row draws a
    deterministic uniform u ∈ (0, 1] from md5 of its key and ranks by
    ``u^(1/w)`` descending, so inclusion probability is proportional
    to weight. Ranking by ``ln(u)/w`` is the same order (ln is
    monotonic) without the pow() call. Deterministic and
    engine-portable — same md5-derived u everywhere — and one shuffle
    on the stratum key, same scale shape as
    ``fixed_sample_per_stratum``.
    """
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # 14 hex chars → [0, 2^56); +1 INTEGER-side before the double
    # divide — adding 1.0 after the double cast rounds differently
    # above 2^53 for ~15% of keys and would diverge from a SQL oracle
    # computing (bigint + 1) / 2^56; +1 also means never ln(0)
    u = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 14), 16, 10
        ).cast("bigint")
        + F.lit(1)
    ).cast("double") / float(1 << 56)
    key = F.log(u) / wcol
    w = Window.partitionBy(stratum_col).orderBy(
        key.desc(), F.col(key_col)
    )
    # p ∝ w means w <= 0 is "never sampled"; excluding those rows also
    # avoids the division blowing up under ANSI mode (w = 0) and a
    # negative weight inverting the ranking
    return (
        df.filter(wcol > 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
