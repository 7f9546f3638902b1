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


def _hash56(col: str | Column, salt: str = "") -> Column:
    """The module's ONE engine-portable hash recipe: the first 14 hex
    chars of md5(key [+ salt]) as a bigint in [0, 2^56) (DuckDB:
    ``CAST(('0x' || substr(md5(k), 1, 14)) AS BIGINT)``). Every
    sampler/sharder derives from this single definition so the SQL
    oracles can never drift per call site. 14 hex chars < 2^56 so the
    bigint never overflows."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    if salt:
        c = F.concat(c, F.lit(salt))
    return F.conv(F.substring(F.md5(c), 1, 14), 16, 10).cast("bigint")


def hash_bucket(col: str | Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5 of the key —
    portable across engines (see :func:`_hash56`), unlike
    xxhash64/crc32 which differ per engine."""
    return _hash56(col) % buckets


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
    u = (_hash56(key_col) + F.lit(1)).cast("double") / float(1 << 56)
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


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Deterministic shard assignment + within-shard shuffle order for
    training-data export: every row gets ``shard`` ∈ [0, n_shards) and
    a ``shard_pos`` sort key, both derived from md5 of the row key (+
    optional salt for fresh epochs/re-shuffles).

    This is the "global shuffle" step of batch prep done the
    distributed way: instead of one impossible total sort of 100 TB by
    a random number, the hash IS the permutation — shard by hash
    prefix, order within shard by the hash. Writing
    ``partitionBy("shard")`` after ``repartition(n_shards, "shard")``
    + ``sortWithinPartitions("shard_pos", key_col)`` yields
    byte-identical shards on any cluster size, and readers stream
    shards independently. ``shard_pos`` is 56 bits, so at billions of
    rows prefix collisions exist (birthday bound ~2^28 keys) — the
    KEY COLUMN is the documented tiebreak; sorting by ``shard_pos``
    alone is not deterministic at that scale. Same md5 discipline as
    the samplers above (:func:`_hash56`), so a SQL oracle reproduces
    the exact assignment."""
    h = _hash56(key_col, salt)
    return df.withColumn("shard", h % n_shards).withColumn(
        "shard_pos", h
    )


def mixture_plan(
    df: DataFrame,
    stratum_col: str,
    size_col: str | Column,
    alpha: float = 0.5,
    budget_epochs: float = 1.0,
) -> DataFrame:
    """Temperature-scaled source mixing plan (the multilingual /
    multi-source sampling recipe: raw share ``p_s`` per stratum,
    sampling weight ``p_s^α / Σ p^α``, and the epochs over each
    stratum needed to fill ``budget_epochs`` × total-corpus tokens).

    α < 1 upweights small sources (α = 0.5 is the common choice);
    ``epochs_needed > 1`` for a stratum means the plan repeats it —
    the standard over-sampling signal. One tiny groupBy (strata ≪
    rows) + a broadcast of the per-stratum frame against its own
    1-row total; nothing here grows with corpus size except the first
    aggregation pass."""
    scol = F.col(size_col) if isinstance(size_col, str) else size_col
    # temperature mass per stratum rounds to 6 decimals and totals as
    # DECIMAL: pow() emits irrational doubles whose float sum is
    # partial-agg-order-dependent — the usual decimal discipline makes
    # the plan bit-equal at any parallelism (and in a SQL oracle)
    per = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(scol).cast("double").alias("n_tokens"),
    ).withColumn(
        "tmass", F.round(F.pow(F.col("n_tokens"), F.lit(alpha)), 6)
    )
    tot = per.agg(
        F.sum("n_tokens").alias("t_tot"),
        F.sum(F.col("tmass").cast("decimal(28,6)"))
        .cast("double")
        .alias("pow_tot"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        stratum_col,
        "n_docs",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.col("n_tokens") / F.col("t_tot"), 6).alias(
            "raw_share"
        ),
        F.round(F.col("tmass") / F.col("pow_tot"), 6).alias(
            "mix_weight"
        ),
        F.round(
            (F.col("tmass") / F.col("pow_tot"))
            * F.lit(float(budget_epochs))
            * F.col("t_tot")
            / F.col("n_tokens"),
            6,
        ).alias("epochs_needed"),
    )
