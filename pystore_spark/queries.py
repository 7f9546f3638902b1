"""Named query registry: every SURVEY §2 operator (plus the
training-data-pipeline extensions) exposed as a (Spark DataFrame fn,
DuckDB oracle SQL) pair over the synthetic test tables.

Conventions that make the driver's order-insensitive value-hash robust:

* every computed column is aliased identically in Spark and SQL;
* money-style aggregates go through ``decimal(20,6)`` (exact,
  order-independent) and are cast to double at the end — identical
  bits regardless of partial-aggregation order;
* float expressions that can't be made exact are rounded to a fixed
  scale in both engines;
* ties in top-k queries are broken by a unique key column.

The Spark side is written scale-first: filters sit directly on scans
(pushdown), small dimensions are broadcast, aggregates are partial+
final hash aggs, and nothing collects to the driver.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from pystore_spark.sources import load_table


class QuerySpec(NamedTuple):
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: str | None
    tags: tuple[str, ...] = ()


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(fn, sql, tags)
        return fn

    return deco


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(20,6)")


# The events table ships TIMESTAMP(NANOS); both engines are normalized
# to µs. DuckDB truncates on read; Spark side is handled by
# sources.load_table. Oracle SQL can use `ts` directly.


# ---------------------------------------------------------------------------
# S2/S3/P1 — scans with pushdown + projection
# ---------------------------------------------------------------------------
@register(
    "scan_filter_pushdown",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1998-06-01'
      AND l_discount BETWEEN 0.02 AND 0.08
    """,
    tags=("scan", "S2", "P1"),
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.08)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "scan_projection",
    sql="SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
    tags=("scan", "S3"),
)
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# S4/A1/O3 — index-only scan, min/max
# ---------------------------------------------------------------------------
@register(
    "index_minmax",
    sql="""
    SELECT min(ts) AS ts_min, max(ts) AS ts_max, count(*) AS n_rows
    FROM events
    """,
    tags=("agg", "A1", "O3", "S4"),
)
def index_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "index_only_scan",
    sql="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n
    FROM events GROUP BY 1
    """,
    tags=("scan", "agg", "S4"),
)
def index_only_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# J1/J2/U2/U3 — anti/semi joins, key-set algebra (append dedup core)
# ---------------------------------------------------------------------------
@register(
    "dedup_anti_join",
    sql="""
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e
    WHERE e.event_id % 2 = 0
      AND NOT EXISTS (
        SELECT 1 FROM events x WHERE x.event_id % 3 = 0
          AND x.event_id = e.event_id)
    """,
    tags=("join", "J1", "U3", "P4"),
)
def dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    incoming = ev.filter(F.col("event_id") % 2 == 0)
    existing = ev.filter(F.col("event_id") % 3 == 0).select("event_id")
    return incoming.join(existing, on="event_id", how="left_anti").select(
        "event_id", "user_id", "event_type"
    )


@register(
    "overlap_semi_join",
    sql="""
    SELECT e.event_id, e.user_id
    FROM events e
    WHERE e.event_id % 2 = 0
      AND EXISTS (
        SELECT 1 FROM events x WHERE x.event_id % 3 = 0
          AND x.event_id = e.event_id)
    """,
    tags=("join", "J2"),
)
def overlap_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    incoming = ev.filter(F.col("event_id") % 2 == 0)
    existing = ev.filter(F.col("event_id") % 3 == 0).select("event_id")
    return incoming.join(existing, on="event_id", how="left_semi").select(
        "event_id", "user_id"
    )


@register(
    "intersect_keys",
    sql="""
    SELECT user_id FROM events WHERE event_id % 2 = 0
    INTERSECT
    SELECT user_id FROM events WHERE event_id % 2 = 1
    """,
    tags=("setop", "U2"),
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select("user_id")
    b = ev.filter(F.col("event_id") % 2 == 1).select("user_id")
    return a.intersect(b)


@register(
    "except_keys",
    sql="""
    SELECT user_id FROM events WHERE event_id % 2 = 0
    EXCEPT
    SELECT user_id FROM events WHERE event_id % 2 = 1
    """,
    tags=("setop", "U3"),
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select("user_id")
    b = ev.filter(F.col("event_id") % 2 == 1).select("user_id")
    return a.subtract(b)  # EXCEPT DISTINCT semantics, like SQL EXCEPT


# ---------------------------------------------------------------------------
# J3/P5/A10 — upsert keep_last / keep_first window dedup
# ---------------------------------------------------------------------------
@register(
    "upsert_keep_last",
    sql="""
    WITH unioned AS (
      SELECT event_id, user_id, value, 0 AS _src
      FROM events WHERE event_id < 800
      UNION ALL
      SELECT event_id, user_id, value * 2 AS value, 1 AS _src
      FROM events WHERE event_id >= 600
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY event_id ORDER BY _src DESC) AS _rn
      FROM unioned
    )
    SELECT event_id, user_id, ROUND(value, 6) AS value
    FROM ranked WHERE _rn = 1
    """,
    tags=("window", "J3", "A10"),
)
def upsert_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    old = ev.filter(F.col("event_id") < 800).select(
        "event_id", "user_id", "value", F.lit(0).alias("_src")
    )
    new = ev.filter(F.col("event_id") >= 600).select(
        "event_id", "user_id", (F.col("value") * 2).alias("value"),
        F.lit(1).alias("_src"),
    )
    w = Window.partitionBy("event_id").orderBy(F.col("_src").desc())
    return (
        old.unionByName(new)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "user_id", F.round("value", 6).alias("value"))
    )


@register(
    "keep_first_window_dedup",
    sql="""
    WITH ranked AS (
      SELECT event_id, user_id, ts, row_number() OVER (
        PARTITION BY user_id ORDER BY ts, event_id) AS _rn
      FROM events
    )
    SELECT event_id, user_id, ts AS first_ts FROM ranked WHERE _rn = 1
    """,
    tags=("window", "P5"),
)
def keep_first_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "user_id", F.col("ts").alias("first_ts"))
    )


# ---------------------------------------------------------------------------
# P2/P3/A4/A5/A6/A7/A9 — validation aggregates in one job
# ---------------------------------------------------------------------------
@register(
    "validation_aggregates",
    sql="""
    SELECT
      count(*) AS n_rows,
      CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_value,
      CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS below_zero,
      CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS above_50,
      count(user_id) - count(DISTINCT user_id) AS dup_user,
      count(DISTINCT event_type) AS n_event_types
    FROM events
    """,
    tags=("agg", "P2", "P3", "A4", "A5", "A6"),
)
def validation_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("null_value"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("below_zero"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("above_50"),
        (F.count("user_id") - F.count_distinct(F.col("user_id"))).alias("dup_user"),
        F.count_distinct(F.col("event_type")).alias("n_event_types"),
    )


@register(
    "monotonic_check",
    sql="""
    WITH lagged AS (
      SELECT ts, lag(ts) OVER (ORDER BY event_id) AS prev_ts FROM events
    )
    SELECT CAST(SUM(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) AS BIGINT)
      AS inversions
    FROM lagged
    """,
    tags=("window", "A7"),
)
def monotonic_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count inversions of ``ts`` in ``event_id`` order without a
    single-partition global window.

    Scale plan: range-partition on the order key so each task owns a
    contiguous, disjoint ``event_id`` range; sort locally; count
    intra-partition inversions in ONE streaming pass per partition
    (Arrow-batched, constant memory); then compare the per-partition
    boundary rows — a frame with one row per partition — with a tiny
    window.  Total cost: one range shuffle + a linear scan; no stage
    ever funnels the table through one task.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import kept local

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    parts = ev.repartitionByRange(n_parts, "event_id").sortWithinPartitions(
        "event_id"
    )
    ts_type = parts.schema["ts"].dataType.simpleString()

    def _per_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        first_ts = None
        prev_ts = None
        intra = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ts = pdf["ts"]
            if first_ts is None:
                first_ts = ts.iloc[0]
            # batch-boundary pair inside this partition
            if prev_ts is not None and pd.notna(prev_ts) and pd.notna(
                ts.iloc[0]
            ):
                intra += int(ts.iloc[0] < prev_ts)
            # vectorized consecutive-pair comparison within the batch;
            # NaT comparisons are False, matching SQL NULL semantics
            v = ts.to_numpy()
            if len(v) > 1:
                intra += int((v[1:] < v[:-1]).sum())
            prev_ts = ts.iloc[-1]
        if first_ts is not None:
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "first_ts": [first_ts],
                    "last_ts": [prev_ts],
                    "intra": [intra],
                }
            )

    per = parts.mapInPandas(
        _per_partition,
        schema=f"pid int, first_ts {ts_type}, last_ts {ts_type}, intra long",
    )
    # `per` has <= one row per partition — ordering it globally is cheap
    # at any scale (100k partitions -> 100k tiny rows).
    wb = Window.orderBy("pid")
    return (
        per.select(
            "intra",
            "first_ts",
            F.lag("last_ts").over(wb).alias("prev_last"),
        )
        .agg(
            (
                F.sum("intra")
                + F.sum(
                    F.when(F.col("first_ts") < F.col("prev_last"), 1).otherwise(
                        0
                    )
                )
            ).alias("inversions")
        )
    )


@register(
    "invariant_violations",
    sql="""
    SELECT
      CAST(SUM(CASE WHEN l_extendedprice < l_quantity THEN 1 ELSE 0 END)
        AS BIGINT) AS price_below_qty,
      CAST(SUM(CASE WHEN l_tax > l_discount THEN 1 ELSE 0 END) AS BIGINT)
        AS tax_gt_discount,
      CAST(SUM(CASE WHEN l_quantity < 0 OR l_extendedprice < 0
        THEN 1 ELSE 0 END) AS BIGINT) AS negatives
    FROM lineitem
    """,
    tags=("agg", "A9", "P6"),
)
def invariant_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum(
            F.when(F.col("l_extendedprice") < F.col("l_quantity"), 1).otherwise(0)
        ).alias("price_below_qty"),
        F.sum(
            F.when(F.col("l_tax") > F.col("l_discount"), 1).otherwise(0)
        ).alias("tax_gt_discount"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 0) | (F.col("l_extendedprice") < 0), 1
            ).otherwise(0)
        ).alias("negatives"),
    )


# ---------------------------------------------------------------------------
# O2 — deterministic head/tail
# ---------------------------------------------------------------------------
@register(
    "head_by_index",
    sql="""
    SELECT event_id, ts, value FROM events
    ORDER BY ts, event_id LIMIT 5
    """,
    tags=("sort", "O2"),
)
def head_by_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy("ts", "event_id").select("event_id", "ts", "value").limit(5)


@register(
    "tail_by_index",
    sql="""
    SELECT event_id, ts, value FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 5
    """,
    tags=("sort", "O2"),
)
def tail_by_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .select("event_id", "ts", "value")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# U1 — evolved-schema union
# ---------------------------------------------------------------------------
@register(
    "union_evolved_schema",
    sql="""
    SELECT event_id, user_id, value, CAST(NULL AS VARCHAR) AS event_type
    FROM events WHERE event_id % 5 = 0
    UNION ALL
    SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value, event_type
    FROM events WHERE event_id % 5 = 1
    """,
    tags=("setop", "U1", "C7"),
)
def union_evolved_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 5 == 0).select("event_id", "user_id", "value")
    b = ev.filter(F.col("event_id") % 5 == 1).select(
        "event_id", "user_id", "event_type"
    )
    return a.unionByName(b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# F1/F2 — epoch casts; F7 — JSON decode; F16/F15 — evolve projection
# ---------------------------------------------------------------------------
@register(
    "epoch_roundtrip",
    sql="""
    SELECT event_id,
           epoch_us(ts) AS epoch_us,
           make_timestamp((epoch_us(ts) // 1000000) * 1000000)
             AS ts_seconds
    FROM events WHERE event_id % 10 = 0
    """,
    tags=("scalar", "F1", "F2"),
)
def epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 10 == 0).select(
        "event_id",
        F.unix_micros("ts").alias("epoch_us"),
        F.timestamp_seconds(
            F.floor(F.unix_micros("ts") / 1_000_000).cast("long")
        ).alias("ts_seconds"),
    )


@register(
    "json_extract_props",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    tags=("scalar", "F7"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_id", k.alias("k_value"))
        .filter(F.col("k_value") > 50)
    )


@register(
    "schema_evolve_projection",
    sql="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(0.0 AS DOUBLE) AS adjustment,
           CAST(NULL AS VARCHAR) AS note,
           CAST(l_quantity AS VARCHAR) AS l_quantity_str
    FROM lineitem WHERE l_orderkey % 7 = 0
    """,
    tags=("schema", "C4", "F15", "F16"),
)
def schema_evolve_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 7 == 0).select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.lit(0.0).cast("double").alias("adjustment"),
        F.lit(None).cast("string").alias("note"),
        F.col("l_quantity").cast("string").alias("l_quantity_str"),
    )


# ---------------------------------------------------------------------------
# date bucketing (partition planner semantics: F10/§4 time partitioning)
# ---------------------------------------------------------------------------
@register(
    "time_bucket_agg",
    sql="""
    SELECT strftime(ts, '%Y-%m') AS month,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
    tags=("agg", "partition"),
)
def time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_format("ts", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# window analytics surface (§2.5 extension)
# ---------------------------------------------------------------------------
@register(
    "running_sum_per_user",
    sql="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events WHERE user_id < 20
    """,
    tags=("window",),
)
def running_sum_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.filter(F.col("user_id") < 20).select(
        "event_id",
        "user_id",
        F.sum(_dec("value")).over(w).cast("double").alias("running_value"),
    )


# ---------------------------------------------------------------------------
# as-of join (custom operator the reference lacks; union+window plan)
# ---------------------------------------------------------------------------
@register(
    "asof_join_orders_events",
    sql="""
    SELECT o.o_orderkey, o.o_custkey,
      (SELECT max(e.ts) FROM events e
        WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate) AS last_event_ts
    FROM orders o
    WHERE o.o_orderkey % 11 = 0
    """,
    tags=("join", "asof"),
)
def asof_join_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed as-of join: union both sides tagged, single window
    pass per key — no per-row subquery, one shuffle on the key.
    Delegates to the public operator (functions/joins.asof_join),
    which generalizes this plan to any frames, multiple carried
    columns, forward direction, tolerance, and exact-match control."""
    from pystore_spark.functions.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 11 == 0
    )
    return asof_join(
        od.select("o_orderkey", "o_custkey", "o_orderdate"),
        ev.select("user_id", "ts"),
        on="o_orderdate",
        by=["o_custkey"],
        right_by=["user_id"],
        right_on="ts",
        values=[],
        right_time_as="last_event_ts",
    ).select("o_orderkey", "o_custkey", "last_event_ts")


# ---------------------------------------------------------------------------
# TPC-H-style relational analytics (flagship + joins)
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
        AS sum_base_price,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))
               * CAST(1 - l_discount AS DECIMAL(20,6))) AS DOUBLE), 4)
        AS sum_disc_price,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))
               * CAST(1 - l_discount AS DECIMAL(20,6))
               * CAST(1 + l_tax AS DECIMAL(20,6))) AS DOUBLE), 4)
        AS sum_charge,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (the flagship query)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast("decimal(20,6)") - _dec("l_discount")
    tax = F.lit(1).cast("decimal(20,6)") + _dec("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(_dec("l_extendedprice") * disc).cast("double"), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(_dec("l_extendedprice") * disc * tax).cast("double"), 4
            ).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "revenue_by_nation",
    sql="""
    SELECT n.n_name,
      ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,6))
               * CAST(1 - l.l_discount AS DECIMAL(20,6))) AS DOUBLE), 4)
        AS revenue,
      count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join", "agg"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact lineitem joins broadcast dimensions (customer/
    nation are tiny vs lineitem at every SF — explicit broadcast keeps
    the plan shuffle-free on the dimension side at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(20,6)") - _dec("l_discount")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "top_orders_by_revenue",
    sql="""
    SELECT o.o_orderkey, o.o_orderdate,
      ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,6))
               * CAST(1 - l.l_discount AS DECIMAL(20,6))) AS DOUBLE), 4)
        AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(20,6)") - _dec("l_discount")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "region_part_supplier",
    sql="""
    SELECT r.r_name, p.p_brand,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS total_qty,
      count(DISTINCT s.s_suppkey) AS n_suppliers
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY r.r_name, p.p_brand
    """,
    tags=("join", "agg"),
)
def region_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    pa = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("r_name", "p_brand")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("total_qty"),
            F.count_distinct(F.col("s_suppkey")).alias("n_suppliers"),
        )
    )


@register(
    "customer_order_distribution",
    sql="""
    WITH per_cust AS (
      SELECT c.c_custkey,
             CAST(COALESCE(n.n, 0) AS BIGINT) AS n_orders
      FROM customer c LEFT JOIN (
        SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) n
        ON c.c_custkey = n.o_custkey)
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
    tags=("join", "outer", "agg"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count histogram over ALL customers (TPC-H Q13 shape).

    Orders are pre-aggregated per custkey BEFORE the outer join, so
    the join's right side is one row per customer key (bounded by
    |customer|, broadcast-able at dimension scale) instead of the full
    orders fact — the O(|orders|) shuffle happens once, map-side
    combined, and never moves order payload columns."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    per_key = od.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    per_cust = cu.join(
        per_key, cu.c_custkey == per_key.o_custkey, "left"
    ).select(F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"))
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "top_supplier_revenue",
    sql="""
    WITH rev AS (
      SELECT l_suppkey,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))
                 * CAST(1 - l_discount AS DECIMAL(20,6))) AS DOUBLE), 4)
          AS total_rev
      FROM lineitem
      WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    tags=("join", "agg", "subquery"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-per-group join-back (TPC-H Q15 shape): quarterly revenue
    per supplier, return the top supplier(s) with ties. The scalar max
    is a one-row broadcast joined back against the per-supplier aggs —
    no window over the full aggregate, no driver round-trip; decimal
    intermediates keep the tie comparison exact at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    su = load_table(spark, sf_dir, "supplier")
    rev_expr = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(20,6)") - _dec("l_discount")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(rev_expr).cast("double"), 4).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "waiting_customers_antijoin",
    sql="""
    WITH s AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS tot,
             CAST(count(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0)
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c, s
    WHERE CAST(c.c_acctbal AS DECIMAL(20,6)) * s.n > s.tot
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("antijoin", "subquery"),
)
def waiting_customers_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery + anti-join (TPC-H Q22 shape): customers with
    above-average positive balance and no orders. The average test is
    rewritten multiplication-only (bal·n > total) in exact decimal —
    no engine-dependent division rounding on the threshold. The global
    (sum, count) is a one-row broadcast; the no-orders test is a
    left-anti shuffle join on custkey (near-unique key — no skew)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    s = cu.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("tot"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        cu.crossJoin(F.broadcast(s))
        .filter(_dec("c_acctbal") * F.col("n") > F.col("tot"))
        .join(od, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
    )


@register(
    "moving_avg_events",
    sql="""
    SELECT event_id, user_id,
      ROUND(AVG(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg
    FROM events WHERE value IS NOT NULL
    """,
    tags=("window", "frame"),
)
def moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame moving average per user (3-row window). One
    shuffle on user_id; the frame stays ≤3 elements so both engines
    sum in the same effective order and round-6 hashes match."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("mavg"),
    )


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {
        name: spec.oracle_sql
        for name, spec in QUERIES.items()
        if spec.oracle_sql is not None
    }


# extension queries (text/dedup/similarity) register themselves on import
from pystore_spark import queries_ext  # noqa: E402,F401  isort:skip
