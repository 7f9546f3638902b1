"""SparkSession factory with engine defaults.

Defaults chosen for correctness + scale:

* UTC session timezone → deterministic timestamp semantics (the
  reference normalizes tz-aware data to UTC at write:
  pystore/collection.py:365-370).
* AQE on → runtime shuffle-partition coalescing and skew-join
  handling at cluster scale.
* ``spark.sql.legacy.parquet.nanosAsLong`` → lets Spark scan Parquet
  TIMESTAMP(NANOS) columns (written by pandas/pyarrow ns data) as long
  nanoseconds, which the source layer converts to TimestampType.
  Without it the scan fails with PARQUET_TYPE_ILLEGAL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pystore_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        configure(active)
        return active
    master = master or os.environ.get(
        "SPARK_GRAFT_MASTER",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]",
    )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    spark = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally created
    session (the driver hands us its own SparkSession)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # static conf on some builds; best-effort
    return spark
