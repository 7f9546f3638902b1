"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry from
``pystore_spark.queries`` (one entry per implemented SURVEY §2
operator, DuckDB-oracle checked at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pystore_spark.queries import QUERIES
    from pystore_spark.session import configure

    configure(spark)
    return QUERIES["pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pystore_spark.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from pystore_spark.queries import get_oracles

    return get_oracles()
