"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is fully materialized via the no-op sink (measures compute
+ scan, not driver collection). First a warmup pass on a small query
amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_QUERIES = [
    "scan_filter_pushdown",
    "scan_projection",
    "index_minmax",
    "dedup_anti_join",
    "upsert_keep_last",
    "keep_first_window_dedup",
    "validation_aggregates",
    "time_bucket_agg",
    "running_sum_per_user",
    "asof_join_orders_events",
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_by_revenue",
    "region_part_supplier",
    "forecast_revenue_delta",
    "top3_events_per_user",
    "sessionization",
    # training-data-pipeline ops (linear cost)
    "text_quality_scores",
    "doc_fingerprints",
    "exact_dedup_groups",
    "minhash_signatures",
    "lsh_band_stats",
    "simhash_fingerprints",
    "embedding_cosine_topk",
    "ann_ivf_label_topk",
]


def _storage_bench(spark, sf_dir: str) -> float:
    """Engine storage path at benchmark scale: write the lineitem fact
    as a time-keyed item, upsert a 10% slice, filtered+projected read
    back (the reference's headline claims are about this path —
    append throughput, pushdown reads)."""
    import shutil
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from pystore_spark import config
    from pystore_spark.sources import load_table
    from pystore_spark.store import Store

    tmp = tempfile.mkdtemp(prefix="pystore_bench_")
    old_path = config._path
    try:
        config._path = tmp
        col = Store("bench", spark=spark).collection("c")
        # unique time index: shipdate + a sub-second offset from the
        # unique (orderkey, linenumber) pair, so keep_last is a true
        # row-level upsert rather than a date-level collapse
        li = load_table(spark, sf_dir, "lineitem").withColumn(
            "index",
            F.expr(
                "timestamp_micros(unix_micros(cast(l_shipdate as timestamp))"
                " + l_orderkey * 10 + l_linenumber)"
            ),
        ).drop("l_shipdate")
        t0 = _t.perf_counter()
        col.write("fact", li)
        upd = li.filter(F.col("l_orderkey") % 10 == 0).withColumn(
            "l_quantity", F.col("l_quantity") + 1
        )
        col.append("fact", upd, duplicate_handling="keep_last")
        col.item(
            "fact",
            filters=[("l_returnflag", "==", "R")],
            columns=["l_quantity", "l_extendedprice"],
        ).data.write.mode("overwrite").format("noop").save()
        return _t.perf_counter() - t0
    finally:
        config._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pystore_spark.queries import QUERIES
    from pystore_spark.session import get_spark

    spark = get_spark(app_name="pystore_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches
    QUERIES["index_minmax"].spark_fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        spec = QUERIES.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    timings["storage_write_append_read"] = round(
        _storage_bench(spark, sf_dir), 4
    )

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
