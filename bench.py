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
