"""Measure the bucketed co-located join against the plain shuffle join.

Writes orders+lineitem (sf dir from argv, default sf0.1) twice — plain
items and co-bucketed on the order key — then times the same fact-fact
join+aggregate over both, min-of-3, broadcast disabled so the plain
path really shuffles. Also reports the one-time bucketed write cost
(the price paid once for every downstream join on that key) and the
Exchange counts of both executed plans. Emits ONE JSON line; the
driver-facing artifact is BENCH_COLOCATED.json.

Usage: python tools/colocated_scale.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    import os

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.sources import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .appName("colocated_scale")
        .getOrCreate()
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice", "l_discount",
    )
    tmp = tempfile.mkdtemp(prefix="ps_coloc_scale_")
    cfg.set_path(tmp)
    store = ps.store("s", spark=spark)
    col = store.collection("c")

    t0 = time.perf_counter()
    col.write("orders_p", orders, index_col="o_orderkey")
    col.write("li_p", li, index_col="o_orderkey")
    plain_write_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    col.write(
        "orders_b", orders, bucket_by="o_orderkey",
        n_buckets=N_BUCKETS, index_col="o_orderkey",
    )
    col.write(
        "li_b", li, bucket_by="o_orderkey",
        n_buckets=N_BUCKETS, index_col="o_orderkey",
    )
    bucketed_write_s = time.perf_counter() - t0

    def joined(suffix: str):
        return (
            col.item(f"orders_{suffix}").data
            .join(col.item(f"li_{suffix}").data, "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(
                    (
                        F.col("l_extendedprice")
                        * (F.lit(1) - F.col("l_discount"))
                    ).cast("decimal(20,6)")
                ).alias("revenue"),
            )
        )

    def exchanges(df) -> int:
        return (
            df._jdf.queryExecution().executedPlan().toString()
            .count("Exchange")
        )

    def best_of(fn, n=3) -> float:
        fn()  # warm
        return min(
            (lambda t0: (fn(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(n)
        )

    plain_s = best_of(lambda: joined("p").collect())
    bucketed_s = best_of(lambda: joined("b").collect())
    out = {
        "metric": "colocated_join_vs_plain",
        "sf_dir": SF_DIR,
        "n_buckets": N_BUCKETS,
        "plain_join_s": round(plain_s, 4),
        "bucketed_join_s": round(bucketed_s, 4),
        "speedup": round(plain_s / bucketed_s, 3) if bucketed_s else None,
        "plain_exchanges": exchanges(joined("p")),
        "bucketed_exchanges": exchanges(joined("b")),
        "plain_write_s": round(plain_write_s, 4),
        "bucketed_write_s": round(bucketed_write_s, 4),
        "note": (
            "bucketed_exchanges counts only the final groupBy "
            "exchange; the join itself is exchange-free. The write "
            "premium is paid once per item, the shuffle saving on "
            "every downstream join."
        ),
    }
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
