"""Phase-by-phase profile of bench.py's _storage_bench at sf0.1."""
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pystore_spark import config
from pystore_spark.session import get_spark
from pystore_spark.sources import load_table
from pystore_spark.store import Store

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile_storage")
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="pystore_prof_")
old = config._path
try:
    config._path = tmp
    col = Store("bench", spark=spark).collection("c")
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "index",
        F.expr(
            "timestamp_micros(unix_micros(cast(l_shipdate as timestamp))"
            " + l_orderkey * 10 + l_linenumber)"
        ),
    ).drop("l_shipdate")
    warm = li.filter(F.col("l_orderkey") % 100 == 0)
    col.write("warmup", warm)
    col.append("warmup", warm.limit(1000), duplicate_handling="keep_last")
    col.item("warmup").data.write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    col.write("fact", li)
    t1 = time.perf_counter()
    print(f"write: {t1-t0:.3f}s", flush=True)
    it = col.item("fact")
    print("plan:", it._plan.to_dict())
    nbuckets = len(list(Path(it.path).glob("_pb=*")))
    nfiles = len(list(Path(it.path).rglob("*.parquet")))
    print(f"buckets={nbuckets} files={nfiles}")

    upd = li.filter(F.col("l_orderkey") % 10 == 0).withColumn(
        "l_quantity", F.col("l_quantity") + 1
    )
    t2 = time.perf_counter()
    col.append("fact", upd, duplicate_handling="keep_last")
    t3 = time.perf_counter()
    print(f"append: {t3-t2:.3f}s", flush=True)

    col.item(
        "fact",
        filters=[("l_returnflag", "==", "R")],
        columns=["l_quantity", "l_extendedprice"],
    ).data.write.mode("overwrite").format("noop").save()
    t4 = time.perf_counter()
    print(f"read: {t4-t3:.3f}s", flush=True)
    print(f"total: {t4-t0:.3f}s")
finally:
    config._path = old
    shutil.rmtree(tmp, ignore_errors=True)
