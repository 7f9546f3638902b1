"""Partition-layout scale behavior: time-bucket pruning and
partition-scoped append (the 100 TB design points)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def _big_frame(start="2023-01-01", n=50_000, freq="10min"):
    return pd.DataFrame(
        {"value": np.arange(n, dtype="float64")},
        index=pd.date_range(start, periods=n, freq=freq),
    )


def _explain(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jdf.queryExecution().explainString(mode.fromString("formatted"))


def test_time_layout_written_as_hive_buckets(test_collection):
    test_collection.write("big", _big_frame())
    buckets = sorted(
        p.name for p in Path(test_collection.item("big").path).glob("_pb=*")
    )
    assert buckets[0] == "_pb=2023-01"
    assert len(buckets) == 12


def test_index_filter_prunes_partitions(test_collection):
    df = _big_frame()
    test_collection.write("big", df)
    it = test_collection.item(
        "big",
        filters=[
            ("index", ">=", pd.Timestamp("2023-11-01")),
            ("index", "<", pd.Timestamp("2023-12-01")),
        ],
    )
    plan = _explain(it.data)
    assert "PartitionFilters" in plan
    assert "_pb" in plan.split("PartitionFilters", 1)[1][:200]
    expected = int(
        ((df.index >= "2023-11-01") & (df.index < "2023-12-01")).sum()
    )
    assert it.data.count() == expected


def test_partition_scoped_append_touches_only_buckets(test_collection):
    test_collection.write("big", _big_frame())
    path = Path(test_collection.item("big").path)
    mtimes_before = {
        p.name: max(f.stat().st_mtime_ns for f in p.glob("*.parquet"))
        for p in path.glob("_pb=*")
    }
    # append into November only
    extra = pd.DataFrame(
        {"value": [1e6, 2e6]},
        index=pd.DatetimeIndex(["2023-11-05 00:00", "2023-11-06 00:00"]),
    )
    test_collection.append("big", extra)
    mtimes_after = {
        p.name: max(f.stat().st_mtime_ns for f in p.glob("*.parquet"))
        for p in path.glob("_pb=*")
    }
    changed = {
        b for b in mtimes_before if mtimes_after.get(b) != mtimes_before[b]
    }
    assert changed == {"_pb=2023-11"}
    out = test_collection.item(
        "big", filters=[("index", "==", pd.Timestamp("2023-11-05 00:00"))]
    ).to_pandas()
    assert out["value"].iloc[0] == 1e6


def test_small_item_stays_size_partitioned(test_collection):
    test_collection.write("small", _big_frame(n=100, freq="D"))
    path = Path(test_collection.item("small").path)
    assert not list(path.glob("_pb=*"))  # below the 10k-row threshold


def test_append_creates_new_bucket(test_collection):
    test_collection.write("big", _big_frame())  # 2023 monthly buckets
    extra = pd.DataFrame(
        {"value": [7.0]}, index=pd.DatetimeIndex(["2024-02-15"])
    )
    test_collection.append("big", extra)
    path = Path(test_collection.item("big").path)
    assert (path / "_pb=2024-02").exists()
    out = test_collection.item(
        "big", filters=[("index", ">=", pd.Timestamp("2024-01-01"))]
    ).to_pandas()
    assert len(out) == 1 and out["value"].iloc[0] == 7.0


def test_spark_input_custom_index_col(test_collection, spark):
    sdf = spark.range(5).selectExpr(
        "timestamp_seconds(1704067200 + id*86400) as ts", "id * 1.5 as v"
    )
    test_collection.write("spark_idx", sdf, index_col="ts")
    it = test_collection.item("spark_idx")
    assert it.index_column == "ts"
    # upsert keyed on ts
    sdf2 = spark.range(2).selectExpr(
        "timestamp_seconds(1704067200 + id*86400) as ts",
        "cast(999.0 + id as double) as v",
    )
    test_collection.append("spark_idx", sdf2, validate_schema=False)
    out = test_collection.item("spark_idx").data.orderBy("ts").collect()
    assert len(out) == 5
    assert float(out[0]["v"]) == 999.0  # keep_last: incoming wins on key 0
    assert float(out[1]["v"]) == 1000.0
    assert float(out[2]["v"]) == 3.0  # untouched keys keep original


def test_scan_report_reflects_driver_pruning(test_collection):
    test_collection.write("big", _big_frame())
    rep_all = test_collection.item("big").scan_report()
    assert rep_all["n_files_live"] == rep_all["n_files_selected"] >= 12
    assert rep_all["bytes_live"] == rep_all["bytes_selected"] > 0

    it = test_collection.item(
        "big",
        filters=[("index", ">=", pd.Timestamp("2023-11-01"))],
    )
    rep = it.scan_report()
    # Nov + Dec of a 12-month layout → ~2/12 of files and bytes
    assert rep["n_files_selected"] < rep["n_files_live"] / 3
    assert rep["bytes_selected"] < rep["bytes_live"] / 3
    # the derived _pb terms appear in the reported filters
    assert any(c == "_pb" for c, _, _ in rep["filters"])
    # report is driver-side only; the scan itself still returns the
    # right rows
    assert len(it.to_pandas()) == len(_big_frame().loc["2023-11-01":])
