"""Z-order (Morton) clustering: multi-dimensional file pruning.

A linearly sorted layout gives tight parquet footer stats only for the
leading sort column — every file spans the full range of the others,
so a predicate on a secondary dimension can skip nothing. Z-ordering
interleaves the dimensions' bits, giving every clustered column
locally tight min/max in each file. These tests measure that directly
from the parquet footers (deterministic — no Spark timing involved).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pystore_spark import manifest as mf, utils


def _file_ranges(collection, item, col):
    """(min, max) of ``col`` per live parquet file, from the footers."""
    it = collection.item(item)
    man = utils.read_manifest(it._path)
    base = mf.base_dir(it._path, man)
    out = []
    for rel in man["files"]:
        meta = pq.read_metadata(str(base / rel))
        schema_idx = meta.schema.names.index(col)
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(schema_idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def _files_overlapping(ranges, lo, hi):
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def _grid_data(n=20_000):
    rng = np.random.default_rng(7)
    idx = pd.date_range("2024-01-01", periods=n, freq="min")
    return pd.DataFrame(
        {
            "x": rng.uniform(0, 1000, n),
            "y": rng.uniform(0, 1000, n),
        },
        index=idx,
    )


N_FILES = 16


def test_zorder_prunes_both_dimensions(test_collection):
    test_collection.write("it", _grid_data())
    n = test_collection.rebalance_partitions(
        "it", zorder=["x", "y"], npartitions=N_FILES
    )
    assert n == N_FILES

    rx = _file_ranges(test_collection, "it", "x")
    ry = _file_ranges(test_collection, "it", "y")
    assert len(rx) == N_FILES

    # locality metric: per-file range width. The control layout spans
    # ~the full 1000-unit range in every file on both dims; the Morton
    # layout keeps each dimension locally tight (range-boundary files
    # that straddle the curve's midline stay wide, hence mean not max)
    for ranges in (rx, ry):
        widths = [b - a for a, b in ranges]
        assert sum(widths) / len(widths) < 600.0

    # and the operational consequence: a 10%-wide slab on EITHER
    # dimension skips files (the control prunes nothing — see below)
    for ranges in (rx, ry):
        for lo, hi in ((100.0, 200.0), (450.0, 550.0), (700.0, 800.0)):
            assert _files_overlapping(ranges, lo, hi) <= 12


def test_linear_sort_cannot_prune_secondary_dimension(test_collection):
    """Control: the default index-sorted layout leaves y unprunable —
    the property z-ordering exists to fix."""
    test_collection.write("it", _grid_data())
    test_collection.rebalance_partitions(
        "it", time_based=False, npartitions=N_FILES
    )
    ry = _file_ranges(test_collection, "it", "y")
    assert len(ry) == N_FILES
    # every index-sorted file spans (almost) the full y range
    assert _files_overlapping(ry, 450.0, 550.0) == N_FILES


def test_zorder_roundtrip_preserves_rows(test_collection):
    data = _grid_data(5_000)
    test_collection.write("it", data)
    test_collection.rebalance_partitions(
        "it", zorder=["x", "y"], npartitions=4
    )
    out = test_collection.item("it").to_pandas()
    assert len(out) == len(data)
    assert np.isclose(out["x"].sum(), data["x"].sum())
    assert sorted(out.index) == sorted(data.index)
    meta = test_collection.get_item_metadata("it")
    assert meta["_partition_strategy"] == "zorder"
    assert meta["_zorder_columns"] == ["x", "y"]


def test_zorder_rejects_strings_and_overflow(test_collection):
    import pytest

    test_collection.write(
        "it",
        pd.DataFrame(
            {"x": [1.0, 2.0], "s": ["a", "b"]},
            index=pd.DatetimeIndex(["2024-01-01", "2024-01-02"]),
        ),
    )
    with pytest.raises(ValueError, match="non-orderable-numeric"):
        test_collection.rebalance_partitions("it", zorder=["x", "s"])

    from pystore_spark.partition import zorder_value

    df = test_collection.item("it").data
    with pytest.raises(ValueError, match="overflows"):
        zorder_value(df, ["x"] * 5, bits=16)


def test_linear_rebalance_clears_zorder_metadata(test_collection):
    test_collection.write("it", _grid_data(3_000))
    test_collection.rebalance_partitions("it", zorder=["x", "y"], npartitions=4)
    assert test_collection.get_item_metadata("it")["_zorder_columns"] == [
        "x", "y"
    ]
    test_collection.rebalance_partitions("it", time_based=False, npartitions=2)
    meta = test_collection.get_item_metadata("it")
    assert "_zorder_columns" not in meta
    assert meta["_partition_strategy"] != "zorder"


def test_zonemap_recorded_and_prunes_driver_side(test_collection):
    """The zorder commit records per-file min/max in the manifest, and
    a filtered read prunes FILES on the driver — the scan never
    schedules I/O for files whose range can't match."""
    test_collection.write("it", _grid_data())
    test_collection.rebalance_partitions(
        "it", zorder=["x", "y"], npartitions=N_FILES
    )
    man = utils.read_manifest(test_collection.item("it")._path)
    assert man.get("stats"), "zonemap stats missing from manifest"
    assert all(
        set(st) == {"x", "y"} for st in man["stats"].values()
    )

    # point-ish predicate on y (the NON-leading dimension)
    it = test_collection.item("it", filters=[("y", ">=", 480.0), ("y", "<=", 520.0)])
    scanned = it.data.inputFiles()
    assert 0 < len(scanned) < N_FILES, (
        f"zonemap should prune files: scanned {len(scanned)}/{N_FILES}"
    )

    # correctness: pruned read == full read filtered in pandas
    got = it.to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    full = test_collection.item("it").to_pandas()
    want = (
        full[(full["y"] >= 480.0) & (full["y"] <= 520.0)]
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_zonemap_survives_append_and_metadata_update(test_collection):
    data = _grid_data(12_000)
    test_collection.write("it", data)
    test_collection.rebalance_partitions(
        "it", zorder=["x", "y"], npartitions=8
    )
    # metadata-only update must not drop the zonemap
    test_collection.update_metadata("it", {"note": "hello"}) if hasattr(
        test_collection, "update_metadata"
    ) else None
    man = utils.read_manifest(test_collection.item("it")._path)
    n_stats = len(man.get("stats") or {})
    assert n_stats == 8


def test_prune_files_range_logic():
    from pystore_spark.manifest import prune_files

    files = ["a.parquet", "b.parquet", "c.parquet"]
    stats = {
        "a.parquet": {"x": [0.0, 10.0]},
        "b.parquet": {"x": [10.0, 20.0]},
        # c has no stats → never pruned on x
    }
    assert prune_files(files, [("x", ">", 15.0)], stats) == [
        "b.parquet", "c.parquet"
    ]
    assert prune_files(files, [("x", "==", 5.0)], stats) == [
        "a.parquet", "c.parquet"
    ]
    assert prune_files(files, [("x", "in", [3.0, 4.0])], stats) == [
        "a.parquet", "c.parquet"
    ]
    # OR of two groups keeps the union
    assert prune_files(
        files, [[("x", "<", 5.0)], [("x", ">", 18.0)]], stats
    ) == ["a.parquet", "b.parquet", "c.parquet"]
    # string filter on numeric stats is conservative (no prune)
    assert prune_files(files, [("x", "==", "oops")], stats) == files
    # prune-to-zero falls back to the full list (schema safety)
    assert prune_files(files[:2], [("x", ">", 100.0)], stats) == files[:2]


def test_write_zonemap_param_and_append_maintains_it(test_collection):
    """zonemap= on write records stats from the first commit and every
    later append (the sidecar rides in item metadata)."""
    idx = pd.date_range("2020-01-01", periods=12_000, freq="h")
    data = pd.DataFrame(
        {"x": np.linspace(0.0, 1000.0, 12_000)}, index=idx
    )
    test_collection.write("it", data, zonemap=["x"])
    man = utils.read_manifest(test_collection.item("it")._path)
    assert man.get("stats") and all("x" in s for s in man["stats"].values())

    extra = pd.DataFrame(
        {"x": [2000.0]},
        index=pd.DatetimeIndex([idx[-1] + pd.Timedelta(hours=1)]),
    )
    test_collection.append("it", extra)
    man2 = utils.read_manifest(test_collection.item("it")._path)
    # the appended bucket's new file must carry stats too
    assert len(man2["stats"]) == len(man2["files"])
    # and the linearly increasing x means a selective filter prunes
    it = test_collection.item("it", filters=[("x", ">=", 1500.0)])
    assert len(it.data.inputFiles()) < len(man2["files"])
    assert it.to_pandas()["x"].tolist() == [2000.0]


def test_set_zonemap_backfills_without_rewrite(test_collection):
    """ALTER-style late enable: stats appear from footer scans only —
    no data file is rewritten — and reads prune; disable drops them."""
    idx = pd.date_range("2020-01-01", periods=12_000, freq="h")
    data = pd.DataFrame(
        {"x": np.linspace(0.0, 1000.0, 12_000)}, index=idx
    )
    test_collection.write("late", data)  # NO zonemap at write time
    item_path = test_collection.item("late")._path
    man0 = utils.read_manifest(item_path)
    assert not man0.get("stats")
    files_before = set(man0["files"])
    import os

    mtimes_before = {
        f: os.stat(item_path / f).st_mtime_ns for f in files_before
    }

    stats = test_collection.set_zonemap("late", ["x"])
    assert stats and all("x" in s for s in stats.values())
    man1 = utils.read_manifest(item_path)
    assert man1["version"] == man0["version"] + 1
    assert set(man1["files"]) == files_before  # no rewrite...
    assert {
        f: os.stat(item_path / f).st_mtime_ns for f in files_before
    } == mtimes_before  # ...and no data file even touched
    assert man1["metadata"]["_zonemap_columns"] == ["x"]
    assert len(man1["stats"]) == len(files_before)

    # backfilled stats prune a selective read (linear x across buckets)
    it = test_collection.item("late", filters=[("x", ">=", 990.0)])
    assert len(it.data.inputFiles()) < len(files_before)
    want = data[data["x"] >= 990.0]
    assert len(it.to_pandas()) == len(want)

    # appends after the late enable keep maintaining stats
    extra = pd.DataFrame(
        {"x": [2000.0]},
        index=pd.DatetimeIndex([idx[-1] + pd.Timedelta(hours=1)]),
    )
    test_collection.append("late", extra)
    man2 = utils.read_manifest(item_path)
    assert len(man2["stats"]) == len(man2["files"])

    # disable drops stats and the sidecar marker
    assert test_collection.set_zonemap("late", None) == {}
    man3 = utils.read_manifest(item_path)
    assert "stats" not in man3
    assert "_zonemap_columns" not in man3["metadata"]
    # reads still correct, just unpruned
    assert len(
        test_collection.item("late", filters=[("x", ">=", 990.0)]).to_pandas()
    ) == len(want) + 1


def test_scan_report_quantifies_zorder_payoff(test_collection):
    """End-to-end integration of the layout-optimization loop:
    rebalance(zorder) records zonemap stats → a 2-D selective
    predicate's scan_report shows most files skipped before Spark
    schedules anything — the observability surface a layout decision
    is judged by."""
    test_collection.write("zs", _grid_data())
    test_collection.rebalance_partitions(
        "zs", zorder=["x", "y"], npartitions=N_FILES
    )
    it = test_collection.item(
        "zs",
        filters=[("x", ">=", 100.0), ("x", "<", 200.0),
                 ("y", ">=", 400.0), ("y", "<", 500.0)],
    )
    rep = it.scan_report()
    assert rep["n_files_live"] == N_FILES
    # a 1% selectivity box on a 16-file z-ordered grid must skip
    # most files (4x4 Morton tiling → ~2-4 files overlap)
    assert rep["n_files_selected"] <= N_FILES / 2
    assert 0 < rep["bytes_selected"] < rep["bytes_live"]
    # and the scan itself returns exactly the box
    out = it.to_pandas()
    assert ((out["x"] >= 100) & (out["x"] < 200)).all()
    assert ((out["y"] >= 400) & (out["y"] < 500)).all()


def test_zorder_layout_is_deterministic(test_collection):
    """Same data → byte-identical file boundaries on every run: the
    router derives boundaries from an exact histogram + hash-preimage
    routing (partition.zorder_route), not sampled range exchange —
    so the pruning guarantees above cannot flake under machine load."""
    data = _grid_data(8_000)
    test_collection.write("a", data)
    test_collection.write("b", data)
    for it in ("a", "b"):
        test_collection.rebalance_partitions(it, zorder=["x", "y"], npartitions=8)
    ra = sorted(_file_ranges(test_collection, "a", "x"))
    rb = sorted(_file_ranges(test_collection, "b", "x"))
    assert ra == rb
    # and re-running the rewrite on the same item reproduces it too
    test_collection.rebalance_partitions("a", zorder=["x", "y"], npartitions=8)
    assert sorted(_file_ranges(test_collection, "a", "x")) == ra


def test_exact_route_ids_are_exact():
    from pyspark.sql import SparkSession

    from pystore_spark.partition import exact_route_ids

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    for n in (1, 2, 7, 16):
        ids = exact_route_ids(spark, n)
        assert len(ids) == n
        got = (
            spark.createDataFrame([(i,) for i in ids], "r long")
            .select(F.pmod(F.hash("r"), F.lit(n)).alias("p"), "r")
            .collect()
        )
        assert sorted(int(r["p"]) for r in got) == list(range(n))
