"""Driver-side Arrow fast path (arrow_path.py): engine routing,
mixed-engine layout compatibility, merge-semantics parity with the
Spark path, and the recover-before-merge append guarantee."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from pystore_spark import config
from pystore_spark.exceptions import DataIntegrityError


def _frame(n=100, start="2023-01-01", freq="h", v0=0.0):
    return pd.DataFrame(
        {"value": np.arange(n, dtype="float64") + v0,
         "tag": [f"t{i % 3}" for i in range(n)]},
        index=pd.date_range(start, periods=n, freq=freq),
    )


def _parquet_names(path):
    return sorted(f.name for f in Path(path).rglob("*.parquet"))


@pytest.fixture
def spark_only(monkeypatch):
    """Force every write/append through the Spark engine."""
    monkeypatch.setattr(config, "DRIVER_PATH_MAX_BYTES", 0)


import re

# staged file names are <committoken>-<writer name>; the Arrow writer
# names files part-<i>.parquet, Spark appends task uuid + codec
# segments — the name is how we know which engine ran
_ARROW_NAME = re.compile(r"[0-9a-f]{8}-part-\d{5}\.parquet")


def test_small_pandas_write_uses_arrow_engine(test_collection):
    test_collection.write("a", _frame())
    names = _parquet_names(test_collection.item("a").path)
    assert len(names) == 1 and _ARROW_NAME.fullmatch(names[0])


def test_big_estimate_falls_back_to_spark(test_collection, monkeypatch):
    monkeypatch.setattr(config, "DRIVER_PATH_MAX_BYTES", 1024)
    test_collection.write("a", _frame())
    names = _parquet_names(test_collection.item("a").path)
    assert not any(_ARROW_NAME.fullmatch(n) for n in names)
    out = test_collection.item("a").to_pandas()
    assert len(out) == 100


def test_mixed_engine_item_reads_identically(test_collection, spark):
    """Spark-written base + Arrow-path append must unify for BOTH
    readers (timestamp physical types must match across engines)."""
    base = _frame(20_000, freq="min")
    old = config.DRIVER_PATH_MAX_BYTES
    try:
        config.DRIVER_PATH_MAX_BYTES = 0
        test_collection.write("m", base)  # Spark engine
    finally:
        config.DRIVER_PATH_MAX_BYTES = old
    extra = _frame(10, start="2023-01-01", freq="min", v0=1000.0)
    test_collection.append("m", extra)  # Arrow engine (keep_last)

    it = test_collection.item("m")
    arrow_pdf = it.to_pandas(engine="arrow")
    spark_pdf = it.to_pandas(engine="spark")
    pd.testing.assert_frame_equal(arrow_pdf, spark_pdf)
    assert arrow_pdf.loc[pd.Timestamp("2023-01-01 00:00"), "value"] == 1000.0
    assert len(arrow_pdf) == 20_000


def test_arrow_append_matches_spark_append_semantics(
    test_collection, spark_only, spark
):
    """Run the same strategy matrix through the Spark engine and the
    Arrow engine; both must agree row-for-row."""
    results = {}
    for engine, thr in (("spark", 0), ("arrow", 256 << 20)):
        old = config.DRIVER_PATH_MAX_BYTES
        config.DRIVER_PATH_MAX_BYTES = thr
        try:
            for strat in ("keep_last", "keep_first", "keep_all"):
                name = f"{engine}_{strat}"
                test_collection.write(name, _frame(50))
                inc = _frame(30, start="2023-01-01", v0=500.0)
                # two in-frame duplicates of the first key: input order
                # is the tiebreaker
                inc = pd.concat(
                    [inc, _frame(1, start="2023-01-01", v0=900.0)]
                )
                test_collection.append(name, inc, duplicate_handling=strat)
                results[name] = (
                    test_collection.item(name)
                    .to_pandas()
                    .sort_values(["value"])
                    .sort_index(kind="stable")
                    .reset_index()
                )
        finally:
            config.DRIVER_PATH_MAX_BYTES = old
    for strat in ("keep_last", "keep_first", "keep_all"):
        pd.testing.assert_frame_equal(
            results[f"spark_{strat}"], results[f"arrow_{strat}"]
        )


def test_arrow_append_error_strategy(test_collection):
    test_collection.write("e", _frame(50))
    with pytest.raises(DataIntegrityError):
        test_collection.append(
            "e", _frame(5), duplicate_handling="error"
        )
    # non-overlapping appends pass
    test_collection.append(
        "e", _frame(5, start="2024-01-01"), duplicate_handling="error"
    )
    assert len(test_collection.item("e").to_pandas()) == 55


def _plant_orphan(path: Path) -> Path:
    """Simulate a crashed append: a staged file that never made it
    into the manifest — sitting INSIDE a live bucket dir, where the
    old directory-listing reader would have picked it up."""
    import shutil

    bucket = path / "_pb=2023-11"
    assert bucket.exists()
    src = next(bucket.glob("*.parquet"))
    orphan = bucket / "deadbeef-part-00000.parquet"
    shutil.copy2(src, orphan)
    return orphan


def _check_orphan_isolated(test_collection, df, monkeypatch):
    path = Path(test_collection.item("big").path)
    orphan = _plant_orphan(path)

    extra = pd.DataFrame(
        {"value": [1e6], "tag": ["t0"]},
        index=pd.DatetimeIndex(["2023-11-05 00:05:30"]),
    )
    test_collection.append("big", extra)
    out = test_collection.item("big").to_pandas()
    nov = out.loc["2023-11-01":"2023-11-30 23:59:59"]
    expected = df.loc["2023-11-01":"2023-11-30 23:59:59"]
    # the orphan's duplicate rows were NOT merged in (readers and the
    # merge resolve strictly through the manifest), and nothing from
    # the live bucket was lost
    assert len(nov) == len(expected) + 1
    assert nov["value"].max() == 1e6
    # aged orphans are garbage-collected at the next append's recovery
    monkeypatch.setattr(config, "ORPHAN_GRACE_SECONDS", 0.0)
    assert test_collection.recover_item("big") >= 1
    assert not orphan.exists()
    assert len(test_collection.item("big").to_pandas()) == len(out)


def test_append_ignores_crashed_staged_files(test_collection, monkeypatch):
    """A crash mid-append leaves staged-but-uncommitted files in live
    bucket dirs; they must be invisible to reads AND to the next
    append's merge (no duplicated rows), then GC'd once aged."""
    df = _frame(50_000, freq="10min")  # monthly buckets
    test_collection.write("big", df)
    _check_orphan_isolated(test_collection, df, monkeypatch)


def test_append_ignores_crashed_staged_files_spark_engine(
    test_collection, spark_only, monkeypatch
):
    df = _frame(50_000, freq="10min")
    test_collection.write("big", df)
    _check_orphan_isolated(test_collection, df, monkeypatch)


def test_arrow_write_time_layout_matches_spark_plan(test_collection):
    """Both engines must pick the same partition plan for the same
    frame (plan_from_stats is the shared core)."""
    df = _frame(20_000, freq="h")  # ~2.3y span → quarterly
    test_collection.write("t", df)
    plan = test_collection.item("t")._plan
    assert plan.kind == "time" and plan.freq == "Q"
    buckets = sorted(
        p.name for p in Path(test_collection.item("t").path).glob("_pb=*")
    )
    assert buckets[0] == "_pb=2023-Q1"


def test_arrow_append_creates_and_merges_buckets(test_collection):
    df = _frame(50_000, freq="10min")
    test_collection.write("b", df)
    path = Path(test_collection.item("b").path)
    before = {p.name for p in path.glob("_pb=*")}
    extra = pd.DataFrame(
        {"value": [5.0], "tag": ["t1"]},
        index=pd.DatetimeIndex(["2030-06-15"]),
    )
    test_collection.append("b", extra)
    after = {p.name for p in path.glob("_pb=*")}
    assert after - before == {"_pb=2030-06"}
    out = test_collection.item(
        "b", filters=[("index", ">=", pd.Timestamp("2030-01-01"))]
    ).to_pandas()
    assert len(out) == 1 and out["value"].iloc[0] == 5.0


def test_filters_on_arrow_written_timestamps(test_collection):
    """tz-aware µs storage + naive timestamp filter literals must work
    through both the Arrow dataset reader and the Spark reader."""
    df = _frame(200, freq="D")
    test_collection.write("f", df)
    flt = [("index", ">=", pd.Timestamp("2023-03-01")),
           ("index", "<", pd.Timestamp("2023-04-01"))]
    it = test_collection.item("f", filters=flt)
    via_arrow = it.to_pandas(engine="arrow")
    via_spark = it.to_pandas(engine="spark")
    expected = df.loc["2023-03-01":"2023-03-31 23:59:59"]
    assert len(via_arrow) == len(expected)
    pd.testing.assert_frame_equal(via_arrow, via_spark)


def test_write_append_sequence_across_threshold_boundary(test_collection):
    """Property: the SAME write/append sequence yields identical data
    and equivalent manifests no matter which side of
    DRIVER_PATH_MAX_BYTES each step lands on — just below, just above,
    and mixed per step (arrow_path gating must be a pure engine
    choice, never a semantic one)."""
    from pystore_spark import arrow_path, utils

    base = _frame(20_000, freq="10min")  # ~5 monthly buckets
    est = arrow_path.estimate_pandas_bytes(base)
    seq = [
        # overlap upsert into the first bucket (keep_last)
        ("append", _frame(100, start="2023-01-02", freq="min", v0=9000.0)),
        # brand-new future bucket
        ("append", _frame(50, start="2023-06-01", freq="min", v0=-5.0)),
        # in-frame duplicate keys: input order is the tiebreaker
        ("append", pd.concat([
            _frame(3, start="2023-06-01", freq="min", v0=111.0),
            _frame(1, start="2023-06-01", freq="min", v0=222.0),
        ])),
    ]
    scenarios = {
        # threshold per step: [write, append1, append2, append3]
        "all_arrow": [256 << 20] * 4,
        "all_spark": [0] * 4,
        "just_below_then_above": [est - 1, 256 << 20, 256 << 20, 0],
        "just_above_then_below": [est + est // 2, 0, 0, 256 << 20],
    }
    results, manifests = {}, {}
    old = config.DRIVER_PATH_MAX_BYTES
    try:
        for name, thresholds in scenarios.items():
            config.DRIVER_PATH_MAX_BYTES = thresholds[0]
            test_collection.write(name, base)
            for thr, (op, data) in zip(thresholds[1:], seq):
                config.DRIVER_PATH_MAX_BYTES = thr
                test_collection.append(name, data)
            results[name] = test_collection.item(name).to_pandas()
            manifests[name] = utils.read_manifest(
                test_collection.item(name)._path
            )
    finally:
        config.DRIVER_PATH_MAX_BYTES = old

    def buckets(man):
        return {f.rsplit("/", 1)[0] for f in man["files"] if "/" in f}

    ref_name = "all_arrow"
    ref = results[ref_name]
    ref_man = manifests[ref_name]
    ref_buckets = buckets(ref_man)
    assert len(ref_buckets) >= 4  # the layout really is time-bucketed
    for name, got in results.items():
        # byte-identical client view
        pd.testing.assert_frame_equal(got, ref, check_freq=False)
        man = manifests[name]
        # identical manifests modulo file names: same version history
        # length, same live bucket set, no stray stale entries beyond
        # the replaced buckets
        assert man["version"] == ref_man["version"], name
        assert buckets(man) == ref_buckets, name
