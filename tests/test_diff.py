"""Snapshot diff / change-data-feed (`Collection.diff`).

The reference has no CDC surface (diffing two pystore versions means
re-reading both into pandas); the engine derives the diff from the
manifest protocol: shared immutable files are pruned on the driver,
the row-level multiset difference runs only over private files.
"""

from __future__ import annotations

import pandas as pd
import pytest


def _changes(df):
    pdf = df.toPandas()
    return (
        pdf[pdf["_change"] == "insert"],
        pdf[pdf["_change"] == "delete"],
    )


def test_diff_append_only(test_collection, sample_data):
    test_collection.write("it", sample_data)
    test_collection.create_snapshot("s1")
    extra = pd.DataFrame(
        {"value1": [9.9, 8.8], "value2": [1.0, 2.0], "category": ["Z", "Z"]},
        index=pd.DatetimeIndex(["2030-01-01", "2030-01-02"]),
    )
    test_collection.append("it", extra)

    ins, dels = _changes(test_collection.diff("it", from_snapshot="s1"))
    assert len(dels) == 0
    assert len(ins) == 2
    assert sorted(ins["value1"].tolist()) == [8.8, 9.9]


def test_diff_upsert_changed_rows_only(test_collection, sample_data):
    test_collection.write("it", sample_data)
    test_collection.create_snapshot("s1")
    upd = sample_data.iloc[:5].copy()
    upd["value1"] = upd["value1"] + 1000.0
    test_collection.append("it", upd, duplicate_handling="keep_last")

    ins, dels = _changes(test_collection.diff("it", from_snapshot="s1"))
    # 5 old versions deleted, 5 new versions inserted — nothing else
    assert len(ins) == 5 and len(dels) == 5
    assert (ins["value1"] > 900).all()
    assert (dels["value1"] < 900).all()


def test_diff_between_two_snapshots_and_direction(test_collection, sample_data):
    test_collection.write("it", sample_data)
    test_collection.create_snapshot("a")
    extra = pd.DataFrame(
        {"value1": [7.7], "value2": [1.0], "category": ["Z"]},
        index=pd.DatetimeIndex(["2030-01-01"]),
    )
    test_collection.append("it", extra)
    test_collection.create_snapshot("b")

    ins, dels = _changes(
        test_collection.diff("it", from_snapshot="a", to_snapshot="b")
    )
    assert len(ins) == 1 and len(dels) == 0
    # reversed direction flips insert/delete
    ins_r, dels_r = _changes(
        test_collection.diff("it", from_snapshot="b", to_snapshot="a")
    )
    assert len(ins_r) == 0 and len(dels_r) == 1


def test_diff_identical_versions_is_empty(test_collection, sample_data):
    test_collection.write("it", sample_data)
    test_collection.create_snapshot("s1")
    out = test_collection.diff("it", from_snapshot="s1")
    assert out.count() == 0
    assert "_change" in out.columns


def test_diff_prunes_shared_files(test_collection):
    """The scan must touch only files private to one side — shared
    manifest entries are excluded before any I/O is scheduled."""
    # >10k rows triggers the bucketed time layout; the append then
    # touches only the final bucket
    idx = pd.date_range("2020-01-01", periods=12_000, freq="h")
    data = pd.DataFrame(
        {"value1": [float(i) for i in range(12_000)]}, index=idx
    )
    test_collection.write("it", data)
    test_collection.create_snapshot("s1")
    extra = pd.DataFrame(
        {"value1": [9.9]},
        index=pd.DatetimeIndex([idx[-1] + pd.Timedelta(hours=1)]),
    )
    test_collection.append("it", extra)

    from pystore_spark import manifest as mf, utils

    it_live = test_collection.item("it")
    man_live = utils.read_manifest(it_live._path)
    it_snap = test_collection.item("it", snapshot="s1")
    man_snap = utils.read_manifest(it_snap._path)
    base_live = mf.base_dir(it_live._path, man_live)
    base_snap = mf.base_dir(it_snap._path, man_snap)
    shared = {str(base_live / f) for f in man_live["files"]} & {
        str(base_snap / f) for f in man_snap["files"]
    }
    assert shared  # untouched buckets must be shared between versions

    scanned = set(test_collection.diff("it", from_snapshot="s1").inputFiles())
    assert not (scanned & shared)


def test_diff_across_schema_evolution(test_collection, sample_data):
    test_collection.write("it", sample_data)
    test_collection.enable_schema_evolution("it", "add_only")
    test_collection.create_snapshot("s1")
    extra = pd.DataFrame(
        {
            "value1": [9.9],
            "value2": [1.0],
            "category": ["Z"],
            "new_col": [42.0],
        },
        index=pd.DatetimeIndex(["2030-01-01"]),
    )
    test_collection.append("it", extra)

    out = test_collection.diff("it", from_snapshot="s1").toPandas()
    assert "new_col" in out.columns
    ins = out[out["_change"] == "insert"]
    dels = out[out["_change"] == "delete"]
    # the add_only evolution zero-fills the new numeric column on every
    # pre-existing row (F16 default fill), so the diff faithfully
    # reports a full rewrite: 100 deletes (no new_col) + 101 inserts
    assert len(ins) == len(sample_data) + 1
    assert len(dels) == len(sample_data)
    assert (ins["new_col"] == 42.0).sum() == 1
    assert dels["new_col"].isna().all()


def test_diff_missing_snapshot_raises(test_collection, sample_data):
    from pystore_spark.exceptions import SnapshotNotFoundError

    test_collection.write("it", sample_data)
    with pytest.raises(SnapshotNotFoundError):
        test_collection.diff("it", from_snapshot="nope")


def test_diff_reconstructs_target_version(test_collection):
    """CDC soundness: applying the diff to the *from* version must
    reproduce the *to* version as a multiset, across a random-ish
    sequence of appends and upserts."""
    import numpy as np

    rng = np.random.default_rng(3)
    idx = pd.date_range("2021-01-01", periods=11_000, freq="h")
    base = pd.DataFrame(
        {"v": rng.uniform(0, 10, len(idx)).round(6)}, index=idx
    )
    test_collection.write("it", base)
    test_collection.create_snapshot("v0")

    # mixed mutations: upsert a middle slice, append a tail, append
    # exact duplicates with keep_all
    upd = base.iloc[4000:4100].copy()
    upd["v"] = (upd["v"] + 5.0).round(6)
    test_collection.append("it", upd, duplicate_handling="keep_last")
    tail_idx = pd.date_range(
        idx[-1] + pd.Timedelta(hours=1), periods=50, freq="h"
    )
    test_collection.append(
        "it",
        pd.DataFrame({"v": np.linspace(0, 1, 50).round(6)}, index=tail_idx),
    )
    dup = base.iloc[100:110]
    test_collection.append("it", dup, duplicate_handling="keep_all")

    def multiset(pdf):
        from collections import Counter

        return Counter(
            (ts.isoformat(), float(v))
            for ts, v in zip(pdf["index"], pdf["v"])
        )

    from_pdf = test_collection.item("it", snapshot="v0").to_pandas().reset_index()
    to_pdf = test_collection.item("it").to_pandas().reset_index()
    d = test_collection.diff("it", from_snapshot="v0").toPandas()
    ins = multiset(d[d["_change"] == "insert"])
    dels = multiset(d[d["_change"] == "delete"])

    reconstructed = multiset(from_pdf)
    reconstructed.update(ins)
    reconstructed.subtract(dels)
    reconstructed = +reconstructed  # drop zero counts
    assert reconstructed == multiset(to_pdf)
    # and the diff is minimal on the upsert: changed rows only
    assert len(d) < 2 * (100 + 50 + 10) + 10
