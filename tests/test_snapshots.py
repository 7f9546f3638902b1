"""Snapshot semantics (reference spec: tests/test_snapshots.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from pystore_spark.exceptions import SnapshotNotFoundError


def test_snapshot_point_in_time(test_collection, sample_data):
    test_collection.write("it", sample_data)
    snap = test_collection.create_snapshot("before_change")
    assert snap == "before_change"

    extra = pd.DataFrame(
        {"value1": [9.9], "value2": [1.0], "category": ["Z"]},
        index=pd.DatetimeIndex(["2030-01-01"]),
    )
    test_collection.append("it", extra)

    live = test_collection.item("it").to_pandas()
    old = test_collection.item("it", snapshot="before_change").to_pandas()
    assert len(live) == len(sample_data) + 1
    assert len(old) == len(sample_data)


def test_snapshot_survives_item_rewrite(test_collection, sample_data):
    """Hard-linked snapshots must survive atomic rewrites (append
    swaps directories; the snapshot keeps the old inodes)."""
    test_collection.write("it", sample_data)
    test_collection.create_snapshot("s1")
    test_collection.write("it", sample_data.iloc[:10], overwrite=True)
    old = test_collection.item("it", snapshot="s1").to_pandas()
    assert len(old) == len(sample_data)


def test_snapshot_auto_name_and_listing(test_collection, sample_data):
    test_collection.write("it", sample_data)
    name = test_collection.create_snapshot()
    assert name in test_collection.list_snapshots()


def test_snapshot_name_sanitized(test_collection, sample_data):
    test_collection.write("it", sample_data)
    name = test_collection.create_snapshot("my snap!@#2024.v1")
    assert name == "mysnap2024.v1"


def test_snapshot_delete(test_collection, sample_data):
    test_collection.write("it", sample_data)
    test_collection.create_snapshot("a")
    test_collection.create_snapshot("b")
    test_collection.delete_snapshot("a")
    assert test_collection.list_snapshots() == ["b"]
    test_collection.delete_snapshots()
    assert test_collection.list_snapshots() == []


def test_missing_snapshot_raises(test_collection, sample_data):
    test_collection.write("it", sample_data)
    with pytest.raises(SnapshotNotFoundError):
        test_collection.item("it", snapshot="nope")
    with pytest.raises(SnapshotNotFoundError):
        test_collection.delete_snapshot("nope")


def test_snapshot_preserves_metadata(test_collection, sample_data):
    test_collection.write("it", sample_data, metadata={"v": 1})
    test_collection.create_snapshot("s")
    assert test_collection.item("it", snapshot="s").metadata["v"] == 1
