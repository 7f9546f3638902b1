"""MultiIndex + exotic dtype round-trips (reference spec:
tests/test_multiindex.py, tests/test_pr77_features.py:119-249)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_multiindex_2level(test_collection):
    idx = pd.MultiIndex.from_product(
        [["A", "B", "C"], pd.date_range("2024-01-01", periods=5, freq="D")],
        names=["category", "date"],
    )
    df = pd.DataFrame(
        {"value1": np.arange(15.0), "value2": np.arange(15.0) * 2}, index=idx
    )
    test_collection.write("mi2", df)
    out = test_collection.item("mi2").to_pandas()
    pd.testing.assert_frame_equal(out.sort_index(), df.sort_index())


def test_multiindex_3level(test_collection):
    idx = pd.MultiIndex.from_product(
        [["X", "Y"], ["A", "B"], pd.date_range("2024-01-01", periods=2)],
        names=["group", "category", "date"],
    )
    df = pd.DataFrame({"value": np.arange(8.0)}, index=idx)
    test_collection.write("mi3", df)
    out = test_collection.item("mi3").to_pandas()
    pd.testing.assert_frame_equal(out.sort_index(), df.sort_index())


def test_multiindex_unnamed_levels(test_collection):
    idx = pd.MultiIndex.from_tuples([(1, "a"), (2, "b")])
    df = pd.DataFrame({"v": [1.0, 2.0]}, index=idx)
    test_collection.write("mi_unnamed", df)
    out = test_collection.item("mi_unnamed").to_pandas()
    assert out.index.nlevels == 2
    assert len(out) == 2


def test_multiindex_append(test_collection):
    idx1 = pd.MultiIndex.from_product(
        [["A"], pd.date_range("2024-01-01", periods=3)], names=["cat", "date"]
    )
    idx2 = pd.MultiIndex.from_product(
        [["B"], pd.date_range("2024-01-01", periods=3)], names=["cat", "date"]
    )
    test_collection.write("mi_app", pd.DataFrame({"v": [1.0, 2, 3]}, index=idx1))
    test_collection.append("mi_app", pd.DataFrame({"v": [4.0, 5, 6]}, index=idx2))
    out = test_collection.item("mi_app").to_pandas()
    assert len(out) == 6
    # upsert on the composite key: same keys replace
    test_collection.append("mi_app", pd.DataFrame({"v": [9.0, 9, 9]}, index=idx1))
    out = test_collection.item("mi_app").to_pandas()
    assert len(out) == 6
    assert out.loc[("A",), "v"].tolist() == [9.0, 9.0, 9.0]


def test_timedelta_roundtrip(test_collection):
    df = pd.DataFrame(
        {
            "duration": pd.to_timedelta(["1 days", "2 days", "3 days 4 hours"]),
            "value": [1, 2, 3],
        },
        index=pd.date_range("2024-01-01", periods=3),
    )
    test_collection.write("td", df)
    out = test_collection.item("td").to_pandas()
    pd.testing.assert_series_equal(
        out["duration"].reset_index(drop=True),
        df["duration"].reset_index(drop=True),
    )


def test_period_roundtrip(test_collection):
    df = pd.DataFrame(
        {
            "period": pd.period_range("2020-01", periods=3, freq="M"),
            "value": [1.0, 2.0, 3.0],
        },
        index=pd.date_range("2024-01-01", periods=3),
    )
    test_collection.write("per", df)
    out = test_collection.item("per").to_pandas()
    assert isinstance(out["period"].dtype, pd.PeriodDtype)
    assert list(out["period"].astype(str)) == ["2020-01", "2020-02", "2020-03"]


def test_interval_roundtrip(test_collection):
    df = pd.DataFrame(
        {
            "interval": pd.IntervalIndex.from_breaks([0, 1, 2, 3], closed="right"),
            "value": [1.0, 2.0, 3.0],
        },
        index=pd.date_range("2024-01-01", periods=3),
    )
    test_collection.write("iv", df)
    out = test_collection.item("iv").to_pandas()
    assert isinstance(out["interval"].dtype, pd.IntervalDtype)
    assert out["interval"].array.closed == "right"
    assert list(out["interval"].array.left) == [0, 1, 2]


def test_categorical_ordered_roundtrip(test_collection):
    df = pd.DataFrame(
        {
            "grade": pd.Categorical(
                ["A", "B", "A", "C"], categories=["A", "B", "C", "D"],
                ordered=True,
            ),
            "value": [1, 2, 3, 4],
        },
        index=pd.date_range("2024-01-01", periods=4),
    )
    test_collection.write("cat", df)
    out = test_collection.item("cat").to_pandas()
    assert isinstance(out["grade"].dtype, pd.CategoricalDtype)
    assert out["grade"].cat.ordered
    assert list(out["grade"].cat.categories) == ["A", "B", "C", "D"]


def test_nested_objects_roundtrip(test_collection):
    df = pd.DataFrame(
        {
            "lists": [[1, 2], [3, 4, 5], [6]],
            "dicts": [{"a": 1}, {"b": 2, "c": 3}, {}],
            "value": [1.0, 2.0, 3.0],
        },
        index=pd.date_range("2024-01-01", periods=3),
    )
    test_collection.write("nested", df)
    out = test_collection.item("nested").to_pandas()
    assert list(out["lists"]) == [[1, 2], [3, 4, 5], [6]]
    assert list(out["dicts"]) == [{"a": 1}, {"b": 2, "c": 3}, {}]


def test_tz_aware_index_roundtrip(test_collection):
    idx = pd.date_range(
        "2024-06-01 09:00", periods=5, freq="h", tz="US/Eastern"
    )
    df = pd.DataFrame({"value": np.arange(5.0)}, index=idx)
    test_collection.write("tz", df)
    out = test_collection.item("tz").to_pandas()
    assert str(out.index.tz) == "US/Eastern"
    pd.testing.assert_frame_equal(
        out, df.rename_axis("index"), check_freq=False
    )


def test_tz_aware_column_roundtrip(test_collection):
    df = pd.DataFrame(
        {
            "timestamp": pd.date_range("2024-01-01", periods=3, tz="UTC"),
            "value": [1, 2, 3],
        },
        index=pd.date_range("2024-01-01", periods=3),
    )
    test_collection.write("tzcol", df)
    out = test_collection.item("tzcol").to_pandas()
    assert str(out["timestamp"].dt.tz) == "UTC"


def test_mixed_tz_append_normalizes(test_collection):
    a = pd.DataFrame(
        {"v": [1.0, 2, 3]},
        index=pd.date_range("2024-01-01 00:00", periods=3, freq="h",
                            tz="US/Eastern"),
    )
    b = pd.DataFrame(
        {"v": [4.0, 5, 6]},
        index=pd.date_range("2024-01-02 00:00", periods=3, freq="h", tz="UTC"),
    )
    test_collection.write("mixtz", a)
    test_collection.append("mixtz", b)
    out = test_collection.item("mixtz").to_pandas()
    assert len(out) == 6
    assert out.index.tz is not None  # single tz, UTC-normalized storage


def test_wide_frame(test_collection):
    df = pd.DataFrame(
        np.random.default_rng(0).standard_normal((10, 200)),
        columns=[f"c{i}" for i in range(200)],
        index=pd.date_range("2024-01-01", periods=10),
    )
    test_collection.write("wide", df)
    out = test_collection.item("wide", columns=["c0", "c199"]).to_pandas()
    assert list(out.columns) == ["c0", "c199"]


def test_long_column_name(test_collection):
    name = "c" * 1000
    df = pd.DataFrame(
        {name: [1.0]}, index=pd.DatetimeIndex(["2024-01-01"])
    )
    test_collection.write("longcol", df)
    assert name in test_collection.item("longcol").to_pandas().columns


def test_int_index_with_duplicates(test_collection):
    df = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]}, index=[1, 1, 2, 2])
    test_collection.write("intidx", df)
    out = test_collection.item("intidx").to_pandas()
    assert len(out) == 4
    assert list(out.index) == [1, 1, 2, 2]


def test_duplicate_column_names_rejected(test_collection):
    df = pd.DataFrame(
        [[1.0, 2.0]], columns=["a", "a"],
        index=pd.DatetimeIndex(["2024-01-01"]),
    )
    from pystore_spark.exceptions import ValidationError

    with pytest.raises(ValidationError):
        test_collection.write("dupcol", df)
