"""Incremental materialized rollups (continuous aggregates) —
pystore_spark/rollup.py + Collection.create_rollup/refresh_rollup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pystore_spark.exceptions import ValidationError


def _source_data(n=12_000, start="2020-01-01"):
    rng = np.random.default_rng(11)
    idx = pd.date_range(start, periods=n, freq="h")
    return pd.DataFrame(
        {
            "value": rng.uniform(0, 100, n),
            "kind": rng.choice(["a", "b"], n),
        },
        index=idx,
    )


AGGS = {"value": ["sum", "count", "min", "max"]}


def _full_rollup(collection, item, unit="day", dims=()):
    from pystore_spark.rollup import compute_rollup

    src = collection.item(item)
    return (
        compute_rollup(src.data, src.index_column, unit, dims, AGGS)
        .toPandas()
        .sort_values(["bucket", *dims])
        .reset_index(drop=True)
    )


def _read_rollup(collection, rollup_item, dims=()):
    pdf = collection.item(rollup_item).to_pandas().reset_index()
    cols = ["bucket", *dims, *(f"value_{f}" for f in AGGS["value"])]
    return pdf[cols].sort_values(["bucket", *dims]).reset_index(drop=True)


def _assert_rollups_equal(got, want):
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )


def test_create_rollup_matches_direct_aggregate(test_collection):
    test_collection.write("src", _source_data())
    test_collection.create_rollup("src", "src_daily", unit="day", aggs=AGGS)
    _assert_rollups_equal(
        _read_rollup(test_collection, "src_daily"),
        _full_rollup(test_collection, "src"),
    )


def test_refresh_is_incremental_and_exact(test_collection):
    data = _source_data()
    test_collection.write("src", data)
    test_collection.create_rollup("src", "src_daily", unit="day", aggs=AGGS)

    # append 48h right after the end — touches one storage bucket
    extra_idx = pd.date_range(
        data.index[-1] + pd.Timedelta(hours=1), periods=48, freq="h"
    )
    test_collection.append(
        "src",
        pd.DataFrame(
            {"value": np.linspace(0, 1, 48), "kind": ["a"] * 48},
            index=extra_idx,
        ),
    )

    out = test_collection.refresh_rollup("src_daily")
    assert out["mode"] == "incremental"
    # the append lands in one (maybe two) monthly storage buckets
    assert out["changed_buckets"] <= 2
    _assert_rollups_equal(
        _read_rollup(test_collection, "src_daily"),
        _full_rollup(test_collection, "src"),
    )


def test_refresh_after_upsert_and_noop(test_collection):
    data = _source_data()
    test_collection.write("src", data)
    test_collection.create_rollup("src", "src_daily", unit="day", aggs=AGGS)

    # upsert: bump 24 existing rows in the middle of the range
    upd = data.iloc[5000:5024].copy()
    upd["value"] = upd["value"] + 1000.0
    test_collection.append("src", upd, duplicate_handling="keep_last")

    out = test_collection.refresh_rollup("src_daily")
    assert out["mode"] == "incremental"
    _assert_rollups_equal(
        _read_rollup(test_collection, "src_daily"),
        _full_rollup(test_collection, "src"),
    )

    # already fresh → no work
    assert test_collection.refresh_rollup("src_daily")["mode"] == "fresh"


def test_rollup_with_dims_and_week_straddle(test_collection):
    """Week buckets straddle month boundaries; the recompute window
    expansion must re-aggregate the straddling week from BOTH months."""
    data = _source_data()
    test_collection.write("src", data)
    test_collection.create_rollup(
        "src", "src_weekly", unit="week", aggs=AGGS, dims=["kind"]
    )

    extra_idx = pd.date_range(
        data.index[-1] + pd.Timedelta(hours=1), periods=24, freq="h"
    )
    test_collection.append(
        "src",
        pd.DataFrame(
            {"value": np.linspace(5, 6, 24), "kind": ["b"] * 24},
            index=extra_idx,
        ),
    )
    out = test_collection.refresh_rollup("src_weekly")
    assert out["mode"] == "incremental"
    _assert_rollups_equal(
        _read_rollup(test_collection, "src_weekly", dims=["kind"]),
        _full_rollup(test_collection, "src", unit="week", dims=["kind"]),
    )


def test_small_item_falls_back_to_full_recompute(test_collection):
    """Items without the time-bucketed layout (small, single file)
    refresh by full recompute — correct, and cheap by construction."""
    small = _source_data(n=500)
    test_collection.write("src", small)
    test_collection.create_rollup("src", "r", unit="day", aggs=AGGS)
    test_collection.append(
        "src",
        pd.DataFrame(
            {"value": [1.0], "kind": ["a"]},
            index=pd.DatetimeIndex([small.index[-1] + pd.Timedelta(hours=1)]),
        ),
    )
    out = test_collection.refresh_rollup("r")
    assert out["mode"] == "full"
    _assert_rollups_equal(
        _read_rollup(test_collection, "r"),
        _full_rollup(test_collection, "src"),
    )


def test_rollup_validation_errors(test_collection):
    test_collection.write("src", _source_data(n=200))
    with pytest.raises(ValidationError, match="needs aggs"):
        test_collection.create_rollup("src", "r")
    with pytest.raises(ValidationError, match="unsupported rollup unit"):
        test_collection.create_rollup(
            "src", "r", unit="minute", aggs=AGGS
        )
    with pytest.raises(ValidationError, match="not created by create_rollup"):
        test_collection.refresh_rollup("src")


def test_recompute_ranges_merging_and_straddle():
    from pystore_spark.rollup import recompute_ranges

    # two adjacent months merge into one window
    r = recompute_ranges(["2024-01", "2024-02"], "M", "day")
    assert [(pd.Timestamp(a), pd.Timestamp(b)) for a, b in r] == [
        (pd.Timestamp("2024-01-01"), pd.Timestamp("2024-03-01")),
    ]
    # week unit expands beyond the month edge on both sides
    (lo, hi), = recompute_ranges(["2024-02"], "M", "week")
    lo, hi = pd.Timestamp(lo), pd.Timestamp(hi)
    assert lo <= pd.Timestamp("2024-02-01")
    assert lo.dayofweek == 0  # Monday
    assert hi >= pd.Timestamp("2024-03-01")
    assert hi.dayofweek == 0


def test_refresh_rollups_for_source(test_collection):
    data = _source_data()
    test_collection.write("src", data)
    test_collection.create_rollup("src", "r_daily", unit="day", aggs=AGGS)
    test_collection.create_rollup(
        "src", "r_monthly", unit="month", aggs={"value": ["sum"]}
    )
    assert sorted(test_collection.rollups_of("src")) == [
        "r_daily", "r_monthly"
    ]

    test_collection.append(
        "src",
        pd.DataFrame(
            {"value": [3.0], "kind": ["a"]},
            index=pd.DatetimeIndex([data.index[-1] + pd.Timedelta(hours=1)]),
        ),
    )
    out = test_collection.refresh_rollups("src")
    assert set(out) == {"r_daily", "r_monthly"}
    assert all(r["mode"] in ("incremental", "full") for r in out.values())
    _assert_rollups_equal(
        _read_rollup(test_collection, "r_daily"),
        _full_rollup(test_collection, "src"),
    )
    # second call: both fresh
    out2 = test_collection.refresh_rollups("src")
    assert all(r["mode"] == "fresh" for r in out2.values())


def test_streaming_sink_refreshes_rollups(test_collection, spark, tmp_path):
    """merge_sink(refresh_rollups=True): the continuous-aggregate path
    — every committed micro-batch leaves the rollup consistent with
    the item."""
    from pystore_spark.streaming import merge_sink

    data = _source_data(n=600)
    test_collection.write("src", data)
    test_collection.create_rollup("src", "r", unit="day", aggs=AGGS)

    sink = merge_sink(test_collection, "src", refresh_rollups=True)
    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "index": [data.index[-1] + pd.Timedelta(hours=i) for i in (1, 2)],
                "value": [1.5, 2.5],
                "kind": ["a", "b"],
            }
        )
    )
    sink(batch, 0)
    _assert_rollups_equal(
        _read_rollup(test_collection, "r"),
        _full_rollup(test_collection, "src"),
    )
    # replayed batch: data skip also skips the (already-fresh) refresh
    sink(batch, 0)
    _assert_rollups_equal(
        _read_rollup(test_collection, "r"),
        _full_rollup(test_collection, "src"),
    )


def test_replayed_batch_still_refreshes_stale_rollup(test_collection, spark):
    """Crash between data commit and rollup refresh: the replayed
    batch must bring the rollup up to date even though its data is
    skipped."""
    from pystore_spark.streaming import merge_sink

    data = _source_data(n=400)
    test_collection.write("src", data)
    test_collection.create_rollup("src", "r", unit="day", aggs=AGGS)

    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "index": [data.index[-1] + pd.Timedelta(hours=1)],
                "value": [7.5],
                "kind": ["a"],
            }
        )
    )
    # crash simulation: the refresh dies after the data committed
    calls = {"n": 0}
    real = test_collection.refresh_rollups

    def crashing(item):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash after data commit")
        return real(item)

    test_collection.refresh_rollups = crashing
    sink = merge_sink(test_collection, "src", refresh_rollups=True)
    with pytest.raises(RuntimeError):
        sink(batch, 5)
    # replay of the same batch id: data skip, refresh must still run
    sink(batch, 5)
    test_collection.refresh_rollups = real
    _assert_rollups_equal(
        _read_rollup(test_collection, "r"),
        _full_rollup(test_collection, "src"),
    )


def test_item_resample_adhoc_ohlc(test_collection):
    """Item.resample: one-shot OHLC downsampling with decimal-exact
    sums, validated against a pandas resample of the same data."""
    import numpy as np
    import pandas as pd

    from pystore_spark.exceptions import ValidationError

    n = 3_000
    idx = pd.date_range("2024-01-01", periods=n, freq="min")
    df = pd.DataFrame({"px": np.arange(n, dtype="float64") % 97}, index=idx)
    test_collection.write("rs", df)

    out = (
        test_collection.item("rs")
        .resample("day", {"px": ["open", "max", "min", "close", "sum"]})
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    want = df["px"].resample("D").agg(["first", "max", "min", "last", "sum"])
    assert len(out) == len(want)
    assert (out["px_open"].to_numpy() == want["first"].to_numpy()).all()
    assert (out["px_close"].to_numpy() == want["last"].to_numpy()).all()
    assert (out["px_max"].to_numpy() == want["max"].to_numpy()).all()
    assert np.allclose(out["px_sum"].to_numpy(), want["sum"].to_numpy())

    # filters prune before the aggregation (the handle's own scan)
    it = test_collection.item(
        "rs", filters=[("index", ">=", pd.Timestamp("2024-01-02"))]
    )
    assert it.resample("day", {"px": ["count"]}).count() == len(want) - 1

    with pytest.raises(ValidationError):
        test_collection.item("rs").resample("day", {"px": ["median"]})
    with pytest.raises(ValidationError):
        test_collection.item("rs").resample("fortnight", {"px": ["sum"]})


def test_rollup_refreshes_after_merge_into(test_collection):
    """merge_into commits through the same manifest protocol, so the
    rollup's file-list diff must pick up merged buckets: updates,
    deletes and inserts all reflect after one refresh."""
    test_collection.write("srcm", _source_data())
    test_collection.create_rollup(
        "srcm", "srcm_daily", unit="day", aggs=AGGS
    )
    src = _source_data()
    upd = src.iloc[100:200].copy()
    upd["value"] = 0.0
    dele = src.iloc[300:320].copy()
    dele["kind"] = "KILL"
    new = pd.DataFrame(
        {"value": [5.0] * 24, "kind": ["a"] * 24},
        index=pd.date_range("2030-01-01", periods=24, freq="h"),
    )
    test_collection.merge_into(
        "srcm", pd.concat([upd, dele, new]), on="index",
        when_matched={"value": "s.value", "kind": "s.kind"},
        when_matched_delete="s.kind = 'KILL'",
        when_not_matched="insert_all",
    )
    test_collection.refresh_rollups("srcm")
    _assert_rollups_equal(
        _read_rollup(test_collection, "srcm_daily"),
        _full_rollup(test_collection, "srcm"),
    )
