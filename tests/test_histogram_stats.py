"""Mergeable equi-width histogram stats + O(metadata) percentile
estimates (Collection.analyze_incremental(histograms=...) /
estimate_percentiles) and the freq= explicit-layout knob."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pystore_spark.exceptions import ValidationError


def _frame(n, start_day=0, lo=0.0, hi=100.0, seed=7):
    rng = np.random.default_rng(seed + start_day)
    return pd.DataFrame(
        {
            "ts": pd.date_range("2023-01-01", periods=n, freq="D")
            + pd.Timedelta(days=start_day),
            "v": rng.uniform(lo, hi, n),
        }
    )


class TestFreqKnob:
    def test_forces_time_layout_below_row_trigger(self, test_collection):
        test_collection.write("it", _frame(400), index_col="ts", freq="M")
        plan = test_collection.item("it")._plan
        assert plan.kind == "time" and plan.freq == "M"

    def test_yearly_buckets(self, test_collection):
        test_collection.write("it", _frame(800), index_col="ts", freq="Y")
        man = test_collection.item("it")._manifest
        pbs = {f.split("_pb=")[1].split("/")[0] for f in man["files"]}
        assert pbs == {"2023", "2024", "2025"}

    def test_append_inherits_forced_freq(self, test_collection):
        test_collection.write("it", _frame(100), index_col="ts", freq="M")
        test_collection.append("it", _frame(100, start_day=100))
        assert test_collection.item("it")._plan.freq == "M"
        assert test_collection.item("it").data.count() == 200

    def test_non_time_index_rejected(self, test_collection):
        df = pd.DataFrame({"k": range(10), "v": range(10)})
        with pytest.raises(ValueError, match="not a timestamp"):
            test_collection.write("it", df, index_col="k", freq="D")

    def test_bad_freq_rejected(self, test_collection):
        with pytest.raises(ValueError, match="Y/Q/M/D"):
            test_collection.write(
                "it", _frame(10), index_col="ts", freq="W"
            )


class TestHistogramStats:
    def test_merged_counts_equal_full_scan(self, test_collection, spark):
        import pyspark.sql.functions as F

        col = test_collection
        col.write("it", _frame(500), index_col="ts", freq="M")
        s1 = col.analyze_incremental("it", histograms=["v"], n_bins=16)
        col.append("it", _frame(300, start_day=500, lo=20, hi=80))
        s2 = col.analyze_incremental("it", histograms=["v"])
        h = s2["histograms"]["v"]
        assert h["n_values"] == 800
        # edges pinned at first build survive the refresh
        assert h["mn"] == s1["histograms"]["v"]["mn"]
        assert h["w"] == s1["histograms"]["v"]["w"]
        # merged per-bucket counts == one-pass histogram over the item
        df = col.item("it").data
        binx = F.least(
            F.greatest(
                F.floor(
                    (F.col("v").cast("double") - F.lit(h["mn"]))
                    / F.lit(h["w"])
                ).cast("long"),
                F.lit(0),
            ),
            F.lit(h["nb"] - 1),
        )
        direct = {
            r["b"]: r["c"]
            for r in df.groupBy(binx.alias("b")).count()
            .withColumnRenamed("count", "c").collect()
        }
        assert h["counts"] == [
            direct.get(i, 0) for i in range(h["nb"])
        ]

    def test_refresh_is_incremental(self, test_collection):
        col = test_collection
        col.write("it", _frame(600), index_col="ts", freq="M")
        s1 = col.analyze_incremental("it", histograms=["v"])
        # append touches only the months after day 600
        col.append("it", _frame(60, start_day=600))
        s2 = col.analyze_incremental("it", histograms=["v"])
        assert 0 < s2["buckets_rescanned"] < s1["buckets_rescanned"]

    def test_histogram_maintained_without_rerequest(self, test_collection):
        col = test_collection
        col.write("it", _frame(200), index_col="ts", freq="M")
        col.analyze_incremental("it", histograms=["v"])
        col.append("it", _frame(100, start_day=200))
        s = col.analyze_incremental("it")  # no histograms= arg
        assert s["histograms"]["v"]["n_values"] == 300

    def test_estimates_within_bin_width(self, test_collection):
        col = test_collection
        data = _frame(2000)
        col.write("it", data, index_col="ts", freq="M")
        col.analyze_incremental("it", histograms=["v"], n_bins=64)
        rep = col.estimate_percentiles("it", "v", qs=(0.1, 0.5, 0.9))
        w = (data["v"].max() - data["v"].min()) / 64
        for q, est in rep["estimates"].items():
            exact = float(np.percentile(data["v"], q * 100))
            assert abs(est - exact) <= w + 1e-9, (q, est, exact)

    def test_clamping_out_of_range_appends(self, test_collection):
        col = test_collection
        col.write(
            "it", _frame(300, lo=10, hi=20), index_col="ts", freq="M"
        )
        col.analyze_incremental("it", histograms=["v"], n_bins=8)
        # far outside the pinned [10, 20] range → end bins
        col.append("it", _frame(50, start_day=300, lo=1000, hi=2000))
        s = col.analyze_incremental("it")
        h = s["histograms"]["v"]
        assert h["n_values"] == 350
        assert h["counts"][-1] >= 50  # clamped into the top bin

    def test_estimate_without_stats_raises(self, test_collection):
        test_collection.write(
            "it", _frame(100), index_col="ts", freq="M"
        )
        with pytest.raises(ValidationError, match="no histogram stats"):
            test_collection.estimate_percentiles("it", "v")

    def test_flat_item_rejected(self, test_collection):
        df = pd.DataFrame({"k": list(range(50)), "v": [1.0] * 50})
        test_collection.write("it", df, index_col="k")
        with pytest.raises(ValidationError, match="time-partitioned"):
            test_collection.analyze_incremental("it", histograms=["v"])

    def test_constant_column_degenerate_width(self, test_collection):
        df = _frame(200)
        df["v"] = 42.0
        test_collection.write("it", df, index_col="ts", freq="M")
        s = test_collection.analyze_incremental("it", histograms=["v"])
        h = s["histograms"]["v"]
        assert h["w"] == 1.0 and h["counts"][0] == 200
        rep = test_collection.estimate_percentiles("it", "v", qs=(0.5,))
        assert abs(rep["estimates"][0.5] - 42.0) < 1.0

    def test_quantile_bounds_checked(self, test_collection):
        test_collection.write(
            "it", _frame(100), index_col="ts", freq="M"
        )
        test_collection.analyze_incremental("it", histograms=["v"])
        with pytest.raises(ValueError, match="outside"):
            test_collection.estimate_percentiles("it", "v", qs=(1.5,))
