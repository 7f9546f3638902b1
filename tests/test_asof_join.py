"""asof_join (functions/joins.py) vs pandas merge_asof — the
semantics reference model — across directions, exactness, tolerance,
and grouped keys."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql.functions import col as F_col

from pystore_spark.functions.joins import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    n_l, n_r = 120, 200
    left = pd.DataFrame(
        {
            "grp": rng.integers(0, 4, n_l),
            "t": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="min"),
            "lval": rng.standard_normal(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "g": rng.integers(0, 4, n_r),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="min"),
            "px": rng.standard_normal(n_r).round(4),
            "qty": rng.integers(1, 100, n_r),
        }
    )
    return left, right


def _pandas_model(left, right, direction, exact, tol=None):
    exp = pd.merge_asof(
        left.sort_values("t").reset_index(drop=True),
        right.sort_values("ts").reset_index(drop=True),
        left_on="t",
        right_on="ts",
        left_by="grp",
        right_by="g",
        direction=direction,
        allow_exact_matches=exact,
        tolerance=tol,
    )
    return (
        exp[["grp", "t", "lval", "px", "qty"]]
        .sort_values(["grp", "t", "lval"])
        .reset_index(drop=True)
    )


def _spark_result(spark, left, right, **kw):
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="t",
        right_on="ts",
        by=["grp"],
        right_by=["g"],
        values=["px", "qty"],
        **kw,
    ).toPandas()
    return (
        out[["grp", "t", "lval", "px", "qty"]]
        .sort_values(["grp", "t", "lval"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
def test_matches_pandas_merge_asof(spark, frames, direction, exact):
    left, right = frames
    got = _spark_result(
        spark, left, right, direction=direction,
        allow_exact_matches=exact,
    )
    exp = _pandas_model(left, right, direction, exact)
    # qty comes back nullable (missing matches): align dtypes
    exp["qty"] = exp["qty"].astype("float64")
    got["qty"] = got["qty"].astype("float64")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_tolerance_interval(spark, frames, direction):
    left, right = frames
    got = _spark_result(
        spark, left, right, direction=direction,
        tolerance="30 minutes",
    )
    exp = _pandas_model(
        left, right, direction, True, tol=pd.Timedelta("30 minutes")
    )
    exp["qty"] = exp["qty"].astype("float64")
    got["qty"] = got["qty"].astype("float64")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_numeric_time_and_collision_suffix(spark):
    left = pd.DataFrame(
        {"k": [1, 1, 2], "pos": [10.0, 20.0, 15.0], "px": [0, 0, 0]}
    )
    right = pd.DataFrame(
        {"k": [1, 1, 2, 2], "pos": [9.0, 18.0, 1.0, 15.0],
         "px": [1.0, 2.0, 3.0, 4.0]}
    )
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="pos",
        by=["k"],
        values=["px"],
        tolerance=5.0,
    ).toPandas().sort_values(["k", "pos"]).reset_index(drop=True)
    # collision: right px lands as px_right; tolerance 5 kills 20<-18? no
    # |20-18|=2 ok; 10<-9 ok; 15<-15 exact ok
    assert list(out["px_right"]) == [1.0, 2.0, 4.0]
    assert "px" in out.columns  # left's own px survives


def test_right_time_as_and_single_shuffle(spark, frames):
    left, right = frames
    df = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="t", right_on="ts", by=["grp"], right_by=["g"],
        values=[], right_time_as="matched_ts",
    )
    assert "matched_ts" in df.columns
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ONE shuffle: the window's partitioning on the by-key
    assert plan.count("Exchange") == 1


def test_bad_args(spark, frames):
    left, right = frames
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, on="t", direction="sideways")
    with pytest.raises(ValueError, match="equal length"):
        asof_join(l, r, on="t", by=["grp"], right_by=[])


def test_keyless_join_warns_single_partition(spark):
    """No `by` keys → Window.partitionBy() → one serial partition.
    Correct (matches keyless merge_asof) but must WARN so the plan
    can't ship silently at scale."""
    from pystore_spark.functions.joins import SinglePartitionAsofWarning

    left = pd.DataFrame({"t": [1.0, 5.0], "lv": [10, 20]})
    right = pd.DataFrame({"t": [0.0, 4.0], "px": [1.0, 2.0]})
    with pytest.warns(SinglePartitionAsofWarning, match="SINGLE-PARTITION"):
        out = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t", values=["px"],
        ).toPandas().sort_values("t").reset_index(drop=True)
    assert list(out["px"]) == [1.0, 2.0]


def test_reserved_working_columns_rejected(spark):
    """Input columns named _asof_* would be silently overwritten by
    the pass's working columns — refuse instead of corrupting."""
    l = spark.createDataFrame(
        pd.DataFrame({"t": [1.0], "grp": [1], "_asof_t": [9.0]})
    )
    r = spark.createDataFrame(
        pd.DataFrame({"t": [0.0], "grp": [1], "px": [1.0]})
    )
    with pytest.raises(ValueError, match="_asof_"):
        asof_join(l, r, on="t", by=["grp"])
    with pytest.raises(ValueError, match="_asof_"):
        asof_join(r, l, on="t", by=["grp"])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
def test_banded_keyless_matches_merge_asof(spark, frames, direction, exact):
    """asof_join_banded = keyless merge_asof, exactly, across band
    edges (carry-in replicas) — the scalable fallback the keyless
    warning points at (VERDICT r7 item 8)."""
    from pystore_spark.functions.joins import asof_join_banded

    left, right = frames
    left = left.drop(columns=["grp"])
    right = right.drop(columns=["g"])
    exp = pd.merge_asof(
        left.sort_values("t").reset_index(drop=True),
        right.sort_values("ts").reset_index(drop=True),
        left_on="t",
        right_on="ts",
        direction=direction,
        allow_exact_matches=exact,
    )[["t", "lval", "px", "qty"]].sort_values(
        ["t", "lval"]
    ).reset_index(drop=True)
    got = asof_join_banded(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="t",
        right_on="ts",
        band_seconds=86_400,  # daily bands over a ~7-day axis
        values=["px", "qty"],
        direction=direction,
        allow_exact_matches=exact,
    ).toPandas()[["t", "lval", "px", "qty"]].sort_values(
        ["t", "lval"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_banded_keyless_tolerance_and_parallelism(spark, frames):
    """Tolerance parity, AND the plan is genuinely parallel: probe
    rows land in >1 task partition (the plain keyless asof_join sorts
    everything in ONE), with no single-partition window over the
    data-scale frames."""
    import warnings

    from pyspark.sql import functions as F

    from pystore_spark.functions.joins import (
        SinglePartitionAsofWarning, asof_join_banded,
    )

    left, right = frames
    left = left.drop(columns=["grp"])
    right = right.drop(columns=["g"])
    tol = pd.Timedelta("90 minutes")
    exp = pd.merge_asof(
        left.sort_values("t").reset_index(drop=True),
        right.sort_values("ts").reset_index(drop=True),
        left_on="t", right_on="ts",
        direction="backward", tolerance=tol,
    )[["t", "lval", "px"]].sort_values(["t", "lval"]).reset_index(
        drop=True
    )
    with warnings.catch_warnings():
        # the banded path must NOT emit the keyless serial warning —
        # it passes the band as a real `by` key
        warnings.simplefilter("error", SinglePartitionAsofWarning)
        out = asof_join_banded(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t", right_on="ts",
            band_seconds=86_400,
            values=["px"],
            direction="backward",
            tolerance="90 minutes",
        )
    got = out.toPandas()[["t", "lval", "px"]].sort_values(
        ["t", "lval"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # structural: the DATA-SCALE window pass hash-partitions on the
    # band key — never SinglePartition (at toy scale AQE may still
    # coalesce the tiny shuffle, so assert the plan, then observe >1
    # task with coalescing off)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_bandk_asof" in plan, plan
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key, "true")
    try:
        spark.conf.set(coalesce_key, "false")
        # collect() the pid projection directly: aggregating ON the
        # nondeterministic spark_partition_id column re-plans its
        # evaluation point and reports a single id
        pids = {
            r["_pid"]
            for r in out.withColumn(
                "_pid", F.spark_partition_id()
            ).collect()
        }
    finally:
        spark.conf.set(coalesce_key, old)
    assert len(pids) > 1, "banded keyless as-of must not be serial"


def test_banded_numeric_axis_and_collisions(spark):
    from pystore_spark.functions.joins import asof_join_banded

    left = pd.DataFrame({"t": [1.0, 55.0, 120.0, 300.0], "v": [1, 2, 3, 4]})
    right = pd.DataFrame({"t": [0.0, 50.0, 250.0], "v": [10, 20, 30]})
    out = asof_join_banded(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="t",
        band_seconds=100,  # numeric axis: floor(t/100)
        direction="backward",
    ).toPandas().sort_values("t")
    # right "t"/"v" collide with left -> suffixed
    assert list(out["v_right"]) == [10, 20, 20, 30]
    with pytest.raises(ValueError, match="working columns"):
        asof_join_banded(
            spark.createDataFrame(left).withColumnRenamed(
                "v", "_bandk_asof"
            ),
            spark.createDataFrame(right),
            on="t", band_seconds=100,
        )


@pytest.mark.parametrize("banded", [False, True])
def test_null_values_in_matched_rows_carry_verbatim(spark, banded):
    """REGRESSION (round-8 review): per-column last/first picks with
    ignorenulls used to back-fill a NULL value in the matched row
    from an OLDER row — fabricating a row that never existed. The
    matched row must carry its NULLs verbatim, exactly like
    merge_asof."""
    from pystore_spark.functions.joins import (
        asof_join, asof_join_banded,
    )

    left = pd.DataFrame(
        {"t": [200_000.0, 15.0], "lv": [1, 2]}
    )
    right = pd.DataFrame(
        {"ts": [10.0, 90_100.0], "px": [1.0, None]}
    )
    exp = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("ts"),
        left_on="t",
        right_on="ts",
        direction="backward",
    ).set_index("lv")["px"]
    if banded:
        out = asof_join_banded(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t", right_on="ts",
            band_seconds=86_400,
            values=["px"],
            direction="backward",
        )
    else:
        out = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t", right_on="ts",
            values=["px"],
            direction="backward",
        )
    got = {r["lv"]: r["px"] for r in out.collect()}
    # probe at t=200000 matches ts=90100 whose px IS NULL — it must
    # stay NULL, never back-fill px=1.0 from ts=10
    assert got[1] is None and pd.isna(exp.loc[1])
    assert got[2] == 1.0 and exp.loc[2] == 1.0


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
def test_keyless_auto_bands_above_threshold(
    spark, frames, direction, exact, monkeypatch, tmp_path
):
    """Above the size threshold a keyless asof_join re-routes itself
    through asof_join_banded: no SinglePartitionAsofWarning, and the
    output is identical to the (warned) serial plan across every
    direction/exactness combination — including the band-edge carry
    cases the banded docstring enumerates (the fixture's time axis
    spans many auto-sized bands)."""
    import warnings as W

    from pystore_spark.functions import joins as J

    left, right = frames
    # parquet-backed frames carry REAL Catalyst size stats (in-memory
    # createDataFrame relations report defaultSizeInBytes = unknown,
    # which the router treats as "keep the serial plan")
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(left.drop(columns=["grp"])).write.parquet(lp)
    spark.createDataFrame(right.drop(columns=["g"])).write.parquet(rp)
    lf, rf = spark.read.parquet(lp), spark.read.parquet(rp)

    def run():
        return (
            asof_join(
                lf, rf, on="t", right_on="ts",
                values=["px", "qty"], direction=direction,
                allow_exact_matches=exact,
            )
            .toPandas()
            .sort_values(["t", "lval"])
            .reset_index(drop=True)
        )

    # serial reference (threshold effectively infinite → warns)
    monkeypatch.setattr(J, "ASOF_AUTO_BAND_MIN_BYTES", 1 << 60)
    with pytest.warns(J.SinglePartitionAsofWarning):
        want = run()

    # auto-banded (threshold 0 → routes, must NOT warn)
    monkeypatch.setattr(J, "ASOF_AUTO_BAND_MIN_BYTES", 0)
    with W.catch_warnings():
        W.simplefilter("error", J.SinglePartitionAsofWarning)
        got = run()
    pd.testing.assert_frame_equal(got, want)


def test_keyless_auto_band_tolerance_and_plan(
    spark, frames, monkeypatch, tmp_path
):
    """Auto-banded keyless join honors tolerance identically, and the
    executed plan partitions the window by the synthetic band key —
    never a global single-partition sort."""
    import warnings as W

    from pystore_spark.functions import joins as J

    left, right = frames
    lp, rp = str(tmp_path / "l2"), str(tmp_path / "r2")
    spark.createDataFrame(left.drop(columns=["grp"])).write.parquet(lp)
    spark.createDataFrame(right.drop(columns=["g"])).write.parquet(rp)
    lf, rf = spark.read.parquet(lp), spark.read.parquet(rp)

    kw = dict(
        on="t", right_on="ts", values=["px"], tolerance="45 minutes"
    )
    monkeypatch.setattr(J, "ASOF_AUTO_BAND_MIN_BYTES", 1 << 60)
    with pytest.warns(J.SinglePartitionAsofWarning):
        want = (
            asof_join(lf, rf, **kw)
            .toPandas().sort_values(["t", "lval"])
            .reset_index(drop=True)
        )
    monkeypatch.setattr(J, "ASOF_AUTO_BAND_MIN_BYTES", 0)
    with W.catch_warnings():
        W.simplefilter("error", J.SinglePartitionAsofWarning)
        out = asof_join(lf, rf, **kw)
        got = (
            out.toPandas().sort_values(["t", "lval"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(got, want)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_bandk_asof" in plan  # windows keyed by the band


def test_keyless_auto_band_threshold_respected(spark, monkeypatch):
    """Below the threshold nothing is re-routed: tiny frames keep the
    serial plan and the warning — the banded machinery (two extra
    shuffles + a min/max pre-scan) would cost more than it saves."""
    from pystore_spark.functions import joins as J

    left = pd.DataFrame({"t": [1.0, 5.0], "lv": [10, 20]})
    right = pd.DataFrame({"t": [0.0, 4.0], "px": [1.0, 2.0]})
    monkeypatch.setattr(J, "ASOF_AUTO_BAND_MIN_BYTES", 1 << 60)
    with pytest.warns(J.SinglePartitionAsofWarning):
        out = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t", values=["px"],
        ).toPandas().sort_values("t").reset_index(drop=True)
    assert list(out["px"]) == [1.0, 2.0]


def test_keyless_auto_band_unsupported_time_type_falls_back(
    spark, monkeypatch, tmp_path
):
    """Self-review r12: a time key the band math can't handle (DATE)
    must fall back to the warned serial plan — correct for any
    orderable type — instead of throwing from the min/max pre-scan."""
    from pystore_spark.functions import joins as J

    lp, rp = str(tmp_path / "dl"), str(tmp_path / "dr")
    spark.createDataFrame(
        [("2024-01-02", 1), ("2024-01-05", 2)], "d string, lv int"
    ).select(F_col("d").cast("date").alias("d"), "lv").write.parquet(lp)
    spark.createDataFrame(
        [("2024-01-01", 1.5), ("2024-01-04", 2.5)], "d string, px double"
    ).select(F_col("d").cast("date").alias("d"), "px").write.parquet(rp)
    left, right = spark.read.parquet(lp), spark.read.parquet(rp)
    monkeypatch.setattr(J, "ASOF_AUTO_BAND_MIN_BYTES", 0)
    with pytest.warns(J.SinglePartitionAsofWarning):
        out = (
            asof_join(left, right, on="d", values=["px"])
            .toPandas().sort_values("lv").reset_index(drop=True)
        )
    assert list(out["px"]) == [1.5, 2.5]


def test_stat_less_relation_size_treated_as_unknown(spark):
    """Catalyst reports defaultSizeInBytes (Long.MaxValue) for
    stat-less relations (LogicalRDD, JDBC) — that means UNKNOWN, not
    huge: the size probe returns None so tiny stat-less frames keep
    the lazy serial plan instead of eagerly running min/max jobs."""
    from pystore_spark.functions import joins as J

    rdd = spark.sparkContext.parallelize([(1.0, 1), (2.0, 2)])
    df = spark.createDataFrame(rdd, "t double, v int")
    assert J._plan_size_bytes(df) is None
    # every PySpark createDataFrame relation is RDD-backed → unknown
    assert J._plan_size_bytes(
        spark.createDataFrame([(1.0, 1)], "t double, v int")
    ) is None
    # a stats-bearing relation still reports a real size
    sz = J._plan_size_bytes(spark.range(5).toDF("t"))
    assert sz is not None and 0 < sz < J._SIZE_ESTIMATE_CEILING
