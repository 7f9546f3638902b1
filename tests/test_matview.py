"""Materialized query views: manifest-pinned freshness over arbitrary
collection SQL (pystore_spark/matview.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from pystore_spark.exceptions import StorageError, ValidationError


def _events(n, start=0):
    # `start` offsets the timestamps too — append batches must be
    # index-disjoint or the keep-first append dedup eats them
    return pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="h")
            + pd.Timedelta(hours=start),
            "kind": [("a", "b", "c")[(start + i) % 3] for i in range(n)],
            "value": [float(start + i) for i in range(n)],
        }
    )


@pytest.fixture()
def col(test_collection):
    # monthly buckets: appends with later timestamps are pure file
    # ADDITIONS, the shape incremental view maintenance keys on
    test_collection.write("ev", _events(30), index_col="ts", freq="M")
    return test_collection


SQL = (
    "SELECT kind, count(*) AS n, sum(value) AS total "
    "FROM ev GROUP BY kind"
)


def test_create_and_read(col):
    col.create_matview("ev_by_kind", SQL)
    got = (
        col.matview("ev_by_kind")
        .toPandas()
        .sort_values("kind")
        .reset_index(drop=True)
    )
    exp = (
        col.sql(SQL)
        .toPandas()
        .sort_values("kind")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    st = col.matview_status("ev_by_kind")
    assert st["fresh"] and not st["stale"]


def test_dependency_inference_and_override(col):
    col.write("other", _events(5), index_col="ts")
    col.create_matview("mv1", SQL)
    spec = col.get_item_metadata("mv1")["_matview"]
    assert spec["depends_on"] == ["ev"]  # 'other' not referenced
    col.create_matview("mv2", SQL, depends_on=["ev", "other"])
    col.append("other", _events(5, start=100))
    assert col.matview_status("mv1")["fresh"]
    st2 = col.matview_status("mv2")
    assert not st2["fresh"] and st2["stale"] == ["other"]


def test_no_dependency_raises(col):
    with pytest.raises(ValidationError):
        col.create_matview("mv", "SELECT 1 AS one")


def test_append_flips_stale_and_refresh_rebuilds(col):
    col.create_matview("mv", SQL)
    before = col.matview("mv", refresh="never").toPandas()
    col.append("ev", _events(12, start=1000))
    st = col.matview_status("mv")
    assert not st["fresh"] and st["stale"] == ["ev"]
    # refresh="never" really is the cached bytes — total unchanged
    again = col.matview("mv", refresh="never").toPandas()
    assert again["total"].sum() == before["total"].sum()
    rep = col.refresh_matview("mv")
    assert rep["mode"] == "rebuilt" and rep["stale"] == ["ev"]
    st = col.matview_status("mv")
    assert st["fresh"]
    fresh = col.matview("mv").toPandas()
    assert fresh["n"].sum() == 42
    # idempotent: nothing moved, second refresh is a no-op
    assert col.refresh_matview("mv")["mode"] == "fresh"


def test_read_through_auto_refresh(col):
    col.create_matview("mv", SQL)
    col.append("ev", _events(6, start=50))
    got = col.matview("mv")  # auto: rebuilds first
    assert got.toPandas()["n"].sum() == 36
    assert col.matview_status("mv")["fresh"]


def test_rewrite_flips_stale(col):
    col.create_matview("mv", SQL)
    col.append("ev", _events(6, start=50))
    col.refresh_matview("mv")
    # a layout rewrite commits a new file list; values unchanged but
    # the pin is conservative by design
    col.rebalance_partitions("ev")
    st = col.matview_status("mv")
    assert st["stale"] == ["ev"]
    assert col.refresh_matview("mv")["mode"] == "rebuilt"


def test_missing_dependency_raises(col):
    col.create_matview("mv", SQL)
    col.delete_item("ev")
    st = col.matview_status("mv")
    assert not st["fresh"] and st["missing"] == ["ev"]
    with pytest.raises(StorageError):
        col.refresh_matview("mv")
    # cached reads still work (refresh="never" path)
    assert col.matview("mv", refresh="never").count() == 3


def test_self_dependency_rejected(col):
    with pytest.raises(ValidationError):
        col.create_matview(
            "ev2", "SELECT * FROM ev2", depends_on=["ev2"]
        )


def test_non_matview_refresh_raises(col):
    with pytest.raises(ValidationError):
        col.refresh_matview("ev")
    with pytest.raises(ValidationError):
        col.matview_status("ev")


def test_matview_of_matview_chain(col):
    col.create_matview("lvl1", SQL)
    col.create_matview(
        "lvl2", "SELECT count(*) AS n_kinds FROM lvl1"
    )
    assert col.matview("lvl2").toPandas()["n_kinds"][0] == 3
    col.append("ev", _events(6, start=50))
    assert col.matview_status("lvl1")["stale"] == ["ev"]
    # lvl2 only sees lvl1; refreshing lvl1 commits a new list → lvl2
    col.refresh_matview("lvl1")
    assert col.matview_status("lvl2")["stale"] == ["lvl1"]
    col.refresh_matview("lvl2")
    assert col.matview_status("lvl2")["fresh"]


def test_maintain_refreshes_matviews(col):
    col.create_matview("mv", SQL)
    col.append("ev", _events(6, start=50))
    out = col.maintain("ev", verify_indexes=False)
    assert out["_matviews"]["mv"]["mode"] == "rebuilt"
    assert col.matview_status("mv")["fresh"]
    # matviews are derived: never a primary maintain target
    out_all = col.maintain()
    assert "mv" not in out_all


def test_maintain_refreshes_matview_chains(col):
    """A matview over a matview goes stale only when its parent
    refreshes — maintain must chase the chain to a fixpoint."""
    col.create_matview("lvl1", SQL)
    col.create_matview("lvl2", "SELECT count(*) AS n_kinds FROM lvl1")
    col.append("ev", _events(6, start=50))
    out = col.maintain("ev", verify_indexes=False)
    assert out["_matviews"]["lvl1"]["mode"] == "rebuilt"
    assert out["_matviews"]["lvl2"]["mode"] == "rebuilt"
    assert col.matview_status("lvl1")["fresh"]
    assert col.matview_status("lvl2")["fresh"]


def test_matviews_of(col):
    col.create_matview("mv", SQL)
    assert col.matviews_of("ev") == ["mv"]
    assert col.matviews_of("mv") == []


INC_SQL = (
    "SELECT kind, count(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DECIMAL(30,6)) AS total, "
    "min(value) AS lo, max(value) AS hi "
    "FROM ev GROUP BY kind"
)
INC = {"keys": ["kind"], "merge": {"n": "sum", "total": "sum",
                                   "lo": "min", "hi": "max"}}


class TestIncrementalMaintenance:
    def test_append_refreshes_incrementally(self, col):
        col.create_matview("mv", INC_SQL, incremental=INC)
        col.append("ev", _events(12, start=1000))
        rep = col.refresh_matview("mv")
        assert rep["mode"] == "incremental" and rep["delta_files"] >= 1
        got = (
            col.matview("mv", refresh="never").toPandas()
            .sort_values("kind").reset_index(drop=True)
        )
        # incremental fold == full recompute, column for column
        exp = (
            col.sql(INC_SQL).toPandas()
            .sort_values("kind").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[exp.columns], exp)
        # schema stays pinned across refreshes (no decimal creep)
        assert dict(got.dtypes.astype(str)) == dict(
            exp.dtypes.astype(str)
        )
        # and a second append merges on top of the merged state
        col.append("ev", _events(9, start=2000))
        assert col.refresh_matview("mv")["mode"] == "incremental"
        again = col.matview("mv", refresh="never").toPandas()
        assert again["n"].sum() == 51

    def test_rewrite_falls_back_to_full(self, col):
        col.create_matview("mv", INC_SQL, incremental=INC)
        col.append("ev", _events(12, start=1000))
        col.refresh_matview("mv")
        col.rebalance_partitions("ev")  # file REPLACEMENT, not growth
        rep = col.refresh_matview("mv")
        assert rep["mode"] == "rebuilt"
        assert col.matview("mv").toPandas()["n"].sum() == 42

    def test_force_always_full(self, col):
        col.create_matview("mv", INC_SQL, incremental=INC)
        col.append("ev", _events(6, start=1000))
        assert col.refresh_matview("mv", force=True)["mode"] == "rebuilt"

    def test_multi_dep_falls_back(self, col):
        col.write("ev2", _events(9, start=5000), index_col="ts")
        q = (
            "SELECT kind, count(*) AS n FROM "
            "(SELECT kind FROM ev UNION ALL SELECT kind FROM ev2) "
            "GROUP BY kind"
        )
        col.create_matview(
            "mv", q, depends_on=["ev", "ev2"],
            incremental={"keys": ["kind"], "merge": {"n": "sum"}},
        )
        col.append("ev", _events(6, start=1000))
        assert col.refresh_matview("mv")["mode"] == "rebuilt"
        assert col.matview("mv").toPandas()["n"].sum() == 45

    def test_bad_merge_fn_rejected(self, col):
        with pytest.raises(ValidationError, match="merge functions"):
            col.create_matview(
                "mv", SQL,
                incremental={"keys": ["kind"],
                             "merge": {"n": "median", "total": "sum"}},
            )

    def test_avg_merge_without_avg_in_query_rejected(self, col):
        # `n` is count(*), not AVG(...) AS n — the auto-decomposer
        # must refuse loudly instead of folding avg-of-avgs
        with pytest.raises(ValidationError, match="not found"):
            col.create_matview(
                "mv", SQL,
                incremental={"keys": ["kind"],
                             "merge": {"n": "avg", "total": "sum"}},
            )

    def test_spec_must_cover_output(self, col):
        with pytest.raises(ValidationError, match="cover the query"):
            col.create_matview(
                "mv", SQL,
                incremental={"keys": ["kind"], "merge": {"n": "sum"}},
            )

    def test_having_forces_full_rebuild(self, col):
        """Post-aggregation filters make the delta fold unsound: a
        group's delta-local count can fail HAVING while the total
        passes — the textual screen must route to the rebuild."""
        q = (
            "SELECT kind, count(*) AS n FROM ev GROUP BY kind "
            "HAVING count(*) >= 5"
        )
        col.create_matview(
            "mv", q,
            incremental={"keys": ["kind"], "merge": {"n": "sum"}},
        )
        col.append("ev", _events(30, start=1000))
        rep = col.refresh_matview("mv")
        assert rep["mode"] == "rebuilt"
        got = col.matview("mv", refresh="never").toPandas()
        assert got["n"].sum() == 60  # every kind has 20 >= 5

    AVG_SQL = (
        "SELECT kind, count(*) AS n, AVG(value) AS mean_v "
        "FROM ev GROUP BY kind"
    )
    AVG_INC = {"keys": ["kind"],
               "merge": {"n": "sum", "mean_v": "avg"}}

    def test_avg_auto_decomposes_and_refreshes_incrementally(self, col):
        """avg(x) views maintain sum+count companion columns (hidden
        __ivm_* state, like Spark's Average partial-agg buffers) and
        recompute mean = sum/count after each fold — mode stays
        `incremental` and the result equals a full recompute."""
        col.create_matview("mv", self.AVG_SQL, incremental=self.AVG_INC)
        col.append("ev", _events(12, start=1000))
        rep = col.refresh_matview("mv")
        assert rep["mode"] == "incremental" and rep["delta_files"] >= 1
        got = (
            col.matview("mv", refresh="never").toPandas()
            .sort_values("kind").reset_index(drop=True)
        )
        exp = (
            col.sql(self.AVG_SQL).toPandas()
            .sort_values("kind").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[exp.columns], exp)
        # companion state is stored in the item alongside the output
        stored = col.item("mv").data.columns
        assert "__ivm_sum__mean_v" in stored
        assert "__ivm_cnt__mean_v" in stored
        # a second append folds on top of the folded companions
        col.append("ev", _events(9, start=2000))
        assert col.refresh_matview("mv")["mode"] == "incremental"
        again = (
            col.matview("mv", refresh="never").toPandas()
            .sort_values("kind").reset_index(drop=True)
        )
        exp2 = (
            col.sql(self.AVG_SQL).toPandas()
            .sort_values("kind").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(again[exp2.columns], exp2)

    def test_approx_distinct_incremental_equals_full_rebuild(self, col):
        """approx_count_distinct views maintain a DataSketches HLL
        companion; sketch union is register-wise max, so the
        incremental estimate must equal the full rebuild EXACTLY."""
        q = (
            "SELECT kind, count(*) AS n, "
            "APPROX_COUNT_DISTINCT(value) AS nd "
            "FROM ev GROUP BY kind"
        )
        inc = {"keys": ["kind"],
               "merge": {"n": "sum", "nd": "approx_count_distinct"}}
        col.create_matview("mv", q, incremental=inc)
        col.append("ev", _events(12, start=1000))
        rep = col.refresh_matview("mv")
        assert rep["mode"] == "incremental"
        got = (
            col.matview("mv", refresh="never").toPandas()
            .sort_values("kind").reset_index(drop=True)
        )
        # the estimates are plausible counts (values are all distinct
        # per kind here: 30+12 rows over 3 kinds → ~14 per kind)
        assert (got["nd"] >= 10).all() and (got["nd"] <= 20).all()
        col.refresh_matview("mv", force=True)  # full rebuild
        full = (
            col.matview("mv", refresh="never").toPandas()
            .sort_values("kind").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, full)

    def test_incremental_refresh_drops_delta_temp_view(self, col, spark):
        col.create_matview("mv", INC_SQL, incremental=INC)
        col.append("ev", _events(12, start=1000))
        assert col.refresh_matview("mv")["mode"] == "incremental"
        # the delta frame must not keep shadowing the item's view name
        assert not spark.catalog.tableExists("ev")

    def test_refresh_preserves_write_kwargs_layout(self, col):
        col.create_matview(
            "mvd",
            "SELECT ts, value AS v FROM ev WHERE kind = 'a'",
            index_col="ts", freq="M",
        )
        assert col.item("mvd")._plan.kind == "time"
        col.append("ev", _events(12, start=1000))
        assert col.refresh_matview("mvd")["mode"] == "rebuilt"
        plan = col.item("mvd")._plan
        assert plan.kind == "time" and plan.freq == "M"


def test_self_join_forces_full_rebuild(col):
    """A self-join pairs rows ACROSS the frame: delta substitution
    would lose every old-x-new pair — must route to the rebuild."""
    q = (
        "SELECT a.kind, count(*) AS n FROM ev a "
        "JOIN ev b ON a.kind = b.kind GROUP BY a.kind"
    )
    col.create_matview(
        "mv", q, depends_on=["ev"],
        incremental={"keys": ["kind"], "merge": {"n": "sum"}},
    )
    col.append("ev", _events(6, start=1000))
    rep = col.refresh_matview("mv")
    assert rep["mode"] == "rebuilt"
    exp = col.sql(q).toPandas().sort_values("kind")["n"].tolist()
    got = (
        col.matview("mv", refresh="never").toPandas()
        .sort_values("kind")["n"].tolist()
    )
    assert got == exp


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_incremental_fold_equals_rebuild_randomized(
    test_collection, seed
):
    """Property: after ANY sequence of disjoint appends, the
    incremental fold equals a from-scratch rebuild — same rows, same
    dtypes. Randomized kinds/values/batch sizes per seed."""
    import numpy as np

    rng = np.random.default_rng(seed)
    col = test_collection

    def batch(day0, n):
        return pd.DataFrame({
            "ts": pd.date_range(
                f"2024-01-{day0:02d}", periods=n, freq="min"
            ),
            "kind": rng.choice(list("abcdef"), n),
            "value": rng.normal(100, 50, n).round(6),
        })

    col.write("rev", batch(1, int(rng.integers(20, 60))),
              index_col="ts", freq="D")
    q = (
        "SELECT kind, count(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DECIMAL(30,6)) "
        "AS total, min(value) AS lo, max(value) AS hi "
        "FROM rev GROUP BY kind"
    )
    col.create_matview(
        "rmv", q,
        incremental={"keys": ["kind"],
                     "merge": {"n": "sum", "total": "sum",
                               "lo": "min", "hi": "max"}},
    )
    for day0 in (5, 9, 13):
        col.append("rev", batch(day0, int(rng.integers(10, 50))),
                   duplicate_handling="keep_all")
        rep = col.refresh_matview("rmv")
        assert rep["mode"] == "incremental", rep
    got = (
        col.matview("rmv", refresh="never").toPandas()
        .sort_values("kind").reset_index(drop=True)
    )
    col.refresh_matview("rmv", force=True)
    exp = (
        col.matview("rmv", refresh="never").toPandas()
        .sort_values("kind").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)
