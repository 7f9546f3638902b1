"""Persistent CHECK constraints (Collection.add_constraint /
_enforce_constraints) — Delta-parity data contracts."""

from __future__ import annotations

import pandas as pd
import pytest

from pystore_spark.exceptions import DataIntegrityError


def _b(n, start=0, v0=1.0):
    return pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="h")
            + pd.Timedelta(hours=start),
            "px": [v0 + i for i in range(n)],
            "qty": [10 + i for i in range(n)],
        }
    )


@pytest.fixture()
def col(test_collection):
    test_collection.write("t", _b(10), index_col="ts")
    return test_collection


def test_add_list_drop(col):
    col.add_constraint("t", "px_pos", "px > 0")
    col.add_constraint("t", "qty_pos", "qty > 0")
    assert set(col.constraints("t")) == {"px_pos", "qty_pos"}
    left = col.drop_constraint("t", "px_pos")
    assert left == {"qty_pos": "qty > 0"}


def test_append_rejects_violations_before_commit(col):
    col.add_constraint("t", "px_pos", "px > 0")
    bad = _b(5, start=100, v0=-10.0)
    with pytest.raises(DataIntegrityError, match="px_pos"):
        col.append("t", bad, duplicate_handling="keep_all")
    # nothing committed
    assert col.item("t").data.count() == 10
    col.append("t", _b(5, start=100), duplicate_handling="keep_all")
    assert col.item("t").data.count() == 15


def test_null_passes_check_semantics(col, spark):
    col.add_constraint("t", "px_pos", "px > 0")
    b = _b(3, start=200)
    b.loc[1, "px"] = None
    col.append("t", b, duplicate_handling="keep_all")
    assert col.item("t").data.count() == 13


def test_constraint_on_stored_index_column_unnamed_index(test_collection):
    """A pandas frame with an UNNAMED index stores that index under
    DEFAULT_INDEX_NAME ('index'); a CHECK constraint referencing it
    must evaluate on such appends (it used to raise an unresolved-
    column AnalysisException because the enforcement path dropped the
    unnamed index entirely)."""
    pdf = pd.DataFrame({"px": [1.0, 2.0, 3.0]})  # unnamed RangeIndex
    test_collection.write("u", pdf)
    test_collection.add_constraint("u", "idx_nonneg", "index >= 0")
    ok = pd.DataFrame({"px": [4.0, 5.0]})
    ok.index = [10, 11]
    test_collection.append("u", ok, duplicate_handling="keep_all")
    assert test_collection.item("u").data.count() == 5
    bad = pd.DataFrame({"px": [6.0]})
    bad.index = [-7]
    with pytest.raises(DataIntegrityError, match="idx_nonneg"):
        test_collection.append("u", bad, duplicate_handling="keep_all")


def test_add_constraint_vets_existing_rows(col):
    col.append("t", _b(3, start=300, v0=-5.0),
               duplicate_handling="keep_all")
    with pytest.raises(DataIntegrityError, match="existing rows"):
        col.add_constraint("t", "px_pos", "px > 0")
    # opt out of the scan: later appends still enforced
    col.add_constraint("t", "px_pos", "px > 0", verify_existing=False)
    with pytest.raises(DataIntegrityError):
        col.append("t", _b(2, start=400, v0=-1.0),
                   duplicate_handling="keep_all")


def test_bad_expression_fails_at_add_time(col):
    with pytest.raises(Exception, match="nope|UNRESOLVED"):
        col.add_constraint("t", "broken", "nope > 0")


def test_merge_into_source_vetted(col):
    col.add_constraint("t", "px_pos", "px > 0")
    src = _b(4, start=500, v0=-3.0)
    with pytest.raises(DataIntegrityError, match="px_pos"):
        col.merge_into("t", col.spark.createDataFrame(src), on="ts")


def test_constraints_survive_append_and_compact(col):
    col.add_constraint("t", "px_pos", "px > 0")
    col.append("t", _b(4, start=600), duplicate_handling="keep_all")
    col.compact("t")
    assert col.constraints("t") == {"px_pos": "px > 0"}
    with pytest.raises(DataIntegrityError):
        col.append("t", _b(2, start=700, v0=-1.0),
                   duplicate_handling="keep_all")


def test_bucketed_append_enforced(test_collection):
    df = pd.DataFrame({"k": range(50), "v": [float(i) for i in range(50)]})
    test_collection.write("bk", df, bucket_by="k", n_buckets=4,
                          index_col="k")
    test_collection.add_constraint("bk", "v_nonneg", "v >= 0")
    bad = pd.DataFrame({"k": range(100, 105), "v": [-1.0] * 5})
    with pytest.raises(DataIntegrityError, match="v_nonneg"):
        test_collection.append("bk", bad, duplicate_handling="keep_all")
    assert test_collection.item("bk").data.count() == 50


def test_threaded_append_enforced(col):
    col.add_constraint("t", "px_pos", "px > 0")
    # enforcement is SYNCHRONOUS even for fire-and-forget appends:
    # the caller sees the violation immediately, before any thread
    with pytest.raises(DataIntegrityError, match="px_pos"):
        col.append("t", _b(3, start=800, v0=-2.0),
                   duplicate_handling="keep_all", threaded=True)
    col.wait_for_tasks()
    assert col.item("t").data.count() == 10
    # a clean threaded batch still lands, vetted once (not re-scanned
    # in the worker thread)
    col.append("t", _b(3, start=800),
               duplicate_handling="keep_all", threaded=True)
    col.wait_for_tasks()
    assert col.item("t").data.count() == 13


def test_threaded_bucketed_append_enforced(test_collection):
    """The combination the two separate paths missed: a threaded
    append to a BUCKETED item must still be vetted (and
    synchronously — the caller sees the error, not the thread)."""
    df = pd.DataFrame({"k": range(30), "v": [1.0] * 30})
    test_collection.write("bk2", df, bucket_by="k", n_buckets=2,
                          index_col="k")
    test_collection.add_constraint("bk2", "v_pos", "v > 0")
    bad = pd.DataFrame({"k": range(100, 103), "v": [-1.0] * 3})
    with pytest.raises(DataIntegrityError, match="v_pos"):
        test_collection.append(
            "bk2", bad, duplicate_handling="keep_all", threaded=True
        )
    test_collection.wait_for_tasks()
    assert test_collection.item("bk2").data.count() == 30


def test_enforce_handles_series_and_item(col):
    # Series-shaped item: constraints must evaluate on Series input
    s0 = pd.Series(
        [1.0, 2.0],
        index=pd.date_range("2024-06-01", periods=2, freq="h"),
        name="px",
    )
    s0.index.name = "ts"
    col.write("sp", s0, index_col="ts")
    col.add_constraint("sp", "px_pos", "px > 0")
    good = pd.Series(
        [5.0], index=pd.date_range("2024-06-02", periods=1), name="px"
    )
    good.index.name = "ts"
    col.append("sp", good, duplicate_handling="keep_all")
    bad = pd.Series(
        [-5.0], index=pd.date_range("2024-06-03", periods=1), name="px"
    )
    bad.index.name = "ts"
    with pytest.raises(DataIntegrityError, match="px_pos"):
        col.append("sp", bad, duplicate_handling="keep_all")
    assert col.item("sp").data.count() == 3
    # Item input: append another item's rows into t
    col.add_constraint("t", "px_pos", "px > 0")
    col.write("t2", _b(3, start=900), index_col="ts")
    col.append("t", col.item("t2"), duplicate_handling="keep_all")
    assert col.item("t").data.count() == 13
    col.write("t3", _b(2, start=950, v0=-9.0), index_col="ts")
    with pytest.raises(DataIntegrityError, match="px_pos"):
        col.append("t", col.item("t3"), duplicate_handling="keep_all")
