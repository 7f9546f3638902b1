"""Bucketed item storage and exchange-free co-located joins
(pystore_spark/bucketed.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from pystore_spark.exceptions import StorageError, ValidationError


def _orders(n=300, start=0):
    return pd.DataFrame(
        {
            "k": range(start, start + n),
            "cust": [i % 17 for i in range(start, start + n)],
            "price": [float(i) * 1.5 for i in range(start, start + n)],
        }
    )


def _lines(n=900, start=0):
    return pd.DataFrame(
        {
            "k": [(start + i) // 3 for i in range(n)],
            "qty": [float(i % 50) for i in range(n)],
        }
    )


def _n_exchanges(df):
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )


@pytest.fixture()
def col(test_collection):
    test_collection.write(
        "orders_b", _orders(), bucket_by="k", n_buckets=4, index_col="k"
    )
    test_collection.write(
        "lines_b", _lines(), bucket_by="k", n_buckets=4, index_col="k"
    )
    return test_collection


def test_roundtrip_values(col):
    got = (
        col.item("orders_b").data.toPandas()
        .sort_values("k").reset_index(drop=True)
    )
    exp = _orders().astype({"k": "int64"})
    pd.testing.assert_frame_equal(got[["k", "cust", "price"]], exp)


def test_colocated_join_is_exchange_free(col, spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = col.item("orders_b").data
        b = col.item("lines_b").data
        j = a.join(b, "k")
        assert _n_exchanges(j) == 0
        assert j.count() == 900
        # the same join over plain (non-bucketed) items shuffles both
        col.write("orders_p", _orders(), index_col="k")
        col.write("lines_p", _lines(), index_col="k")
        pj = col.item("orders_p").data.join(
            col.item("lines_p").data, "k"
        )
        assert _n_exchanges(pj) >= 2
        assert pj.count() == 900
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_filters_and_projection_push_into_bucketed_scan(col):
    h = col.item("orders_b", filters=[[("cust", "==", 3)]],
                 columns=["cust", "price"])
    out = h.data.toPandas()
    assert set(out["cust"]) == {3}
    assert set(out.columns) == {"k", "cust", "price"}


def test_append_keep_all_adds_files(col, spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        col.append(
            "orders_b", _orders(60, start=1000),
            duplicate_handling="keep_all",
        )
        got = col.item("orders_b").data
        assert got.count() == 360
        assert got.toPandas()["k"].max() == 1059
        # still exchange-free after the append (several files per
        # bucket stay a valid bucketed layout)
        j = got.join(col.item("lines_b").data, "k")
        assert _n_exchanges(j) == 0
        # nothing replaced: a pure addition leaves v1 fully readable
        assert col.item("orders_b", version=1).data.count() == 300
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_threaded_append_on_bucketed_item(col):
    """append(..., threaded=True) on a bucketed item honors the
    fire-and-forget contract (it used to run synchronously because
    the bucketed delegation preceded the threaded branch)."""
    col.append(
        "orders_b", _orders(30, start=9000),
        duplicate_handling="keep_all", threaded=True,
    )
    col.wait_for_tasks()
    assert col.item("orders_b").data.count() == 330


def test_append_merging_strategies_rejected(col):
    with pytest.raises(StorageError, match="keep_all"):
        col.append("orders_b", _orders(10, start=1000))  # keep_last
    with pytest.raises(StorageError, match="keep_all"):
        col.append(
            "orders_b", _orders(10, start=1000),
            duplicate_handling="keep_first",
        )


def test_append_schema_drift_rejected(col):
    drifted = _orders(10, start=1000).rename(columns={"price": "px"})
    with pytest.raises(ValidationError, match="schema mismatch"):
        col.append(
            "orders_b", drifted, duplicate_handling="keep_all"
        )


def test_mutations_rejected(col):
    with pytest.raises(StorageError, match="bucketed"):
        col.delete_where("orders_b", [[("cust", "==", 1)]])
    with pytest.raises(StorageError, match="bucketed"):
        col.delete_range("orders_b", before=10)
    with pytest.raises(StorageError, match="bucketed"):
        col.merge_into(
            "orders_b", col.item("orders_b").data, on="k"
        )
    with pytest.raises(StorageError, match="bucketed"):
        col.rebalance_partitions("orders_b")


def test_incompatible_write_options_rejected(test_collection):
    with pytest.raises(ValidationError, match="mutually exclusive"):
        test_collection.write(
            "x", _orders(), bucket_by="k", zonemap=["price"],
            index_col="k",
        )


def test_overwrite_and_time_travel(col):
    col.write(
        "orders_b", _orders(100, start=5000), bucket_by="k",
        n_buckets=4, index_col="k", overwrite=True,
    )
    assert col.item("orders_b").data.count() == 100
    old = col.item("orders_b", version=1)
    assert old.data.count() == 300
    assert old.data.toPandas()["k"].min() == 0


def test_gc_drops_superseded_views(col):
    import os

    col.write(
        "orders_b", _orders(50), bucket_by="k", n_buckets=4,
        index_col="k", overwrite=True,
    )
    view_root = os.path.join(col.item("orders_b").path, "_bucketview")
    col.item("orders_b").data.count()  # materialize current view
    assert os.path.isdir(view_root)
    col.vacuum("orders_b", retention=0)  # may itself bump the version
    assert col.item("orders_b").data.count() == 50  # re-materializes
    col.vacuum("orders_b", retention=0)
    kept = os.listdir(view_root)
    assert kept == [f"v{col.item('orders_b').version}"]
    assert col.item("orders_b").data.count() == 50


def test_delete_and_recreate_never_reuses_stale_relation(col, spark):
    """A deleted-then-recreated bucketed item restarts its version
    chain at 1; the session catalog table from the OLD incarnation
    (old schema, old bucket count) must not be reused — stale bucket
    DDL would feed Catalyst a false HashPartitioning claim and
    silently wrong exchange-free joins. The CREATE-time uid in
    _bucket_spec keys the relation per incarnation."""
    col.item("orders_b").data.count()  # registers incarnation-1 table
    col.delete_item("orders_b")
    col.write(
        "orders_b",
        pd.DataFrame(
            {"k": range(40), "note": [f"n{i}" for i in range(40)]}
        ),
        bucket_by="k", n_buckets=2, index_col="k",
    )
    d = col.item("orders_b").data
    # new schema + new bucket count visible, not the old relation
    assert set(d.columns) >= {"k", "note"}
    assert d.count() == 40
    spec = col.item("orders_b").metadata["_bucket_spec"]
    assert spec["n"] == 2 and spec.get("uid")
    # co-located self-join still exchange-free on the NEW bucket spec
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = d.join(col.item("orders_b").data.select("k"), "k")
        assert _n_exchanges(j) == 0
        assert j.count() == 40
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_maintain_gc_reclaims_superseded_view_dirs(col, monkeypatch):
    """The nightly maintain(gc=True) path (recover_item → gc_item)
    must reclaim _bucketview dirs of superseded versions on the
    stale-retention clock — links can't accumulate over thousands of
    versions. (vacuum coverage: test_gc_drops_superseded_views.)"""
    import os

    from pystore_spark import config

    col.item("orders_b").data.count()  # materialize view v1
    col.append("orders_b", _orders(10, start=7000),
               duplicate_handling="keep_all")
    col.item("orders_b").data.count()  # materialize view v2
    view_root = os.path.join(col.item("orders_b").path, "_bucketview")
    assert len(os.listdir(view_root)) >= 2
    monkeypatch.setattr(config, "STALE_RETENTION_SECONDS", 0)
    out = col.maintain("orders_b", compact=False, refresh_stats=False)
    assert out["orders_b"]["gc_removed"] >= 1
    live = f"v{col.item('orders_b').version}"
    kept = [d for d in os.listdir(view_root)
            if not d.startswith(".tmp-")]
    assert kept == [live]
    # the live view still reads
    assert col.item("orders_b").data.count() == 310


def test_compact_merges_bucket_files(col, spark):
    import os

    col.append("orders_b", _orders(40, start=1000),
               duplicate_handling="keep_all")
    col.append("orders_b", _orders(40, start=2000),
               duplicate_handling="keep_all")
    files = lambda: (  # noqa: E731
        col.item("orders_b")._manifest["files"]
    )
    assert len(files()) > 4
    rep = col.compact("orders_b")
    assert rep["files_before"] > rep["files_after"] == 4
    got = col.item("orders_b").data
    assert got.count() == 380
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert _n_exchanges(got.join(col.item("lines_b").data, "k")) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # idempotent: already one file per bucket
    rep2 = col.compact("orders_b")
    assert rep2["buckets_compacted"] == 0
    # pre-compact versions stay time-travel readable
    assert col.item("orders_b", version=1).data.count() == 300


def test_maintain_compacts_bucketed(col):
    col.append("orders_b", _orders(20, start=1000),
               duplicate_handling="keep_all")
    out = col.maintain("orders_b")
    assert out["orders_b"]["compact"]["files_after"] == 4


def test_sql_over_bucketed_items(col, spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = col.sql(
            "SELECT o.cust, count(*) AS n, sum(l.qty) AS q "
            "FROM orders_b o JOIN lines_b l ON o.k = l.k "
            "GROUP BY o.cust"
        )
        assert df.count() == 17
        # the join stage itself is exchange-free; only the final
        # groupBy aggregation shuffles
        assert _n_exchanges(df) == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_snapshot_of_bucketed_item(col):
    col.create_snapshot("snap1")
    col.write(
        "orders_b", _orders(10), bucket_by="k", n_buckets=4,
        index_col="k", overwrite=True,
    )
    assert col.item("orders_b").data.count() == 10
    # the snapshot's manifest base-pointer resolves its own view dir
    snap = col.item("orders_b", snapshot="snap1")
    assert snap.data.count() == 300


def test_append_sidecar_extra_merges_dict_aware(col):
    """A streaming sink's counter entry must merge key-wise into
    _streaming_commits, never wholesale-replace another sink's."""
    col.append(
        "orders_b", _orders(10, start=1000),
        duplicate_handling="keep_all",
        sidecar_extra={"_streaming_commits": {"a": 1}},
    )
    col.append(
        "orders_b", _orders(10, start=2000),
        duplicate_handling="keep_all",
        sidecar_extra={"_streaming_commits": {"b": 2}},
    )
    meta = col.get_item_metadata("orders_b", use_cache=False)
    assert meta["_streaming_commits"] == {"a": 1, "b": 2}


def test_compact_preserves_concurrent_metadata(col):
    """compact commits metadata-preserving (sidecar=None): metadata
    committed after compact's snapshot read must survive."""
    col.append(
        "orders_b", _orders(10, start=1000),
        duplicate_handling="keep_all",
        sidecar_extra={"_streaming_commits": {"s": 9}},
    )
    col.compact("orders_b")
    meta = col.get_item_metadata("orders_b", use_cache=False)
    assert meta["_streaming_commits"] == {"s": 9}
    assert meta["_bucket_spec"]["col"] == "k"


def test_concurrent_bucketed_appends_both_land(col):
    """Two threads append disjoint batches concurrently: add-scope
    commits never conflict logically, so a lost manifest CAS retries
    and BOTH batches land exactly once."""
    import threading

    errs = []

    def add(start):
        try:
            col.append(
                "orders_b", _orders(30, start=start),
                duplicate_handling="keep_all",
                sidecar_extra={"_streaming_commits": {f"s{start}": 1}},
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [threading.Thread(target=add, args=(s,)) for s in (5000, 9000)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    got = col.item("orders_b").data
    assert got.count() == 360
    meta = col.get_item_metadata("orders_b", use_cache=False)
    assert set(meta["_streaming_commits"]) == {"s5000", "s9000"}


def test_multi_column_bucketing(test_collection, spark):
    """Composite-key co-location: both sides bucketed on (k1, k2);
    a join on BOTH keys is exchange-free (Spark requires the join
    keys to cover all bucket columns)."""
    a = pd.DataFrame({
        "k1": [i % 10 for i in range(400)],
        "k2": [i % 7 for i in range(400)],
        "va": [float(i) for i in range(400)],
    })
    b = pd.DataFrame({
        "k1": [i % 10 for i in range(600)],
        "k2": [i % 7 for i in range(600)],
        "vb": [float(i) for i in range(600)],
    })
    test_collection.write(
        "ma", a, bucket_by=["k1", "k2"], n_buckets=4, index_col="k1"
    )
    test_collection.write(
        "mb", b, bucket_by=["k1", "k2"], n_buckets=4, index_col="k1"
    )
    spec = test_collection.get_item_metadata("ma")["_bucket_spec"]
    assert spec["cols"] == ["k1", "k2"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = test_collection.item("ma").data.join(
            test_collection.item("mb").data, ["k1", "k2"]
        )
        assert _n_exchanges(j) == 0
        exp = pd.merge(a, b, on=["k1", "k2"]).shape[0]
        assert j.count() == exp
        # joining on a PREFIX of the bucket columns cannot use the
        # co-location — Spark must shuffle (correctness unaffected)
        j1 = test_collection.item("ma").data.join(
            test_collection.item("mb").data.withColumnRenamed(
                "k2", "k2b"
            ),
            ["k1"],
        )
        assert _n_exchanges(j1) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # append + compact keep the composite invariant
    test_collection.append(
        "ma",
        pd.DataFrame({"k1": [99], "k2": [99], "va": [1.0]}),
        duplicate_handling="keep_all",
    )
    rep = test_collection.compact("ma")
    assert rep["files_after"] == 4
