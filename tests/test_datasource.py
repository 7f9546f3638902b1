"""format("pystore") — the native Spark data source over the store
(pystore_spark/datasource.py): batch scans pinned to one manifest,
streaming with manifest versions as replayable offsets."""

from __future__ import annotations

import pandas as pd
import pytest

from pystore_spark.datasource import register, source_options


def _b(n, day):
    return pd.DataFrame(
        {
            "ts": pd.date_range(
                f"2024-01-{day:02d}", periods=n, freq="min"
            ),
            "v": [float(i) for i in range(n)],
        }
    )


@pytest.fixture()
def col(test_collection, spark):
    register(spark)
    test_collection.write("it", _b(20, 1), index_col="ts", freq="D")
    return test_collection


def test_batch_read_matches_item(col, spark):
    d = (
        spark.read.format("pystore")
        .options(**source_options(col, "it"))
        .load()
    )
    assert d.count() == 20
    assert set(d.columns) == {"ts", "v"}
    assert d.agg({"v": "sum"}).first()[0] == 190.0


def test_batch_filter_pushdown_results_match(col, spark):
    """End-to-end: a filtered read through the pushdown reader returns
    exactly the rows an unpushed scan of the item returns."""
    d = (
        spark.read.format("pystore")
        .options(**source_options(col, "it"))
        .load()
        .filter("v >= 5.0 AND v < 12.0")
    )
    got = sorted(r.v for r in d.collect())
    exp = sorted(
        r.v for r in col.item("it").data.filter(
            "v >= 5.0 AND v < 12.0"
        ).collect()
    )
    assert got == exp == [float(i) for i in range(5, 12)]


def test_batch_reader_translates_and_applies_filters(col, spark):
    """Unit: the reader keeps translatable filters and its read()
    drops non-matching rows ARROW-SIDE (fewer rows yielded than the
    file holds) — the data-reduction fast path, independent of
    Spark's own post-scan re-evaluation."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, In, LessThan, Not, StringStartsWith,
    )
    from pystore_spark.datasource import PyStoreBatchReader

    d = (
        spark.read.format("pystore")
        .options(**source_options(col, "it"))
        .load()
    )
    reader = PyStoreBatchReader(source_options(col, "it"), d.schema)
    leftover = list(
        reader.pushFilters(
            [
                # > on a DOUBLE column must NOT translate: Spark's
                # NaN-is-greatest semantics diverge from arrow's IEEE
                # comparison, and an arrow-side drop is unrecoverable
                GreaterThan(("v",), 10.0),
                LessThan(("v",), 10.0),  # translatable (IEEE agrees)
                Not(EqualTo(("v",), 11.0)),  # untranslatable: skipped
            ]
        )
    )
    # everything is yielded back for Spark-side re-evaluation...
    assert len(leftover) == 3
    # ...but only the NaN-safe translatable filter is kept for arrow
    assert len(reader._pushed) == 1
    rows = sum(
        b.num_rows
        for p in reader.partitions()
        for b in reader.read(p)
    )
    assert rows == 10  # v in 0..9 of 0..19 — rows dropped pre-JVM

    # In / StringStartsWith translate too
    r2 = PyStoreBatchReader(source_options(col, "it"), d.schema)
    list(r2.pushFilters([In(("v",), (1.0, 3.0, 99.0))]))
    assert sum(
        b.num_rows for p in r2.partitions() for b in r2.read(p)
    ) == 2
    assert _filter_ok(StringStartsWith(("v",), "x"))


def _filter_ok(f):
    from pystore_spark.datasource import _filter_translatable

    return _filter_translatable(f)


def test_stream_delivers_appends(col, spark, tmp_path):
    q = (
        spark.readStream.format("pystore")
        .options(**source_options(col, "it"))
        .load()
        .writeStream.format("memory")
        .queryName("ds_snk")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) c FROM ds_snk").first()["c"]
        assert n == 20
        col.append("it", _b(15, 5), duplicate_handling="keep_all")
        col.append("it", _b(5, 9), duplicate_handling="keep_all")
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) c FROM ds_snk").first()["c"]
        assert n == 40
        # no duplicates: each version window delivered exactly once
        d = spark.sql(
            "SELECT count(*) c FROM "
            "(SELECT ts FROM ds_snk GROUP BY ts HAVING count(*) > 1)"
        ).first()["c"]
        assert d == 0
    finally:
        q.stop()


def test_stream_restart_resumes_from_checkpoint(col, spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_round():
        q = (
            spark.readStream.format("pystore")
            .options(**source_options(col, "it"))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_round()
    col.append("it", _b(7, 5), duplicate_handling="keep_all")
    run_round()  # restarted query resumes from the version offset
    got = spark.read.parquet(out)
    assert got.count() == 27  # 20 initial + 7 appended, no replays
    dups = (
        got.groupBy("ts").count().filter("count > 1").count()
    )
    assert dups == 0


def test_rewrite_in_window_raises(col, spark, tmp_path):
    q = (
        spark.readStream.format("pystore")
        .options(**source_options(col, "it"))
        .load()
        .writeStream.format("memory")
        .queryName("ds_rw")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        col.delete_where("it", [[("v", "<", 2.0)]])  # a rewrite
        with pytest.raises(Exception, match="rewrite|append-only"):
            q.processAllAvailable()
            q.awaitTermination(5)
    finally:
        q.stop()


def test_cdc_stream_appends_and_rewrites(col, spark, tmp_path):
    """mode=cdc: appends stream as insert rows; a delete_where
    REWRITE streams as delete rows from the removed files + insert
    rows from their replacements instead of killing the query — the
    Delta-CDF contract, convergent under keyed apply."""
    q = (
        spark.readStream.format("pystore")
        .options(**source_options(col, "it"))
        .option("mode", "cdc")
        .load()
        .writeStream.format("memory")
        .queryName("ds_cdc")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT _change_type, count(*) c FROM ds_cdc "
            "GROUP BY _change_type"
        ).collect()
        assert {r["_change_type"]: r["c"] for r in rows} == {
            "insert": 20
        }
        col.append("it", _b(5, 9), duplicate_handling="keep_all")
        col.delete_where("it", [[("v", "<", 2.0)]])  # a rewrite
        q.processAllAvailable()
        snap = spark.sql(
            "SELECT _change_type, v FROM ds_cdc"
        ).toPandas()
        # replaying the feed keyed on ts must reconverge to the live
        # item: net(v) = inserts(v) - deletes(v)
        net = (
            snap.groupby("v")["_change_type"]
            .apply(lambda s: (s == "insert").sum() - (s == "delete").sum())
        )
        live = sorted(
            r["v"] for r in col.item("it").data.select("v").collect()
        )
        from collections import Counter

        assert Counter(live) == Counter(
            {v: int(n) for v, n in net.items() if n > 0}
        )
        assert (snap["_change_type"] == "delete").sum() > 0
    finally:
        q.stop()


def test_missing_options_rejected(spark):
    register(spark)
    with pytest.raises(Exception, match="missing"):
        spark.read.format("pystore").options(path="/x").load().count()


def test_stream_reader_offset_semantics(col, spark):
    from pystore_spark.datasource import PyStoreStreamReader

    opts = source_options(col, "it")
    schema = (
        spark.read.format("pystore").options(**opts).load().schema
    )
    # numeric startingVersion is honored, not treated as 'latest'
    r = PyStoreStreamReader({**opts, "startingversion": "1"}, schema)
    assert r.initialOffset() == {"version": 1}
    r_latest = PyStoreStreamReader(
        {**opts, "startingversion": "latest"}, schema
    )
    assert r_latest.initialOffset() == r_latest.latestOffset()
    with pytest.raises(ValueError, match="startingVersion"):
        PyStoreStreamReader(
            {**opts, "startingversion": "sideways"}, schema
        )
    # a backwards window signals a version-chain reset, never silence
    with pytest.raises(ValueError, match="reset"):
        r.partitions({"version": 5}, {"version": 2})


def test_empty_bucket_by_rejected(test_collection):
    from pystore_spark.exceptions import ValidationError

    with pytest.raises(ValidationError, match="at least one column"):
        test_collection.write(
            "eb", _b(5, 1), bucket_by=[], n_buckets=2, index_col="ts"
        )


def test_pushdown_keeps_nan_rows(test_collection, spark):
    """REGRESSION: Spark orders NaN greater than every double while
    arrow comparisons are IEEE — a pushed `v > x` dropped NaN rows
    arrow-side and Spark's re-filter could not restore them. Float
    `>`/`>=` must stay Spark-side."""
    from pystore_spark.datasource import register, source_options

    register(spark)
    from pyspark.sql import functions as F

    c = test_collection
    # write through Spark so the NaN is a REAL IEEE NaN (a pandas NaN
    # would convert to NULL)
    sdf = spark.range(100).select(
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_interval(mins=F.col("id"))
        ).alias("ts"),
        F.when(F.col("id") == 5, F.lit(float("nan")))
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    c.write("d", sdf, index_col="ts")
    d = (
        spark.read.format("pystore")
        .options(**source_options(c, "d"))
        .load()
    )
    # Spark keeps the NaN row for v > 90 (NaN sorts greatest); the
    # arrow-pushed version would have dropped it pre-JVM
    assert d.filter("v > 90").count() == 9 + 1
    assert d.filter("v > 90").count() == c.item(
        "d"
    ).data.filter("v > 90").count()
    # the NaN-safe ops still push down and agree
    assert d.filter("v < 10").count() == 9  # 0..9 minus the NaN


def test_batch_partitions_prune_files_from_pushed_filters(
    test_collection, spark,
):
    """Round-8: pushed filters prune whole FILES driver-side in
    partitions() (manifest zonemap + derived _pb bucket terms — the
    same rules Item reads use), not just rows arrow-side in read().
    An index-range predicate over a 3-bucket item must schedule only
    the matching bucket's partition, and results stay exact."""
    import datetime

    from pyspark.sql.datasource import LessThan
    from pystore_spark.datasource import PyStoreBatchReader

    register(spark)
    c = test_collection
    c.write("m", _b(20, 1), index_col="ts", freq="D")
    for day in (2, 3):
        c.append("m", _b(20, day), index_col="ts")
    d = (
        spark.read.format("pystore")
        .options(**source_options(c, "m"))
        .load()
    )
    assert d.count() == 60

    base = PyStoreBatchReader(source_options(c, "m"), d.schema)
    n_all = len(base.partitions())
    assert n_all >= 3  # one file per daily bucket

    pruned = PyStoreBatchReader(source_options(c, "m"), d.schema)
    list(
        pruned.pushFilters(
            [LessThan(("ts",), datetime.datetime(2024, 1, 2))]
        )
    )
    parts = pruned.partitions()
    assert len(parts) < n_all  # days 2 and 3 pruned driver-side
    rows = sum(
        b.num_rows for p in parts for b in pruned.read(p)
    )
    assert rows == 20  # exactly day 1

    # end-to-end parity through the planner
    got = (
        spark.read.format("pystore")
        .options(**source_options(c, "m"))
        .load()
        .filter("ts < timestamp'2024-01-02'")
        .count()
    )
    assert got == 20


def test_batch_version_option_time_travels(test_collection, spark):
    """option('version', N): the batch scan pins a HISTORICAL
    manifest — files AND dv mask as of that version — same
    availability rule as Item(version=)."""
    register(spark)
    c = test_collection
    c.write("tt", _b(20, 1), index_col="ts", freq="D")
    c.append("tt", _b(20, 2), index_col="ts")  # v2
    c.delete_where("tt", [[("v", "<", 5.0)]], mode="dv")  # v3 masks 10

    opts = source_options(c, "tt")

    def _read(ver=None):
        r = spark.read.format("pystore").options(**opts)
        if ver is not None:
            r = r.option("version", ver)
        return r.load()

    assert _read().count() == 40 - 10  # current: mask applied
    assert _read(1).count() == 20  # first commit only
    assert _read(2).count() == 40  # pre-delete: rows visible
    got = _read(2).agg({"v": "sum"}).first()[0]
    exp = c.item("tt", version=2).data.agg({"v": "sum"}).first()[0]
    assert got == exp

    with pytest.raises(Exception, match="version"):
        _read(99).count()
    # streams reject a pinned version (start() surfaces stream errors
    # asynchronously, so assert on the reader constructor directly)
    from pystore_spark.datasource import PyStoreStreamReader

    with pytest.raises(ValueError, match="batch-only"):
        PyStoreStreamReader(
            {**opts, "version": "1"}, _read().schema
        )
