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
