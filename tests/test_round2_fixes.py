"""Round-2 hardening tests: crash-safe partition append, lock-break
claiming, dtype optimizer completeness, CSV index designation,
merge order_col, and minhash parameter validation."""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# fault injection: partition-scoped append must roll back on failure
# ---------------------------------------------------------------------------
def _time_item(col, monkeypatch, n=40):
    import pystore_spark.partition as partition

    monkeypatch.setattr(partition, "TIME_PARTITION_MIN_ROWS", 5)
    idx = pd.date_range("2024-01-01", periods=n, freq="D")
    df = pd.DataFrame({"value": np.arange(n, dtype=float)}, index=idx)
    col.write("faulty", df)
    return df


def test_partition_append_rolls_back_on_swap_failure(
    test_collection, monkeypatch
):
    import pystore_spark.utils as utils

    before = _time_item(test_collection, monkeypatch)
    it = test_collection.item("faulty")
    assert it._plan is not None and it._plan.kind == "time"

    # fail AT the commit point: write_manifest runs once every staged
    # file is in place, so a raise there exercises cleanup of the
    # staged-but-uncommitted files (the previous manifest stays live)
    def boom(path, *args, **kwargs):
        raise OSError("injected manifest failure")

    monkeypatch.setattr(utils, "write_manifest", boom)
    incoming = pd.DataFrame(
        {"value": [999.0, 998.0]},
        index=pd.date_range("2024-01-10", periods=2, freq="D"),
    )
    from pystore_spark.exceptions import StorageError

    with pytest.raises(StorageError):
        test_collection.append("faulty", incoming)
    monkeypatch.undo()

    # item is fully readable with pre-append content
    test_collection.clear_metadata_cache("faulty")
    after = test_collection.item("faulty").to_pandas()
    assert len(after) == len(before)
    assert float(after["value"].sum()) == pytest.approx(
        float(before["value"].sum())
    )
    # no staged leftovers: every on-disk parquet is accounted for by
    # the (unchanged) manifest
    item_dir = Path(test_collection.path) / "faulty"
    man = utils.read_manifest(item_dir)
    known = set(man["files"]) | set(man["stale"])
    on_disk = {
        f.relative_to(item_dir).as_posix()
        for f in item_dir.rglob("*.parquet")
    }
    assert on_disk <= known


def test_partition_append_rolls_back_on_rename_failure(
    test_collection, monkeypatch
):
    before = _time_item(test_collection, monkeypatch)
    calls = {"n": 0}
    from pystore_spark.fs import LocalFileSystem

    real_move = LocalFileSystem.move

    def flaky_move(self, src, dst):
        # staging moves tmp files into the live _pb= bucket dirs.
        # Fail on the second — mid-staging, after one file moved.
        if "_pb=" in str(dst):
            calls["n"] += 1
            if calls["n"] == 2:
                raise OSError("injected move failure")
        return real_move(self, src, dst)

    monkeypatch.setattr(LocalFileSystem, "move", flaky_move)
    # touch TWO monthly buckets so staging moves 2 files and the
    # injected failure on the 2nd lands mid-staging
    incoming = pd.DataFrame(
        {"value": [999.0, 998.0]},
        index=pd.to_datetime(["2024-01-05", "2024-02-05"]),
    )
    from pystore_spark.exceptions import StorageError

    with pytest.raises(StorageError):
        test_collection.append("faulty", incoming)
    monkeypatch.undo()
    assert calls["n"] >= 2  # the injected failure actually fired

    test_collection.clear_metadata_cache("faulty")
    after = test_collection.item("faulty").to_pandas()
    assert len(after) == len(before)
    assert float(after["value"].sum()) == pytest.approx(
        float(before["value"].sum())
    )


# ---------------------------------------------------------------------------
# CollectionLock: stale break is claimed atomically; release is owned
# ---------------------------------------------------------------------------
def test_lock_break_leaves_fresh_lock_in_place(test_collection):
    from pystore_spark.transactions import CollectionLock

    holder = CollectionLock(test_collection, name="t", stale_after=300.0)
    assert holder.acquire()
    # a waiter that (wrongly) attempts a break must re-validate under
    # the breaker lock, see the lock is fresh, and leave it untouched
    waiter = CollectionLock(test_collection, name="t", stale_after=300.0)
    with open(holder.lock_dir / "owner.json") as fh:
        judged = json.load(fh)
    waiter._claim_break(judged)
    assert holder.lock_dir.exists()
    with open(holder.lock_dir / "owner.json") as fh:
        assert json.load(fh)["owner"] == holder.owner
    # the breaker lock must not be left behind
    assert not holder.lock_dir.with_name(
        holder.lock_dir.name + ".breaker"
    ).exists()
    holder.release()
    assert not holder.lock_dir.exists()


def test_lock_break_skips_when_owner_changed_since_judgement(test_collection):
    from pystore_spark.transactions import CollectionLock

    stale = CollectionLock(test_collection, name="v", stale_after=0.05)
    assert stale.acquire()
    with open(stale.lock_dir / "owner.json") as fh:
        judged = json.load(fh)
    time.sleep(0.1)
    # the stale holder's lock is replaced by a fresh one before the
    # waiter's break runs: the owner-token mismatch must stop the break
    import pystore_spark.utils as _u
    _u.rm_tree(stale.lock_dir)
    fresh = CollectionLock(test_collection, name="v", stale_after=0.05)
    assert fresh.acquire()
    waiter = CollectionLock(test_collection, name="v", stale_after=300.0)
    waiter._claim_break(judged)
    assert fresh.lock_dir.exists()
    with open(fresh.lock_dir / "owner.json") as fh:
        assert json.load(fh)["owner"] == fresh.owner
    fresh.release()


def test_lock_release_leaves_foreign_lock_alone(test_collection):
    from pystore_spark.transactions import CollectionLock

    a = CollectionLock(test_collection, name="u", timeout=2.0,
                       stale_after=0.05)
    assert a.acquire()
    time.sleep(0.1)  # a's lease goes stale
    b = CollectionLock(test_collection, name="u", timeout=5.0,
                       stale_after=0.05)
    assert b.acquire()  # breaks a's stale lease and takes over
    a.release()  # must NOT delete b's lock
    assert b.lock_dir.exists()
    with open(b.lock_dir / "owner.json") as fh:
        assert json.load(fh)["owner"] == b.owner
    b.release()


# ---------------------------------------------------------------------------
# F13: float64 -> float32 and low-cardinality string -> category
# ---------------------------------------------------------------------------
def test_optimize_dtypes_float_and_category(test_collection):
    n = 200
    idx = pd.date_range("2024-01-01", periods=n, freq="h")
    df = pd.DataFrame(
        {
            "small_int": np.arange(n) % 100,          # -> tinyint
            "flt": np.linspace(0.0, 1.0, n),           # -> float32
            "big_flt": np.full(n, 1e300),              # stays double
            "label": ["red", "green", "blue", "red"] * (n // 4),  # category
            "unique_str": [f"u{i}" for i in range(n)],  # stays string
        },
        index=idx,
    )
    test_collection.write("opt", df)
    casts = test_collection.optimize_item_dtypes("opt")
    assert casts.get("small_int") == "tinyint"
    assert casts.get("flt") == "float"
    assert "big_flt" not in casts
    assert casts.get("label") == "category"
    assert "unique_str" not in casts

    back = test_collection.item("opt").to_pandas()
    assert back["flt"].dtype == np.float32
    assert back["small_int"].dtype == np.int8
    assert back["big_flt"].dtype == np.float64
    assert isinstance(back["label"].dtype, pd.CategoricalDtype)
    assert set(back["label"].cat.categories) == {"red", "green", "blue"}
    assert list(back["label"].astype(str)) == list(df["label"])
    assert back["flt"].to_numpy() == pytest.approx(
        df["flt"].to_numpy(), rel=1e-6
    )


# ---------------------------------------------------------------------------
# CSV index designation flows into write/append
# ---------------------------------------------------------------------------
def test_read_csv_index_designation(test_collection, tmp_path, spark):
    csv = tmp_path / "in.csv"
    pd.DataFrame(
        {
            "stamp": pd.date_range("2024-01-01", periods=10, freq="D"),
            "value": np.arange(10, dtype=float),
        }
    ).to_csv(csv, index=False)

    from pystore_spark.sources import read_csv

    sdf = read_csv(spark, str(csv), index_col="stamp")
    test_collection.write("from_csv", sdf)

    it = test_collection.item("from_csv")
    assert it.index_column == "stamp"

    # append with overlapping designated-index keys dedups on it
    overlap = pd.DataFrame(
        {
            "stamp": pd.date_range("2024-01-08", periods=5, freq="D"),
            "value": [100.0] * 5,
        }
    )
    test_collection.append(
        "from_csv", spark.createDataFrame(overlap),
        duplicate_handling="keep_last",
    )
    back = test_collection.item("from_csv").to_pandas()
    assert len(back) == 12  # 10 original + 2 new days; 3 overlapped
    assert (back.loc[back.index >= "2024-01-08", "value"] == 100.0).all()


def test_read_csv_index_rename_designation(test_collection, tmp_path, spark):
    csv = tmp_path / "in2.csv"
    pd.DataFrame({"t": [3, 1, 2], "v": [30.0, 10.0, 20.0]}).to_csv(
        csv, index=False
    )
    from pystore_spark.sources import read_csv

    sdf = read_csv(spark, str(csv), index_col="t", index_name="key")
    assert "key" in sdf.columns and "t" not in sdf.columns
    test_collection.write("renamed_csv", sdf)
    assert test_collection.item("renamed_csv").index_column == "key"


# ---------------------------------------------------------------------------
# merge order_col: deterministic winner for shuffled incoming frames
# ---------------------------------------------------------------------------
def test_merge_append_order_col(spark):
    from pystore_spark.merge import merge_append

    existing = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "v": [0.0, 0.0], "ver": [0, 0]})
    )
    incoming = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1, 3], "v": [5.0, 7.0, 9.0], "ver": [2, 1, 1]}
        )
    ).repartition(4)  # physical order now arbitrary
    out = (
        merge_append(existing, incoming, ["k"], "keep_last", order_col="ver")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["k"]) == [1, 2, 3]
    assert out.loc[out["k"] == 1, "v"].iloc[0] == 5.0  # ver=2 wins
    assert out.loc[out["k"] == 3, "v"].iloc[0] == 9.0


# ---------------------------------------------------------------------------
# minhash/LSH parameter validation
# ---------------------------------------------------------------------------
def test_minhash_num_hashes_validation(spark):
    from pystore_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match=r"num_hashes"):
        minhash_signature(F.array(F.lit("x")), num_hashes=129)
    with pytest.raises(ValueError, match=r"num_hashes"):
        minhash_signature(F.array(F.lit("x")), num_hashes=0)
    df = spark.createDataFrame(pd.DataFrame({"id": [1], "text": ["abcd"]}))
    with pytest.raises(ValueError, match=r"multiple"):
        lsh_candidate_pairs(df, "text", "id", num_hashes=8, bands=3)


# ---------------------------------------------------------------------------
# read_in_chunks: exact chunking + filter/column pushdown
# ---------------------------------------------------------------------------
def test_read_in_chunks_exact_sizes_and_filters(test_collection):
    n = 250
    idx = pd.date_range("2024-01-01", periods=n, freq="h")
    df = pd.DataFrame(
        {"value": np.arange(n, dtype=float), "tag": ["a", "b"] * (n // 2)},
        index=idx,
    )
    test_collection.write("chunky", df)

    chunks = list(test_collection.read_in_chunks("chunky", chunk_size=100))
    assert [len(c) for c in chunks] == [100, 100, 50]
    assert sum(float(c["value"].sum()) for c in chunks) == pytest.approx(
        float(df["value"].sum())
    )

    filtered = list(
        test_collection.read_in_chunks(
            "chunky", chunk_size=1000, filters=[("tag", "==", "a")]
        )
    )
    total = sum(len(c) for c in filtered)
    assert total == n // 2
    assert all((c["tag"] == "a").all() for c in filtered)


def test_append_threaded(test_collection):
    idx = pd.date_range("2024-01-01", periods=20, freq="D")
    df = pd.DataFrame({"value": np.arange(20, dtype=float)}, index=idx)
    test_collection.write("thr", df)
    more = pd.DataFrame(
        {"value": [1.0] * 5},
        index=pd.date_range("2024-02-01", periods=5, freq="D"),
    )
    test_collection.append("thr", more, threaded=True)
    test_collection.wait_for_tasks()
    test_collection.clear_metadata_cache("thr")
    assert len(test_collection.item("thr").to_pandas()) == 25


# ---------------------------------------------------------------------------
# review fixes: categorical append, chunk_size validation, crash recovery
# ---------------------------------------------------------------------------
def test_categorical_survives_append_with_new_values(test_collection):
    n = 120
    idx = pd.date_range("2024-01-01", periods=n, freq="h")
    df = pd.DataFrame(
        {"label": ["red", "green", "blue"] * (n // 3),
         "v": np.arange(n, dtype=float)},
        index=idx,
    )
    test_collection.write("cat", df)
    casts = test_collection.optimize_item_dtypes("cat")
    assert casts.get("label") == "category"
    # append rows with a category value unseen at optimize time
    extra_idx = pd.date_range("2024-02-01", periods=4, freq="h")
    extra = pd.DataFrame(
        {"label": ["violet"] * 4, "v": [1.0] * 4}, index=extra_idx
    )
    test_collection.append("cat", extra)
    back = test_collection.item("cat").to_pandas()
    assert len(back) == n + 4
    # the new value must NOT be silently dropped to NaN
    assert back["label"].isna().sum() == 0
    assert "violet" in set(back["label"].astype(str))


def test_read_in_chunks_rejects_nonpositive_chunk_size(test_collection):
    idx = pd.date_range("2024-01-01", periods=10, freq="D")
    test_collection.write(
        "tiny", pd.DataFrame({"v": np.arange(10.0)}, index=idx)
    )
    with pytest.raises(ValueError, match="chunk_size"):
        next(test_collection.read_in_chunks("tiny", chunk_size=0))


def test_recover_item_gc_stale_and_orphans(test_collection, monkeypatch):
    """Manifest-era recovery: replaced files stay on disk through the
    retention window (so in-flight readers never miss a file), then
    recover_item garbage-collects them; staged-but-uncommitted orphans
    go after the orphan grace."""
    from pystore_spark import config, utils

    n = 40000  # enough rows for the time-bucketed layout
    idx = pd.date_range("2023-01-01", periods=n, freq="min")
    test_collection.write(
        "rec", pd.DataFrame({"v": np.arange(float(n))}, index=idx)
    )
    item_path = test_collection._item_path("rec")
    # an append replaces the touched bucket's file → it goes stale
    test_collection.append(
        "rec",
        pd.DataFrame({"v": [1e9]}, index=pd.DatetimeIndex(["2023-01-05"])),
    )
    man = utils.read_manifest(item_path)
    assert len(man["stale"]) == 1
    stale_rel = next(iter(man["stale"]))
    assert (item_path / stale_rel).exists()  # retained, not deleted
    # inside the retention window nothing is collected
    assert test_collection.recover_item("rec") == 0
    assert (item_path / stale_rel).exists()
    # past the window the stale file goes
    monkeypatch.setattr(config, "STALE_RETENTION_SECONDS", 0.0)
    assert test_collection.recover_item("rec") == 1
    assert not (item_path / stale_rel).exists()
    assert utils.read_manifest(item_path)["stale"] == {}
    # orphans (crash before commit) go after the orphan grace
    orphan = item_path / "_pb=2023-01" / "cafebabe-part-00000.parquet"
    orphan.write_bytes(b"not really parquet")
    assert test_collection.recover_item("rec") == 0  # inside grace
    monkeypatch.setattr(config, "ORPHAN_GRACE_SECONDS", 0.0)
    assert test_collection.recover_item("rec") == 1
    assert not orphan.exists()
    back = test_collection.item("rec").to_pandas()
    assert len(back) == n
