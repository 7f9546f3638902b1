"""Object-store execution of the manifest protocol (fs.py).

The commit protocol was *designed* for S3 (staged invisible files +
one atomic conditional-put pointer flip, no rename-of-committed-data);
this module *exercises* it against :class:`FakeS3FileSystem` — an
in-memory backend with honest S3 semantics: no rename (move is
copy+delete), no directories, list-after-write consistency, and
ETag conditional puts. The full write / append / read / GC / snapshot
/ lock cycle runs driver-side (Arrow path); Spark-scale jobs raise a
clear StorageError instead of silently touching local disk.
"""

from __future__ import annotations

import threading
import uuid

import numpy as np
import pandas as pd
import pytest

from pystore_spark import fs as fslib
from pystore_spark import utils
from pystore_spark import manifest as mf
from pystore_spark.exceptions import ConcurrentCommitError, StorageError
from pystore_spark.fs import FakeS3FileSystem


# ---------------------------------------------------------------------------
# FakeS3FileSystem semantics
# ---------------------------------------------------------------------------
def test_fake_s3_object_semantics():
    fs = FakeS3FileSystem()
    fs.put_atomic("/b/k1", b"v1")
    assert fs.read_bytes("/b/k1") == b"v1"
    assert fs.exists("/b/k1") and fs.exists("/b") and not fs.exists("/b/k2")
    # list-after-write, prefix listing, no directories
    fs.put_atomic("/b/d/k2.parquet", b"x" * 10)
    assert fs.list_files("/b", ".parquet") == ["/b/d/k2.parquet"]
    assert fs.list_subdirs("/b") == ["d"]
    assert fs.isdir("/b/d") and not fs.isdir("/b/k1")
    assert fs.size("/b/d/k2.parquet") == 10
    # move = copy+delete (staged objects only)
    fs.move("/b/d/k2.parquet", "/b/d/k3.parquet")
    assert not fs.exists("/b/d/k2.parquet")
    assert fs.read_bytes("/b/d/k3.parquet") == b"x" * 10
    fs.remove_prefix("/b/d")
    assert not fs.isdir("/b/d")
    with pytest.raises(FileNotFoundError):
        fs.read_bytes("/b/gone")


def test_fake_s3_conditional_put_cas():
    fs = FakeS3FileSystem()
    # If-None-Match:* — create only when absent
    etag1 = fs.put_atomic("/b/man.json", b"v1", if_match=None)
    with pytest.raises(ConcurrentCommitError):
        fs.put_atomic("/b/man.json", b"v2", if_match=None)
    # If-Match — replace only the version we read
    etag2 = fs.put_atomic("/b/man.json", b"v2", if_match=etag1)
    with pytest.raises(ConcurrentCommitError):
        fs.put_atomic("/b/man.json", b"v3", if_match=etag1)  # stale etag
    assert fs.etag("/b/man.json") == etag2
    assert fs.read_bytes("/b/man.json") == b"v2"


def test_fake_s3_mkdir_exclusive_is_lock_primitive():
    fs = FakeS3FileSystem()
    fs.mkdir_exclusive("/b/.lock")
    with pytest.raises(FileExistsError):
        fs.mkdir_exclusive("/b/.lock")
    fs.remove_prefix("/b/.lock")
    fs.mkdir_exclusive("/b/.lock")  # reusable after release


def test_resolve_warehouse_scheme_dispatch(tmp_path):
    # local + file:// unchanged
    assert fslib.resolve_warehouse(str(tmp_path)) == str(tmp_path)
    assert fslib.resolve_warehouse(f"file://{tmp_path}") == str(tmp_path)
    # fakes3 mounts and normalizes
    root = fslib.resolve_warehouse("fakes3://bkt-x/wh")
    assert root == f"{fslib.FAKE_S3_ROOT}/bkt-x/wh"
    assert isinstance(fslib.fs_for(root), FakeS3FileSystem)
    # real cloud schemes: actionable rejection, not a silent local write
    with pytest.raises(NotImplementedError, match="adapter"):
        fslib.resolve_warehouse("s3://bucket/wh")
    with pytest.raises(ValueError):
        fslib.resolve_warehouse("weird://x")


# ---------------------------------------------------------------------------
# engine protocol on the fake backend
# ---------------------------------------------------------------------------
@pytest.fixture()
def s3_collection(spark, monkeypatch):
    """A Collection whose warehouse lives on a fresh FakeS3 bucket."""
    import pystore_spark.config as config
    from pystore_spark.store import Store

    bucket = f"fakes3://t-{uuid.uuid4().hex[:8]}/wh"
    monkeypatch.setattr(config, "_path", None)
    monkeypatch.setenv("PYSTORE_SPARK_PATH", bucket)
    root = config.get_path()  # raw; Store resolves the scheme
    col = Store("s", spark=spark).collection("c")
    assert isinstance(col.fs, FakeS3FileSystem)
    yield col
    fslib.unmount(fslib.resolve_warehouse(bucket).rsplit("/wh", 1)[0])


def _frame(n, start="2023-01-01", freq="min", v0=0.0):
    return pd.DataFrame(
        {"v": np.arange(n, dtype="float64") + v0},
        index=pd.date_range(start, periods=n, freq=freq),
    )


def test_s3_write_read_roundtrip(s3_collection):
    df = _frame(40_000)
    s3_collection.write("m", df)
    man = utils.read_manifest(s3_collection._item_path("m"))
    assert man is not None and man["version"] == 1 and man["files"]
    out = s3_collection.item("m").to_pandas(engine="arrow")
    pd.testing.assert_frame_equal(
        out, df.rename_axis("index"), check_freq=False
    )
    # filtered + projected read prunes through the manifest
    it = s3_collection.item(
        "m", filters=[("index", ">=", pd.Timestamp("2023-01-15"))],
        columns=["v"],
    )
    got = it.to_pandas(engine="arrow")
    assert len(got) == len(df.loc["2023-01-15":])


def test_s3_append_and_gc(s3_collection):
    n = 40_000
    s3_collection.write("a", _frame(n))
    item_path = s3_collection._item_path("a")
    man1 = utils.read_manifest(item_path)
    # one upsert (key exists -> keep_last replaces) + one true append
    s3_collection.append(
        "a",
        pd.DataFrame(
            {"v": [1e9, 7.0]},
            index=pd.DatetimeIndex(["2023-01-02", "2023-02-01"]),
        ),
    )
    man2 = utils.read_manifest(item_path)
    assert man2["version"] == 2
    replaced = set(man1["files"]) - set(man2["files"])
    assert replaced and replaced == set(man2["stale"])
    # a reader of the OLD manifest still finds every file (MVCC window)
    fs = s3_collection.fs
    for rel in man1["files"]:
        assert fs.exists(item_path / rel)
    out = s3_collection.item("a").to_pandas(engine="arrow")
    assert len(out) == n + 1
    assert out.loc[pd.Timestamp("2023-01-02"), "v"] == 1e9
    # GC with retention 0 deletes the replaced objects and clears stale
    removed = s3_collection.vacuum("a", retention=0.0)
    assert removed == len(replaced)
    man3 = utils.read_manifest(item_path)
    assert man3["stale"] == {}
    for rel in replaced:
        assert not fs.exists(item_path / rel)
    assert len(s3_collection.item("a").to_pandas(engine="arrow")) == n + 1


def test_s3_concurrent_reads_never_see_missing_files(s3_collection):
    """The test_manifest.py concurrent-reader guarantee holds on the
    object-store backend: readers resolve through the manifest and see
    the pre- or post-append object set, never a partial one — with no
    rename anywhere in the commit."""
    n = 40_000
    s3_collection.write("c", _frame(n))

    errors: list[Exception] = []
    counts: list[int] = []
    done = threading.Event()

    def reader():
        while not done.is_set():
            try:
                out = s3_collection.item("c").to_pandas(engine="arrow")
                counts.append(len(out))
            except Exception as exc:  # pragma: no cover - the failure
                errors.append(exc)
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for i in range(6):
            extra = pd.DataFrame(
                {"v": [float(i)]},
                index=pd.DatetimeIndex([f"2023-02-0{i + 1}"]),
            )
            s3_collection.append("c", extra)
    finally:
        done.set()
        t.join(timeout=30)
    assert errors == []
    assert counts, "reader never completed a read"
    assert all(n <= c <= n + 6 for c in counts)
    assert counts == sorted(counts)
    assert len(s3_collection.item("c").to_pandas(engine="arrow")) == n + 6


def test_s3_commit_is_conditional_put(s3_collection):
    """A manifest installed by another writer between this writer's
    read and its commit loses the CAS — no lost update. A single race
    is absorbed by the append's retry (re-merge against the FRESH
    manifest, then commit); a persistent racer exhausts the 3 attempts
    and raises."""
    s3_collection.write("r", _frame(1_000))
    item_path = s3_collection._item_path("r")

    real_put = s3_collection.fs.put_atomic
    raced = {"n": 0, "always": False}

    def racing_put(path, data, if_match=fslib.UNCONDITIONAL):
        # simulate a concurrent writer sneaking in a manifest bump
        # right before OUR conditional manifest install
        if str(path).endswith("_manifest.json") and (
            raced["always"] or raced["n"] == 0
        ):
            raced["n"] += 1
            man, _ = utils.read_manifest_versioned(item_path)
            man["version"] = int(man["version"]) + 7
            import json

            real_put(path, json.dumps(man).encode())
        return real_put(path, data, if_match=if_match)

    s3_collection.fs.put_atomic = racing_put
    try:
        # one race: the retry re-reads the raced manifest and commits
        # ON TOP of it — neither write is lost
        s3_collection.append(
            "r",
            pd.DataFrame(
                {"v": [2.0]}, index=pd.DatetimeIndex(["2023-01-02"])
            ),
        )
        man = utils.read_manifest(item_path)
        assert man["version"] > 8  # raced bump survived, ours on top
        assert raced["n"] == 1
        assert (
            len(s3_collection.item("r").to_pandas(engine="arrow"))
            == 1_001
        )

        # a racer that wins EVERY attempt: retries exhaust and raise,
        # and the losing commit leaves no visible change
        raced["always"] = True
        before = utils.read_manifest(item_path)["version"]
        with pytest.raises(ConcurrentCommitError):
            s3_collection.append(
                "r",
                pd.DataFrame(
                    {"v": [3.0]},
                    index=pd.DatetimeIndex(["2023-01-03"]),
                ),
            )
        assert (
            len(s3_collection.item("r").to_pandas(engine="arrow"))
            == 1_001
        )
        assert utils.read_manifest(item_path)["version"] > before
    finally:
        s3_collection.fs.put_atomic = real_put


def test_s3_snapshot_is_o_manifest(s3_collection):
    n = 20_000
    df = _frame(n)
    s3_collection.write("s", df)
    snap = s3_collection.create_snapshot("pit")
    sdir = s3_collection._snapshot_root / snap / "s"
    fs = s3_collection.fs
    # O(manifest): no data objects copied into the snapshot prefix
    assert fs.list_files(sdir, ".parquet") == []
    assert utils.read_manifest(sdir)["base"]
    s3_collection.append(
        "s", pd.DataFrame({"v": [7.0]}, index=pd.DatetimeIndex(["2024-06-01"]))
    )
    assert len(
        s3_collection.item("s", snapshot=snap).to_pandas(engine="arrow")
    ) == n
    assert len(s3_collection.item("s").to_pandas(engine="arrow")) == n + 1
    # GC protects snapshot-referenced objects even at retention 0
    s3_collection.vacuum("s", retention=0.0)
    assert len(
        s3_collection.item("s", snapshot=snap).to_pandas(engine="arrow")
    ) == n
    # delete_item materializes the snapshot via server-side copy
    s3_collection.delete_item("s")
    out = s3_collection.item("s", snapshot=snap).to_pandas(engine="arrow")
    assert len(out) == n
    assert utils.read_manifest(sdir).get("base") is None


def test_s3_collection_lock(s3_collection):
    from pystore_spark.transactions import CollectionLock

    with CollectionLock(s3_collection, timeout=5.0) as lock:
        assert lock.held
        rival = CollectionLock(
            s3_collection, timeout=0.3, retry_interval=0.05
        )
        from pystore_spark.exceptions import TransactionError

        with pytest.raises(TransactionError):
            rival.acquire()
    # released → acquirable again
    with CollectionLock(s3_collection, timeout=5.0):
        pass


def test_s3_spark_scale_ops_raise_clearly(s3_collection, monkeypatch):
    from pystore_spark import config

    s3_collection.write("g", _frame(100))
    # Spark scan path refuses (driver-side backend)
    with pytest.raises(StorageError, match="driver-side only"):
        _ = s3_collection.item("g").data
    # over-threshold write falls through the Arrow gate and refuses
    # rather than letting the Spark JVM write to a phantom local path
    monkeypatch.setattr(config, "DRIVER_PATH_MAX_BYTES", 0)
    with pytest.raises(StorageError, match="Spark-accessible"):
        s3_collection.write("big", _frame(10), overwrite=True)


def test_s3_gc_orphan_cleanup(s3_collection, monkeypatch):
    """Objects staged by a crashed writer (never named by any manifest)
    are GC'd once aged past the orphan grace window."""
    s3_collection.write("o", _frame(1_000))
    item_path = s3_collection._item_path("o")
    fs = s3_collection.fs
    orphan = item_path / "_pb=2023-01" / "deadbeef-part-99.parquet"
    fs.put_atomic(orphan, b"not really parquet")
    # invisible to readers
    assert len(s3_collection.item("o").to_pandas(engine="arrow")) == 1_000
    assert s3_collection.vacuum("o") == 0  # inside grace window: kept
    assert fs.exists(orphan)
    from pystore_spark import config

    monkeypatch.setattr(config, "ORPHAN_GRACE_SECONDS", 0.0)
    assert s3_collection.vacuum("o") == 1
    assert not fs.exists(orphan)
    assert len(s3_collection.item("o").to_pandas(engine="arrow")) == 1_000


def test_s3_time_travel(s3_collection):
    """History objects are plain puts; a historical read is one GET
    plus the version's manifest-resolved Arrow scan — the protocol's
    payoff carries over to object-store semantics unchanged."""
    c = s3_collection
    c.write("tt", _frame(3_000))
    c.append("tt", _frame(500, start="2023-04-01", v0=10_000.0))
    assert [v["version"] for v in c.item_versions("tt")] == [2, 1]
    old = c.item("tt", version=1).to_pandas(engine="arrow")
    assert len(old) == 3_000 and old["v"].max() == 2_999.0
    live = c.item("tt").to_pandas(engine="arrow")
    assert len(live) == 3_500
    # GC on a zero-retention clock expires v1
    mf.gc_item(c.path, "tt", retention=0.0, orphan_grace=0.0)
    with pytest.raises(Exception) as ei:
        c.item("tt", version=1)
    assert "retention" in str(ei.value) or "GC" in str(ei.value)


def test_s3_dedup_index_cycle(s3_collection):
    """The incremental near-dedup index runs entirely on the
    object-store backend: build, probed append (drop + survive +
    delta), fold — every commit the conditional-put manifest swap.
    Index frames are driver-bounded at this scale, so the Arrow path
    handles all writes; the engine never needs a Spark-readable FS."""
    import pandas as pd

    c = s3_collection
    base = (
        "the quick brown fox jumps over the lazy dog and runs far "
        "away today while the sun shines over the quiet valley "
    )
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": [base + f"tail {i} " + "filler words here " * 3
                 for i in range(6)],
    })
    c.write("docs", docs, index_col="doc_id")
    c.build_dedup_index("didx", "docs")
    inc = pd.DataFrame({
        "doc_id": [100, 101],
        "text": [docs.loc[3, "text"],
                 "wholly novel content about conditional puts and "
                 "manifest pointer swaps on object stores"],
    })
    rep = c.append_dedup("docs", inc, "didx")
    assert rep["dropped_ids"] == [100]
    ids = set(
        c.item("docs").to_pandas(engine="arrow").reset_index()["doc_id"]
    )
    assert ids == set(range(6)) | {101}
    folded = c.refresh_dedup_index("didx")
    assert folded["docs_folded"] == 1


def test_s3_vector_index_cycle(s3_collection):
    """The persistent IVF vector index also runs end to end on the
    driver-side-only backend: build, delta append, search (base ∪
    delta), fold."""
    import numpy as np
    import pandas as pd

    c = s3_collection
    rng = np.random.default_rng(7)
    vecs = pd.DataFrame({
        "vec_id": range(40),
        "embedding": [rng.standard_normal(8).tolist() for _ in range(40)],
    })
    c.write("emb", vecs, index_col="vec_id")
    c.build_vector_index("eidx", "emb", n_cells=2, n_iters=1)
    extra = pd.DataFrame({
        "vec_id": [100],
        "embedding": [vecs.loc[5, "embedding"]],
    })
    c.append_vector_index(
        "eidx", c.spark.createDataFrame(extra)
    )
    q = c.spark.createDataFrame(
        pd.DataFrame({"vec_id": [999], "embedding": [vecs.loc[5, "embedding"]]})
    )
    got = c.search_vector_index("eidx", q, k=2, nprobe=2).collect()
    ids = {r["vec_id"] for r in got}
    assert {5, 100} == ids, "exact twins (base + delta) must be top-2"
    folded = c.refresh_vector_index("eidx")
    assert folded["folded"] == 1


def test_s3_bloom_sidecars(s3_collection):
    """Bloom build + probe through the object-store backend: sidecar
    writes go through fs.open_write, loads through fs.open_read, and
    the driver-only backend keeps working (spark_readable=False forces
    the driver builder)."""
    df = _frame(5_000)
    df["doc_id"] = [f"d-{i:05d}" for i in range(len(df))]
    s3_collection.write("bl", df, bloom=["doc_id"], npartitions=4)
    it = s3_collection.item("bl", filters=[("doc_id", "==", "d-00042")])
    rep = it.scan_report()
    assert rep["n_files_live"] == 4 and rep["n_files_selected"] <= 2
    got = it.to_pandas(engine="arrow")
    assert len(got) == 1 and got["doc_id"].iloc[0] == "d-00042"
    missing = s3_collection.item("bl", filters=[("doc_id", "==", "zz")])
    assert missing.scan_report()["bloom_proven_empty"]
    assert len(missing.to_pandas(engine="arrow")) == 0


class TestS3DMLBoundary:
    """The documented object-store boundary for the row-level DML
    surface (VERDICT r7 item 3): FakeS3 is driver-side only, so every
    op that must run a Spark job over the item's files — the rewrite
    scan, the dv match scan + mask write, merge's source join — fails
    CRISPLY up front (StorageError naming the boundary), never
    mid-plan and never after a partial metadata commit. Metadata-only
    lifecycle (snapshot, time travel, restore, vacuum) keeps working.
    """

    def _seed(self, c):
        c.write("d", _frame(2_000))
        return c

    @pytest.mark.parametrize("mode", ["rewrite", "dv"])
    def test_delete_where_refused(self, s3_collection, mode):
        c = self._seed(s3_collection)
        with pytest.raises(StorageError, match="Spark-accessible"):
            c.delete_where("d", [("v", "<", 10.0)], mode=mode)
        # nothing committed: full row count, no dv map
        man = utils.read_manifest(c._item_path("d"))
        assert not (man or {}).get("dv")
        assert len(c.item("d").to_pandas(engine="arrow")) == 2_000

    @pytest.mark.parametrize("mode", ["rewrite", "dv"])
    def test_update_where_refused(self, s3_collection, mode):
        c = self._seed(s3_collection)
        with pytest.raises(StorageError, match="Spark-accessible"):
            c.update_where(
                "d", [("v", "<", 10.0)], set={"v": "0.0"}, mode=mode
            )

    def test_delete_range_refused_before_any_commit(
        self, s3_collection
    ):
        """The guard must fire BEFORE the metadata-only bucket-drop
        phase — failing at the later row-level pass would leave the
        drop permanently applied under an error that suggests
        nothing happened."""
        c = self._seed(s3_collection)
        man0 = utils.read_manifest(c._item_path("d"))
        with pytest.raises(StorageError, match="Spark-accessible"):
            c.delete_range("d", before=pd.Timestamp("2023-01-02"))
        man1 = utils.read_manifest(c._item_path("d"))
        assert man1["files"] == man0["files"]
        assert man1["version"] == man0["version"]

    def test_merge_into_refused(self, s3_collection):
        c = self._seed(s3_collection)
        src = pd.DataFrame(
            {"v": [1.0]},
            index=pd.DatetimeIndex([pd.Timestamp("2023-01-01")]),
        )
        with pytest.raises(StorageError, match="Spark-accessible"):
            c.merge_into("d", src, on="index")

    def test_metadata_lifecycle_still_works(self, s3_collection):
        """Snapshots, time travel, restore, and vacuum are manifest
        pointer operations — all serve on the driver-side backend."""
        c = self._seed(s3_collection)
        snap = c.create_snapshot("keep")
        c.append(
            "d",
            pd.DataFrame(
                {"v": [9.9]},
                index=pd.DatetimeIndex([pd.Timestamp("2023-02-01")]),
            ),
        )
        assert len(c.item("d").to_pandas(engine="arrow")) == 2_001
        old = c.item("d", snapshot=snap).to_pandas(engine="arrow")
        assert len(old) == 2_000
        v1 = c.item("d", version=1).to_pandas(engine="arrow")
        assert len(v1) == 2_000
        c.restore("d", 1)
        assert len(c.item("d").to_pandas(engine="arrow")) == 2_000
        assert c.vacuum("d", retention=0.0) >= 0
