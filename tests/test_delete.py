"""Row-level DELETE / retention (Collection.delete_where /
delete_range) — Delta-style deletes re-expressed on the manifest
protocol: candidate buckets prune on the driver, only buckets holding
matching rows rewrite, whole in-range buckets drop as a pure manifest
edit, and readers see pre- or post-delete, never partial."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pystore_spark import manifest as mf
from pystore_spark import utils


def _frame(n, start="2023-01-01", freq="min"):
    return pd.DataFrame(
        {
            "v": np.arange(n, dtype="float64"),
            "w": np.arange(n, dtype="float64") * 2.0,
        },
        index=pd.date_range(start, periods=n, freq=freq),
    )


def _buckets(item_path):
    man = utils.read_manifest(item_path)
    return sorted(
        {
            b
            for b in (mf._bucket_of(rel) for rel in man["files"])
            if b is not None
        }
    )


def test_delete_where_rewrites_only_matching_buckets(test_collection):
    c = test_collection
    # ~90k minute rows over 3 months → time layout, monthly buckets
    c.write("d", _frame(90_000))
    item_path = c._item_path("d")
    man_before = utils.read_manifest(item_path)
    assert _buckets(item_path) == ["2023-01", "2023-02", "2023-03"]

    # predicate touches ONLY February rows
    rep = c.delete_where(
        "d",
        [
            ("index", ">=", pd.Timestamp("2023-02-10")),
            ("index", "<", pd.Timestamp("2023-02-12")),
        ],
    )
    assert rep["n_deleted"] == 2 * 24 * 60
    assert rep["buckets_rewritten"] == ["2023-02"]
    assert rep["buckets_dropped"] == []

    # untouched buckets keep their EXACT file pointers
    man_after = utils.read_manifest(item_path)
    before_map = mf.bucket_file_map(man_before)
    after_map = mf.bucket_file_map(man_after)
    for b in ("_pb=2023-01", "_pb=2023-03"):
        assert before_map[b] == after_map[b]
    assert before_map["_pb=2023-02"] != after_map["_pb=2023-02"]

    out = c.item("d").to_pandas()
    assert len(out) == 90_000 - rep["n_deleted"]
    assert out.loc["2023-02-10":"2023-02-11 23:59"].empty
    assert not out.loc["2023-02-09"].empty
    # second run: nothing left to delete
    rep2 = c.delete_where(
        "d",
        [
            ("index", ">=", pd.Timestamp("2023-02-10")),
            ("index", "<", pd.Timestamp("2023-02-12")),
        ],
    )
    assert rep2["n_deleted"] == 0


def test_delete_where_drops_fully_matching_bucket(test_collection):
    c = test_collection
    c.write("d", _frame(90_000))
    rep = c.delete_where(
        "d",
        [
            ("index", ">=", pd.Timestamp("2023-02-01")),
            ("index", "<", pd.Timestamp("2023-03-01")),
        ],
    )
    assert rep["buckets_dropped"] == ["2023-02"]
    assert rep["buckets_rewritten"] == []
    assert _buckets(c._item_path("d")) == ["2023-01", "2023-03"]
    out = c.item("d").to_pandas()
    assert out.loc["2023-02"].empty
    assert len(out) == 90_000 - rep["n_deleted"]


def test_delete_where_non_index_predicate(test_collection):
    c = test_collection
    c.write("d", _frame(90_000))
    rep = c.delete_where("d", [("v", "<", 100.0)])
    assert rep["n_deleted"] == 100
    out = c.item("d").to_pandas()
    assert float(out["v"].min()) == 100.0


def test_delete_range_drops_whole_buckets_metadata_only(
    test_collection,
):
    c = test_collection
    c.write("d", _frame(90_000))
    item_path = c._item_path("d")
    man_before = utils.read_manifest(item_path)
    feb_files = mf.bucket_file_map(man_before)["_pb=2023-02"]

    cutoff = pd.Timestamp("2023-02-15")
    rep = c.delete_range("d", before=cutoff)
    # January dropped without a rewrite; February (boundary) rewritten
    assert "2023-01" in rep["buckets_dropped"]
    assert rep["buckets_rewritten"] == ["2023-02"]
    out = c.item("d").to_pandas()
    assert out.index.min() == cutoff
    # the dropped bucket's files moved to the stale map, not deleted
    man_after = utils.read_manifest(item_path)
    live = set(man_after["files"])
    assert not any(f.startswith("_pb=2023-01/") for f in live)
    assert feb_files[0] not in live  # boundary bucket replaced

    # filtered reads agree with the retention cut
    again = c.item(
        "d", filters=[("index", "<", pd.Timestamp("2023-02-20"))]
    ).to_pandas()
    assert again.index.min() == cutoff


def test_delete_range_counts_exclude_dv_masked_rows(test_collection):
    """REGRESSION (round-8 ADVICE): the whole-bucket metadata drop
    summed raw parquet footer num_rows, re-reporting rows a prior dv
    delete already removed merge-on-read. n_deleted must account
    only LIVE rows, mirroring n_rows()'s dv subtraction."""
    c = test_collection
    c.write("d", _frame(90_000))
    # dv-delete 150 rows that live entirely in January
    rep0 = c.delete_where(
        "d", [[("v", ">=", 100.0), ("v", "<", 250.0)]], mode="dv"
    )
    assert rep0["n_deleted"] == 150
    live_before = c.item("d").n_rows()

    cutoff = pd.Timestamp("2023-02-01")
    rep = c.delete_range("d", before=cutoff)
    assert "2023-01" in rep["buckets_dropped"]
    jan_live = 31 * 24 * 60 - 150  # footer rows minus masked rows
    assert rep["n_deleted"] == jan_live
    assert c.item("d").n_rows() == live_before - jan_live


def test_delete_everything_refused(test_collection):
    from pystore_spark.exceptions import StorageError

    c = test_collection
    c.write("d", _frame(90_000))
    with pytest.raises(StorageError, match="use delete_item"):
        c.delete_range("d", before=pd.Timestamp("2024-01-01"))
    with pytest.raises(StorageError, match="use delete_item"):
        c.delete_where("d", [("v", ">=", 0.0)])
    # the refused operations left the item intact
    assert c.item("d").data.count() == 90_000


def test_delete_where_size_layout_item(test_collection):
    c = test_collection
    c.write("small", _frame(500))
    rep = c.delete_where("small", [("v", "<", 50.0)])
    assert rep["n_deleted"] == 50
    assert len(c.item("small").to_pandas()) == 450


def test_delete_then_time_travel_still_sees_old_rows(test_collection):
    """Deleted rows stay readable through version time travel until
    vacuum — the retention window contract."""
    c = test_collection
    c.write("d", _frame(90_000))
    v_before = utils.read_manifest(c._item_path("d"))["version"]
    c.delete_where("d", [("v", "<", 1000.0)])
    old = c.item("d", version=v_before).to_pandas()
    assert len(old) == 90_000
    assert len(c.item("d").to_pandas()) == 89_000


def test_delete_then_index_audit_and_repair(test_collection):
    """Deletes make derived indexes stale BY DESIGN; the fsck reports
    it and repair_index heals it — the documented lifecycle."""
    import pandas as pd

    c = test_collection
    base = (
        "the quick brown fox jumps over the lazy dog and runs far "
        "away today while the sun shines over the quiet valley "
    )
    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": [base + f"tail {i} " + "filler words here " * 3
                 for i in range(8)],
    })
    c.write("corpus", docs, index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")

    rep = c.delete_where("corpus", [("doc_id", ">=", 6)])
    assert rep["n_deleted"] == 2
    audit = c.verify_index("corpus", "cidx")
    assert not audit["ok"] and audit["n_stale"] == 2

    c.repair_index("corpus", "cidx")
    assert c.verify_index("corpus", "cidx")["ok"]
    # the deleted docs no longer shadow future near-dups of themselves
    redup = pd.DataFrame({
        "doc_id": [100],
        "text": [docs.loc[7, "text"] + " extra"],
    })
    assert c.append_dedup("corpus", redup, "cidx")["n_dropped"] == 0


def test_delete_where_repair_indexes_one_call(test_collection):
    """Round-6 brief item 3: delete → index consistency in ONE
    motion. delete_where(..., repair_indexes=True) must leave every
    covering index clean — a probe that previously matched a deleted
    doc no longer drops incoming docs, with NO manual repair_index
    call."""
    import pandas as pd

    c = test_collection
    base = (
        "the quick brown fox jumps over the lazy dog and runs far "
        "away today while the sun shines over the quiet valley "
    )
    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": [base + f"tail {i} " + "filler words here " * 3
                 for i in range(8)],
    })
    c.write("corpus", docs, index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")

    # sanity: before the delete, a near-dup of doc 7 WOULD drop
    redup = pd.DataFrame({
        "doc_id": [100], "text": [docs.loc[7, "text"] + " extra"],
    })
    assert len(c.probe_dedup_index(
        "cidx", c.spark.createDataFrame(redup)
    ).collect()) == 1

    rep = c.delete_where(
        "corpus", [("doc_id", ">=", 6)], repair_indexes=True
    )
    assert rep["n_deleted"] == 2
    assert "cidx" in rep["index_repairs"]
    assert rep["index_repairs"]["cidx"]["n_removed"] == 2
    # no manual repair call: the audit is already clean and the
    # deleted docs no longer shadow future near-dups of themselves
    assert c.verify_index("corpus", "cidx")["ok"]
    assert c.append_dedup("corpus", redup, "cidx")["n_dropped"] == 0

    # opt-out keeps the documented stale-by-design behavior
    c.write("corpus2", docs, index_col="doc_id")
    c.build_dedup_index("cidx2", "corpus2")
    rep2 = c.delete_where("corpus2", [("doc_id", ">=", 6)])
    assert "index_repairs" not in rep2
    assert not c.verify_index("corpus2", "cidx2")["ok"]


def test_delete_range_repair_indexes_covers_metadata_drops(
    test_collection,
):
    """delete_range's pure-manifest bucket drops stale indexes just
    like row rewrites; repair_indexes=True must heal after BOTH
    phases."""
    import pandas as pd

    c = test_collection
    idx = pd.date_range("2024-01-01", periods=60, freq="D")
    docs = pd.DataFrame({
        "doc_id": range(60),
        "text": [
            "totally distinct prose block number "
            + " ".join(f"w{i}{j}" for j in range(25))
            for i in range(60)
        ],
        "ts": idx,
    })
    c.write("tcorp", docs, index_col="ts")
    c.build_dedup_index("tidx", "tcorp")
    rep = c.delete_range(
        "tcorp", before="2024-02-01", repair_indexes=True
    )
    assert rep["n_deleted"] == 31
    assert rep["index_repairs"]["tidx"]["n_removed"] == 31
    assert c.verify_index("tcorp", "tidx")["ok"]


def test_delete_range_refusal_is_atomic(test_collection):
    """Review finding: a cutoff beyond the data's end whose bucket
    label still matches the LAST bucket used to commit the metadata
    drop first and only then discover the boundary rewrite would
    empty the item — raising 'use delete_item' AFTER deleting 2/3 of
    the data. The refuse-to-empty check now runs before ANY commit."""
    from pystore_spark.exceptions import StorageError

    c = test_collection
    c.write("d", _frame(90_000))  # ends 2023-03-04 in bucket 2023-03
    v0 = utils.read_manifest(c._item_path("d"))["version"]
    with pytest.raises(StorageError, match="use delete_item"):
        c.delete_range("d", before=pd.Timestamp("2023-03-05"))
    # NOTHING committed: same manifest version, all buckets intact
    assert utils.read_manifest(c._item_path("d"))["version"] == v0
    assert c.item("d").data.count() == 90_000


def test_delete_where_rejects_empty_dnf(test_collection):
    c = test_collection
    c.write("d", _frame(500))
    with pytest.raises(ValueError, match="non-empty predicate"):
        c.delete_where("d", [[]])
    with pytest.raises(ValueError, match="non-empty predicate"):
        c.delete_where("d", [])


def test_delete_range_counts_metadata_dropped_rows(test_collection):
    c = test_collection
    c.write("d", _frame(90_000))
    rep = c.delete_range("d", before=pd.Timestamp("2023-02-15"))
    # n_deleted covers BOTH the metadata-only dropped buckets (footer
    # row counts) and the boundary rewrite
    assert rep["n_deleted"] == 90_000 - c.item("d").data.count()
    assert "n_deleted_metadata_unknown" not in rep


def test_delete_retries_when_append_lands_mid_delete(
    test_collection, monkeypatch
):
    """The observed-state guard closes the delete's read-compute-commit
    window: an append landing in a touched bucket between the delete's
    manifest read and its commit fails the CAS; the retry recomputes
    against the fresh manifest, so the appended rows survive and the
    matching rows are gone — no lost update in either direction."""
    import pystore_spark.collection as collection_mod

    c = test_collection
    c.write("d", _frame(90_000))

    raced = {"done": False}
    orig = collection_mod.Collection._install_buckets

    def racing_install(self, item, write_fn, sidecar, **kw):
        if not raced["done"] and item == "d" and kw.get("drop_buckets") is None:
            raced["done"] = True
            # sneak an append into February (a bucket the delete is
            # rewriting) AFTER the delete computed its kept rows
            extra = pd.DataFrame(
                {"v": [111.0], "w": [222.0]},
                index=pd.DatetimeIndex(["2023-02-20 00:00:30"]),
            )
            monkeypatch.undo()
            c.append("d", extra)
            monkeypatch.setattr(
                collection_mod.Collection, "_install_buckets",
                racing_install,
            )
        return orig(self, item, write_fn, sidecar, **kw)

    monkeypatch.setattr(
        collection_mod.Collection, "_install_buckets", racing_install
    )
    rep = c.delete_where(
        "d",
        [
            ("index", ">=", pd.Timestamp("2023-02-10")),
            ("index", "<", pd.Timestamp("2023-02-12")),
        ],
    )
    monkeypatch.undo()
    assert rep["n_deleted"] == 2 * 24 * 60
    out = c.item("d").to_pandas()
    # the raced append's row survived the delete's bucket rewrite
    assert out.loc[pd.Timestamp("2023-02-20 00:00:30"), "v"] == 111.0
    assert out.loc["2023-02-10":"2023-02-11 23:59"].empty
    assert len(out) == 90_000 + 1 - rep["n_deleted"]


def test_delete_crash_before_manifest_write_leaves_item_intact(
    test_collection, monkeypatch
):
    """Crash-injection on the delete commit: dying after the bucket
    files are staged but before the manifest replace leaves only
    invisible staged files — the live view is untouched, and
    recover_item GCs the orphans (after the grace window; forced here
    with retention=0 semantics via gc_item)."""
    from pystore_spark import utils as u

    c = test_collection
    c.write("d", _frame(90_000))
    before = c.item("d").to_pandas()

    orig = u.write_manifest

    def boom(*a, **k):
        raise RuntimeError("crash before manifest write")

    monkeypatch.setattr(u, "write_manifest", boom)
    with pytest.raises(Exception, match="crash before manifest"):
        c.delete_where("d", [("v", "<", 100.0)])
    monkeypatch.undo()

    # live view unchanged — readers resolve through the manifest
    pd.testing.assert_frame_equal(
        c.item("d").to_pandas(), before, check_freq=False
    )
    # and the delete succeeds cleanly afterwards
    rep = c.delete_where("d", [("v", "<", 100.0)])
    assert rep["n_deleted"] == 100
    assert len(c.item("d").to_pandas()) == 89_900


def test_delete_preserves_concurrent_metadata_updates(
    test_collection, monkeypatch
):
    """Review finding: the delete used to commit a sidecar SNAPSHOT
    taken before its Spark jobs ran, silently reverting metadata a
    concurrent writer committed in the window (e.g. a streaming
    sink's replay marker on an untouched bucket — breaking
    exactly-once). Deletes are now metadata-preserving commits: the
    sidecar is re-read at the commit point under the etag CAS."""
    import pystore_spark.collection as collection_mod
    from pystore_spark.streaming import COMMITS_KEY

    c = test_collection
    c.write("d", _frame(90_000))
    raced = {"done": False}
    orig = collection_mod.Collection._install_buckets

    def hook(self, item, *a, **k):
        if not raced["done"] and item == "d":
            raced["done"] = True
            # concurrent marker commit landing after the delete's
            # metadata snapshot, before its manifest install

            def stamp(m):
                m[COMMITS_KEY] = {
                    **(m.get(COMMITS_KEY) or {}), "s": 7,
                }
                return m

            utils.update_metadata_cas(c._item_path("d"), stamp)
        return orig(self, item, *a, **k)

    monkeypatch.setattr(
        collection_mod.Collection, "_install_buckets", hook
    )
    c.delete_where("d", [("v", "<", 100.0)])
    monkeypatch.undo()
    meta = c.get_item_metadata("d", use_cache=False)
    assert (meta.get(COMMITS_KEY) or {}).get("s") == 7, (
        "the concurrent replay marker was reverted by the delete"
    )
    assert c.item("d").data.count() == 89_900
