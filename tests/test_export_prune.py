"""Shard-refresh source pruning (round-10 verdict #1): the rebuild
must not read the corpus text corpus-wide. Shard membership comes
from COLUMN-PRUNED scans (the id column alone for unsplit exports;
the export's partition-pruned (_src_id, shard) columns for split
ones), and the full-width source then restricts by tier — a pushable
In(id) predicate, a broadcast left-semi join, or (bulk) the honest
full scan. These tests pin (a) byte-equality with a full re-export in
EVERY tier, (b) the plan evidence (PushedFilters / id-only
ReadSchema), (c) the O(affected) balance restamp, and (d) the
read-compute-commit guard on the partition-scoped refresh commit."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "today while the sun shines bright over the quiet green valley "
)


def _docs(ids, tail=""):
    return pd.DataFrame(
        {
            "doc_id": list(ids),
            "text": [
                BASE + f"unique tail {i} " + "filler words " * 3 + tail
                for i in ids
            ],
        }
    )


def _force_tier(monkeypatch, tier: str) -> None:
    from pystore_spark import config

    # test corpora are far below the size gate that keeps toy-scale
    # refreshes on the plain scan — zero it so the tiers engage
    monkeypatch.setattr(config, "EXPORT_PRUNE_MIN_SOURCE_BYTES", 0)
    if tier == "semi_join":
        monkeypatch.setattr(config, "EXPORT_PRUNE_ISIN_CAP", 0)
    elif tier == "full_scan":
        monkeypatch.setattr(
            config, "EXPORT_PRUNE_FULLSCAN_FRACTION", 0.0
        )


def _mutate(c):
    c.append("corpus", _docs(range(40, 43)))
    upd = _docs([3])
    upd["text"] = "completely rewritten text for document three " * 3
    c.append("corpus", upd)
    c.delete_where("corpus", [("doc_id", "==", 7)])
    return [3, 7, 40, 41, 42]


@pytest.mark.parametrize("tier", ["isin", "semi_join", "full_scan"])
def test_refresh_prune_tiers_byte_equal_unsplit(
    test_collection, monkeypatch, tier
):
    """Every prune tier reproduces the full re-export byte-for-byte —
    the speedup is never bought with drift — and the report names the
    tier actually taken."""
    c = test_collection
    c.write("corpus", _docs(range(40)), index_col="doc_id")
    # 16 shards: 5 changed docs stay under the fullscan-fraction
    # cutover, so the forced tier is the one actually taken
    c.export_training_shards(
        "shards", "corpus", n_shards=16, pack_budget=64
    )
    changed = _mutate(c)
    _force_tier(monkeypatch, tier)
    rep = c.refresh_training_shards("shards", changed)
    assert rep["source_prune"] == tier
    c.export_training_shards(
        "shards_full", "corpus", n_shards=16, pack_budget=64
    )
    cols = ["shard", "shard_pos", "doc_id", "text", "n_tokens",
            "pack_id"]
    got = (
        c.item("shards").data.select(cols)
        .orderBy(*cols).toPandas().reset_index(drop=True)
    )
    want = (
        c.item("shards_full").data.select(cols)
        .orderBy(*cols).toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # O(affected) restamp: totals correct without a footer sweep
    em = c.get_item_metadata("shards")["_training_export"]
    assert em["n_rows"] == 42
    assert sum(em["shard_rows"].values()) == 42


@pytest.mark.parametrize("tier", ["isin", "semi_join"])
def test_refresh_prune_tiers_byte_equal_split(
    test_collection, monkeypatch, tier
):
    """Split exports: membership comes from the export's own
    (_src_id, shard) columns (unchanged docs keep their old chunk
    keys) ∪ the changed ids — never a corpus-wide chunking pass; the
    int doc_id exercises the unescape-and-cast push path."""
    c = test_collection
    long_text = " ".join(f"w{i}" for i in range(100))
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, 9)),
            "text": [long_text] + [
                f"short document number {i} with several words"
                for i in range(2, 9)
            ],
        }
    )
    c.write("corpus", docs, index_col="doc_id")
    c.export_training_shards(
        "sh", "corpus", n_shards=12, split_max_tokens=40,
        split_overlap=4,
    )
    upd = pd.DataFrame(
        {"doc_id": [1], "text": ["now just a handful of tokens"]}
    )
    c.append("corpus", upd)
    c.delete_where("corpus", [("doc_id", "==", 5)])
    _force_tier(monkeypatch, tier)
    rep = c.refresh_training_shards("sh", [1, 5])
    assert rep["source_prune"] == tier
    c.export_training_shards(
        "sh_full", "corpus", n_shards=12, split_max_tokens=40,
        split_overlap=4,
    )
    cols = ["shard", "shard_pos", "doc_id", "text"]
    got = (
        c.item("sh").data.select(cols)
        .orderBy(*cols).toPandas().reset_index(drop=True)
    )
    want = (
        c.item("sh_full").data.select(cols)
        .orderBy(*cols).toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_refresh_prune_isin_pushes_to_parquet(test_collection):
    """The takedown case: a driver-sized key set becomes a PUSHED
    In(doc_id) predicate on the source scan — parquet row-group stats
    / dictionaries skip the text pages outright, the evidence the
    round-10 verdict asked for."""
    c = test_collection
    c.write("corpus", _docs(range(40)), index_col="doc_id")
    c.export_training_shards("shards", "corpus", n_shards=8)
    em = c.get_item_metadata("shards")["_training_export"]
    pruned, tier = c._pruned_refresh_source(
        c.item("corpus").data, em, [0, 3]
    )
    assert tier == "isin"
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(doc_id" in plan


def test_refresh_prune_membership_scan_is_id_only(
    test_collection, monkeypatch
):
    """In the semi-join tier the key side of the plan reads the id
    column alone — the membership pass must never widen to text."""
    from pystore_spark import config

    c = test_collection
    c.write("corpus", _docs(range(40)), index_col="doc_id")
    c.export_training_shards("shards", "corpus", n_shards=8)
    em = c.get_item_metadata("shards")["_training_export"]
    monkeypatch.setattr(config, "EXPORT_PRUNE_ISIN_CAP", 0)
    pruned, tier = c._pruned_refresh_source(
        c.item("corpus").data, em, [0, 3]
    )
    assert tier == "semi_join"
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan
    schemas = [
        ln.split("ReadSchema:", 1)[1]
        for ln in plan.splitlines()
        if "ReadSchema:" in ln
    ]
    assert len(schemas) >= 2  # the wide side and the key side
    assert any("text" not in s for s in schemas), schemas


def test_refresh_detects_concurrent_commit(
    test_collection, monkeypatch
):
    """expect_files on the refresh commit (ADVICE r10): a commit that
    lands on the same shard between the rebuild's plan-time manifest
    read and its CAS raises ConcurrentCommitError instead of having
    its files silently staled — the compact/append discipline."""
    from pystore_spark.exceptions import ConcurrentCommitError

    c = test_collection
    c.write("corpus", _docs(range(30)), index_col="doc_id")
    c.export_training_shards("expc", "corpus", n_shards=4)
    upd = _docs([5])
    upd["text"] = "edited text five"
    c.append("corpus", upd)

    orig = type(c)._pruned_refresh_source
    fired = {}

    def hooked(self, df, em, affected, **kw):
        if "x" not in fired:
            fired["x"] = True
            # a concurrent refresh of the SAME shard commits first
            c.refresh_training_shards("expc", [5])
        return orig(self, df, em, affected, **kw)

    monkeypatch.setattr(type(c), "_pruned_refresh_source", hooked)
    with pytest.raises(ConcurrentCommitError):
        c.refresh_training_shards("expc", [5])
    # the loser changed nothing: the winner's rows are live
    ids = {
        r["doc_id"] for r in c.item("expc").data.select("doc_id").collect()
    }
    assert ids == set(range(30))


def test_refresh_restamp_reads_no_untouched_footers(
    test_collection, monkeypatch
):
    """The balance restamp is O(affected): only the rebuilt shards'
    counts are recomputed (from the already-checkpointed rebuild
    frame) — no footer read of untouched shard files (ADVICE r10: at
    100k shards the restamp's footer sweep dominated the refresh)."""
    import pyarrow.parquet as pq

    c = test_collection
    c.write("corpus", _docs(range(40)), index_col="doc_id")
    c.export_training_shards("shards", "corpus", n_shards=8)
    c.append("corpus", _docs([99]))

    opened = []
    orig = pq.ParquetFile

    class Spy:
        def __new__(cls, fh, *a, **kw):
            opened.append(fh)
            return orig(fh, *a, **kw)

    monkeypatch.setattr(pq, "ParquetFile", Spy)
    rep = c.refresh_training_shards("shards", [99])
    assert rep["n_shards_rebuilt"] == 1
    assert opened == []  # shard_rows map carried forward, no footers
    em = c.get_item_metadata("shards")["_training_export"]
    assert em["n_rows"] == 41
    assert sum(em["shard_rows"].values()) == 41


def test_small_source_auto_selects_plain_scan(test_collection):
    """Below EXPORT_PRUNE_MIN_SOURCE_BYTES the whole text scan is
    cheaper than any key-set pass — the refresh must pick the plain
    plan on its own (measured: every prune tier loses at toy scale;
    they exist for the 100 TB regime)."""
    c = test_collection
    c.write("corpus", _docs(range(40)), index_col="doc_id")
    c.export_training_shards(
        "shards", "corpus", n_shards=16, pack_budget=64
    )
    c.append("corpus", _docs([99]))
    rep = c.refresh_training_shards("shards", [99])
    assert rep["source_prune"] == "full_scan"


def test_split_string_ids_with_escapes_unescape_and_push(
    test_collection, monkeypatch
):
    """Split exports keyed by STRING ids containing the escape
    characters ('#', '\\'): the capped path must UNESCAPE the export's
    _src_id keys back to the raw id domain so the filter pushes as
    In(doc_id), the refresh stays byte-equal, and the unescape
    exactly inverts the injective encoding."""
    from pystore_spark import config

    c = test_collection
    long_text = " ".join(f"w{i}" for i in range(90))
    docs = pd.DataFrame(
        {
            "doc_id": ["a#1", "a\\2", "plain", "x#y#z"],
            "text": [
                long_text,
                f"short doc two {long_text[:40]}",
                "short document three with several words",
                "short document four with several words",
            ],
        }
    )
    c.write("corpus", docs, index_col="doc_id")
    c.export_training_shards(
        "sh", "corpus", n_shards=12, split_max_tokens=40,
    )
    upd = pd.DataFrame(
        {"doc_id": ["a#1"], "text": ["tiny replacement text"]}
    )
    c.append("corpus", upd)
    monkeypatch.setattr(config, "EXPORT_PRUNE_MIN_SOURCE_BYTES", 0)
    rep = c.refresh_training_shards("sh", ["a#1"])
    # string ids unescape and push as In(doc_id) — the isin tier
    assert rep["source_prune"] == "isin"
    c.export_training_shards(
        "sh_full", "corpus", n_shards=12, split_max_tokens=40,
    )
    cols = ["shard", "shard_pos", "doc_id", "text"]
    got = (
        c.item("sh").data.select(cols)
        .orderBy(*cols).toPandas().reset_index(drop=True)
    )
    want = (
        c.item("sh_full").data.select(cols)
        .orderBy(*cols).toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the unescape inverts the injective encoding exactly
    from pystore_spark.collection import Collection
    from pyspark.sql import types as T

    vals, ok = Collection._unescape_export_ids(
        ["a\\#1", "a\\\\2", "x\\#y\\#z"], T.StringType()
    )
    assert ok and vals == ["a#1", "a\\2", "x#y#z"]
