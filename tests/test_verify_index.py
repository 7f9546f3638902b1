"""Collection.verify_index — the consistency fsck between a corpus
item and its derived indexes (dedup / line / vector). Each drift
category it reports is silently-wrong probe behavior until repaired,
so the audit itself must be trustworthy: healthy stores report ok,
and each seeded inconsistency is detected with example ids."""

from __future__ import annotations

import pandas as pd
import pytest

from pystore_spark import dedup_index as DI
from pystore_spark import line_index as LI


BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "today while the sun shines over the quiet valley "
)


def _docs(ids):
    return pd.DataFrame(
        {
            "doc_id": list(ids),
            "text": [
                BASE + f"tail {i} " + "filler words here " * 3
                for i in ids
            ],
        }
    )


def test_dedup_audit_healthy_then_out_of_band_append(
    test_collection, spark
):
    c = test_collection
    c.write("corpus", _docs(range(6)), index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")
    rep = c.verify_index("corpus", "cidx")
    assert rep["ok"]
    assert rep["n_corpus_docs"] == rep["n_indexed_docs"] == 6

    # the supported path keeps the audit green
    novel = pd.DataFrame(
        {"doc_id": [100], "text": ["entirely new prose about "
                                   "catalyst and adaptive execution"]}
    )
    c.append_dedup("corpus", novel, "cidx")
    assert c.verify_index("corpus", "cidx")["ok"]

    # an out-of-band plain append bypasses the index → missing
    c.append("corpus", _docs([200, 201]))
    rep = c.verify_index("corpus", "cidx")
    assert not rep["ok"]
    assert rep["n_missing"] == 2
    assert rep["missing_sample"] == [200, 201]
    assert rep["n_stale"] == 0


def test_dedup_audit_detects_stale_and_tier_skew(
    test_collection, spark
):
    c = test_collection
    c.write("corpus", _docs(range(6)), index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")

    # item rewritten out-of-band to a subset → the removed ids are
    # stale in the index (they'd still drop future near-dups)
    c.write("corpus", _docs(range(4)), index_col="doc_id",
            overwrite=True)
    rep = c.verify_index("corpus", "cidx")
    assert not rep["ok"]
    assert rep["n_stale"] == 2
    assert rep["stale_sample"] == [4, 5]

    # band rows with no docs-tier counterpart (the crash shape the
    # replay markers repair) → tier skew
    meta = DI._index_meta(c, "cidx")
    skew_rows = spark.createDataFrame(
        [(12345, 0, 999)], "bkey long, band int, doc_id long"
    )
    c.append(meta["bands_delta"], skew_rows,
             duplicate_handling="keep_all") if c.item_exists(
        meta["bands_delta"]
    ) else c.write(meta["bands_delta"], skew_rows, index_col="bkey")
    rep = c.verify_index("corpus", "cidx")
    assert rep["n_tier_skew"] == 1
    assert 999 in rep["tier_skew_sample"]


def test_line_audit_orphan_owner_and_deep_ghost_line(
    test_collection, spark
):
    c = test_collection
    docs = pd.DataFrame(
        {
            "doc_id": range(3),
            "text": [
                f"unique line number {i}\nshared trailer line"
                for i in range(3)
            ],
        }
    )
    c.write("corpus", docs, index_col="doc_id")
    c.build_line_index("lidx", "corpus")
    rep = c.verify_index("corpus", "lidx", deep=True)
    assert rep["ok"]
    assert rep["n_orphan_line"] == 0

    # census row owned by a doc that does not exist → orphan_owner
    from pyspark.sql import functions as F

    ghost = spark.createDataFrame(
        [("deliberately orphaned line", 9999)], "t string, owner long"
    ).select(
        F.current_timestamp().alias("added_at"),
        F.conv(F.substring(F.md5("t"), 1, 14), 16, 10)
        .cast("bigint")
        .alias("lhp"),
        F.md5("t").alias("lh"),
        "owner",
    )
    LI.register_new_lines(c, "lidx", ghost)
    rep = c.verify_index("corpus", "lidx")
    assert not rep["ok"]
    assert rep["n_orphan_owner"] == 1
    assert rep["orphan_owner_sample"][0][0] == 9999

    # owner exists but its stored text no longer carries the line
    # (out-of-band rewrite) → only the deep pass can see it
    rewritten = docs.copy()
    rewritten.loc[0, "text"] = "completely different text now"
    c.write("corpus", rewritten, index_col="doc_id", overwrite=True)
    shallow = c.verify_index("corpus", "lidx")
    assert shallow["n_orphan_owner"] == 1  # still just the ghost
    deep = c.verify_index("corpus", "lidx", deep=True)
    assert deep["n_orphan_line"] >= 1
    assert not deep["ok"]


def test_vector_audit_missing_and_stale(test_collection, spark):
    import numpy as np

    c = test_collection
    rng = np.random.RandomState(7)
    vecs = pd.DataFrame(
        {
            "vec_id": range(20),
            "embedding": [
                rng.rand(8).astype("float32").tolist() for _ in range(20)
            ],
        }
    )
    c.write("vecs", vecs, index_col="vec_id")
    c.build_vector_index("vidx", "vecs", vec_col="embedding",
                         id_col="vec_id", n_cells=2)
    assert c.verify_index("vecs", "vidx")["ok"]

    extra = vecs.copy()
    extra["vec_id"] = extra["vec_id"] + 100
    c.append("vecs", extra)  # out-of-band: index never saw these
    rep = c.verify_index("vecs", "vidx")
    assert not rep["ok"]
    assert rep["n_missing"] == 20
    assert rep["n_stale"] == 0

    # the supported append path heals the audit
    c.append_vector_index(
        "vidx", c.item("vecs").data.filter("vec_id >= 100")
    )
    assert c.verify_index("vecs", "vidx")["ok"]


def test_verify_index_rejects_non_index_items(test_collection):
    from pystore_spark.exceptions import StorageError

    c = test_collection
    c.write("plain", _docs(range(2)), index_col="doc_id")
    with pytest.raises(StorageError, match="not a dedup/line/vector"):
        c.verify_index("plain", "plain")


def test_dedup_repair_heals_missing_and_stale(test_collection, spark):
    """repair_index closes the loop: out-of-band appends get
    re-indexed from an id-pruned corpus read (O(drift), no corpus
    re-sign), stale/skew ids are dropped by tier rewrites — and the
    repaired index actually CATCHES a near-dup of a formerly-missing
    doc."""
    c = test_collection
    c.write("corpus", _docs(range(6)), index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")

    novel = pd.DataFrame({
        "doc_id": [100],
        "text": ["entirely new prose about catalyst and adaptive "
                 "query execution with its very own words"],
    })
    c.append("corpus", novel)  # out-of-band: invisible to probes
    # the hole is real: a near-dup of doc 100 sails through pre-repair
    dup = pd.DataFrame({
        "doc_id": [300],
        "text": [novel.loc[0, "text"] + " tiny tail"],
    })
    assert c.append_dedup("corpus", dup, "cidx")["n_dropped"] == 0
    # (clean up the probe's side effects on the corpus for clarity:
    # doc 300 is now stored + indexed, which is fine for the audit)

    rep = c.verify_index("corpus", "cidx")
    assert rep["n_missing"] == 1 and rep["missing_sample"] == [100]

    fix = c.repair_index("corpus", "cidx")
    assert fix["n_reindexed"] == 1
    assert c.verify_index("corpus", "cidx")["ok"]

    # the repaired index now drops another near-dup of doc 100
    dup2 = pd.DataFrame({
        "doc_id": [301],
        "text": [novel.loc[0, "text"] + " other tail"],
    })
    assert c.append_dedup("corpus", dup2, "cidx")["n_dropped"] == 1

    # stale: corpus rewritten to a subset → repair drops those ids
    c.write("corpus", _docs(range(4)), index_col="doc_id",
            overwrite=True)
    fix = c.repair_index("corpus", "cidx")
    assert fix["n_removed"] > 0
    assert c.verify_index("corpus", "cidx")["ok"]


def test_line_repair_drops_orphan_owner_rows(test_collection, spark):
    c = test_collection
    docs = pd.DataFrame({
        "doc_id": range(3),
        "text": [f"unique line number {i}\nshared trailer line"
                 for i in range(3)],
    })
    c.write("corpus", docs, index_col="doc_id")
    c.build_line_index("lidx", "corpus")

    from pyspark.sql import functions as F

    ghost = spark.createDataFrame(
        [("deliberately orphaned line", 9999)], "t string, owner long"
    ).select(
        F.current_timestamp().alias("added_at"),
        F.conv(F.substring(F.md5("t"), 1, 14), 16, 10)
        .cast("bigint").alias("lhp"),
        F.md5("t").alias("lh"),
        "owner",
    )
    LI.register_new_lines(c, "lidx", ghost)
    assert not c.verify_index("corpus", "lidx")["ok"]

    # pre-repair, the orphan row strips the line from future batches
    out, _ = c.dedup_lines_incremental(
        "lidx",
        spark.createDataFrame(
            [(50, "deliberately orphaned line")],
            "doc_id long, text string",
        ),
        update_index=False,
    )
    assert out.collect()[0]["text"] == ""

    fix = c.repair_index("corpus", "lidx")
    assert fix["n_removed"] == 1
    assert c.verify_index("corpus", "lidx", deep=True)["ok"]

    # post-repair the line flows again (no stored doc owns it)
    out, _ = c.dedup_lines_incremental(
        "lidx",
        spark.createDataFrame(
            [(51, "deliberately orphaned line")],
            "doc_id long, text string",
        ),
        update_index=False,
    )
    assert out.collect()[0]["text"] == "deliberately orphaned line"


def test_vector_repair_heals_drift(test_collection, spark):
    import numpy as np

    c = test_collection
    rng = np.random.RandomState(11)
    vecs = pd.DataFrame({
        "vec_id": range(16),
        "embedding": [rng.rand(8).astype("float32").tolist()
                      for _ in range(16)],
    })
    c.write("vecs", vecs, index_col="vec_id")
    c.build_vector_index("vidx", "vecs", vec_col="embedding",
                         id_col="vec_id", n_cells=2)

    extra = vecs.copy()
    extra["vec_id"] = extra["vec_id"] + 100
    c.append("vecs", extra)
    assert not c.verify_index("vecs", "vidx")["ok"]
    fix = c.repair_index("vecs", "vidx")
    assert fix["n_reindexed"] == 16
    assert c.verify_index("vecs", "vidx")["ok"]

    # stale direction: shrink the corpus, repair drops the ids
    c.write("vecs", vecs, index_col="vec_id", overwrite=True)
    fix = c.repair_index("vecs", "vidx")
    assert fix["n_removed"] == 16
    assert c.verify_index("vecs", "vidx")["ok"]


def test_repair_converges_on_in_corpus_tier_skew(
    test_collection, spark
):
    """Review finding: repair used to re-index a missing/band-skewed
    doc and then DELETE the rows it just appended (the drop set was
    computed from pre-reindex snapshots but applied to fresh tiers).
    Drops now run before re-indexing, so ONE repair pass converges on
    the exact crash-between-tier-appends drift the feature targets."""
    c = test_collection
    c.write("corpus", _docs(range(6)), index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")
    meta = DI._index_meta(c, "cidx")

    # simulate the crash shape: doc 5 present in the bands tier but
    # absent from the docs tier (its verification rows never landed)
    docs_base = DI._read_frame(c, meta["docs_item"])
    c.write(
        meta["docs_item"],
        docs_base.filter("doc_id != 5"),
        index_col="doc_id", zonemap=["doc_id"], overwrite=True,
        sidecar_extra={DI.META_KEY + "_role": "docs"},
    )
    rep = c.verify_index("corpus", "cidx")
    assert rep["n_missing"] == 1 and rep["n_tier_skew"] == 1

    fix = c.repair_index("corpus", "cidx")
    assert fix["n_reindexed"] == 1
    # ONE pass heals it — the old order needed two
    assert c.verify_index("corpus", "cidx")["ok"]


def test_maintain_verify_indexes_reports_drift(test_collection):
    """maintain(verify_indexes=True) runs the read-only fsck for every
    index that recorded its source item — drift is REPORTED, never
    auto-repaired (tier rewrites must be serialized deliberately)."""
    c = test_collection
    c.write("corpus", _docs(range(6)), index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")
    res = c.maintain("cidx", verify_indexes=True, compact=False,
                     refresh_stats=False, refresh_rollups=False)
    assert res["cidx"]["verify"]["ok"]

    c.append("corpus", _docs([50]))  # out-of-band drift
    res = c.maintain("cidx", verify_indexes=True, compact=False,
                     refresh_stats=False, refresh_rollups=False)
    rep = res["cidx"]["verify"]
    assert not rep["ok"] and rep["n_missing"] == 1
    # reported, not repaired
    assert not c.verify_index("corpus", "cidx")["ok"]


def test_maintain_verify_covers_vector_indexes(test_collection):
    import numpy as np

    c = test_collection
    rng = np.random.RandomState(3)
    vecs = pd.DataFrame({
        "vec_id": range(12),
        "embedding": [rng.rand(8).astype("float32").tolist()
                      for _ in range(12)],
    })
    c.write("vecs", vecs, index_col="vec_id")
    c.build_vector_index("vidx", "vecs", vec_col="embedding",
                         id_col="vec_id", n_cells=2)
    res = c.maintain("vidx", verify_indexes=True, compact=False,
                     refresh_stats=False, refresh_rollups=False)
    assert res["vidx"]["verify"]["ok"]
    extra = vecs.copy(); extra["vec_id"] += 100
    c.append("vecs", extra)
    res = c.maintain("vidx", verify_indexes=True, compact=False,
                     refresh_stats=False, refresh_rollups=False)
    assert res["vidx"]["verify"]["n_missing"] == 12
