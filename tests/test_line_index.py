"""Persistent incremental line-census index (line_index.py): the LSM
sibling of the MinHash dedup index, giving keep-one-owner line dedup
ACROSS ingests in O(batch). Covers build, incremental removal against
the stored census, delta registration (next batch loses lines this
batch introduced), equivalence with the batch dedup_lines on the same
union, the maintain() fold, and the ingest(line_index=) wiring."""

from __future__ import annotations

import pytest

from pystore_spark import line_index as LI
from pystore_spark.functions import text as X

BOILER = "subscribe to our newsletter for more updates"
BOILER2 = "all rights reserved worldwide"


def _doc(i, *lines):
    return (i, "\n".join(lines))


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def census_col(test_collection, spark):
    c = test_collection
    corpus = _frame(
        spark,
        [
            _doc(1, "first doc body", BOILER),
            _doc(2, "second doc body", BOILER, "extra line two"),
            _doc(3, "third doc body"),
        ],
    )
    c.write("corpus", corpus.toPandas(), index_col="doc_id")
    c.build_line_index("lidx", "corpus")
    return c


def test_build_census_contents(census_col):
    c = census_col
    idx = c.item("lidx").data.toPandas()
    # one row per distinct non-blank line; 5 distinct lines above
    # (BOILER is shared by docs 1 and 2)
    assert len(idx) == 5
    assert set(idx.columns) >= {"lhp", "lh", "owner"}
    meta = c.get_item_metadata("lidx")[LI.META_KEY]
    assert meta["delta_item"] == "lidx__delta"


def test_incremental_removes_stored_lines(census_col, spark):
    c = census_col
    batch = _frame(
        spark,
        [
            _doc(10, "novel content here", BOILER),
            _doc(11, BOILER2, "another novel line"),
        ],
    )
    out, rep = c.dedup_lines_incremental("lidx", batch)
    texts = {
        r["doc_id"]: r["text"] for r in out.orderBy("doc_id").collect()
    }
    # BOILER is corpus-owned -> removed; BOILER2 is new -> kept
    assert texts[10] == "novel content here"
    assert texts[11] == f"{BOILER2}\nanother novel line"
    assert rep["broadcast_probe"] is True
    assert rep["n_new_lines"] == 3  # novel, BOILER2, another novel


def test_next_batch_loses_lines_registered_by_previous(census_col, spark):
    c = census_col
    b1 = _frame(spark, [_doc(10, "fresh line alpha", BOILER2)])
    out1, _ = c.dedup_lines_incremental("lidx", b1)
    assert out1.collect()[0]["text"] == f"fresh line alpha\n{BOILER2}"
    # batch 2 repeats batch 1's lines: the DELTA census owns them now
    b2 = _frame(spark, [_doc(20, BOILER2, "own line beta")])
    out2, _ = c.dedup_lines_incremental("lidx", b2)
    assert out2.collect()[0]["text"] == "own line beta"


def test_incremental_equals_batch_dedup_on_union(census_col, spark):
    """Corpus + batch processed incrementally gives each batch doc the
    same text as one batch dedup_lines over the UNION (owner ids in
    the corpus are all lower than batch ids)."""
    c = census_col
    corpus = c.item("corpus").data.select("doc_id", "text")
    batch = _frame(
        spark,
        [
            _doc(10, BOILER, "u1 novel", BOILER2),
            _doc(11, BOILER2, "u2 novel"),
        ],
    )
    inc, _ = c.dedup_lines_incremental("lidx", batch, update_index=False)
    full = X.dedup_lines(corpus.unionByName(batch), "doc_id", "text")
    inc_map = {r["doc_id"]: r["text"] for r in inc.collect()}
    full_map = {
        r["doc_id"]: r["text"]
        for r in full.filter(full.doc_id >= 10).collect()
    }
    assert inc_map == full_map


def test_maintain_folds_delta(census_col, spark):
    c = census_col
    b = _frame(spark, [_doc(10, "fold me once", BOILER2)])
    c.dedup_lines_incremental("lidx", b)
    assert c.item("lidx__delta").data.count() == 2
    res = c.maintain("lidx")
    assert res["lidx"]["line_index"]["lines_folded"] == 2
    # folded into base (5 corpus + 2 new), delta emptied/husked
    assert c.item("lidx").data.count() == 7
    assert (not c.item_exists("lidx__delta")) or (
        c.item("lidx__delta").data.count() == 0
    )
    # removal still works from the folded base
    out, _ = c.dedup_lines_incremental(
        "lidx", _frame(spark, [_doc(30, BOILER2, "post fold")]),
        update_index=False,
    )
    assert out.collect()[0]["text"] == "post fold"


def test_ingest_with_line_index(census_col, spark):
    c = census_col
    batch = _frame(
        spark,
        [
            _doc(10, "ingest novel one", BOILER),
            _doc(11, "ingest novel two"),
        ],
    )
    rep = c.ingest(
        "corpus", batch, line_index="lidx", index_col="doc_id"
    )
    assert rep["n_appended"] == 2
    assert rep["line_index"]["n_new_lines"] == 2
    stored = {
        r["doc_id"]: r["text"]
        for r in c.item("corpus").data.filter("doc_id >= 10").collect()
    }
    # the corpus-owned boilerplate never reached storage
    assert stored[10] == "ingest novel one"
    assert stored[11] == "ingest novel two"
    assert "line_index:lidx" in rep["funnel"]


def test_build_overwrite_guard(census_col, spark):
    from pystore_spark.exceptions import ItemExistsError

    c = census_col
    with pytest.raises(ItemExistsError):
        c.build_line_index("lidx", "corpus")
    c.build_line_index("lidx", "corpus", overwrite=True)
    assert c.item("lidx").data.count() == 5


def test_ingest_does_not_register_lines_of_dedup_dropped_docs(
    test_collection, spark
):
    """A doc dropped by the downstream near-dedup must not leave its
    novel lines in the census — they would be stripped from every
    future batch while surviving in NO stored document (review
    finding: registration is deferred until after the append and
    restricted to surviving owners).

    The batch doc near-duplicates stored doc 3 through DIFFERENT line
    breaks (same token stream, no exact line overlap) — the line stage
    keeps its lines, the doc probe drops the doc, and none of its
    lines may register."""
    import pandas as pd

    c = test_collection
    words = [f"w{j}" for j in range(90)]
    corpus = pd.DataFrame(
        {
            "doc_id": list(range(5)),
            "text": [
                " ".join(words) + f" tail{i} only{i}" for i in range(5)
            ],
        }
    )
    c.write("corpus", corpus, index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")
    c.build_line_index("lidx", "corpus")
    orphan = "novel orphan line"
    redup = (
        " ".join(words[:45]) + " tail3 \n" + " ".join(words[45:])
        + " only3\n" + orphan
    )
    batch = spark.createDataFrame(
        [(100, redup)], "doc_id long, text string"
    )
    rep = c.ingest(
        "corpus", batch, dedup_index="cidx", line_index="lidx",
        index_col="doc_id",
    )
    assert rep["n_dropped_dedup"] == 1  # near-dup of stored doc 3
    assert rep["line_index"]["n_new_lines"] == 0  # nothing registered
    # a later doc carrying the line keeps it (nothing stole ownership)
    out, _ = c.dedup_lines_incremental(
        "lidx",
        spark.createDataFrame(
            [(200, orphan)], "doc_id long, text string"
        ),
        update_index=False,
    )
    assert out.collect()[0]["text"] == orphan


def test_batch_shared_line_survives_when_its_owner_is_probe_dropped(
    test_collection, spark
):
    """Review finding (round 5): batch docs A (lower id) and B both
    carry novel line L. Were batch ownership resolved BEFORE the doc
    probe, A would own L (stripped from B); the probe then drops A as
    a near-dup of the stored corpus — and L would be stored nowhere
    despite arriving in B, which survives. The decomposed ingest path
    resolves batch ownership AFTER the probe, among survivors: B must
    keep L, and the census must record B as its owner."""
    import pandas as pd

    c = test_collection
    words = [f"w{j}" for j in range(90)]
    corpus = pd.DataFrame(
        {
            "doc_id": list(range(5)),
            "text": [
                " ".join(words) + f" tail{i} only{i}" for i in range(5)
            ],
        }
    )
    c.write("corpus", corpus, index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")
    c.build_line_index("lidx", "corpus")
    shared = "novel shared line"
    # doc 50: near-dup of stored doc 3 via different line breaks,
    # plus the shared novel line; LOWER id than doc 60 so pre-probe
    # ownership would land on the doomed doc
    redup = (
        " ".join(words[:45]) + " tail3 \n" + " ".join(words[45:])
        + " only3\n" + shared
    )
    novel = "completely unrelated novel content\n" + shared
    batch = spark.createDataFrame(
        [(50, redup), (60, novel)], "doc_id long, text string"
    )
    rep = c.ingest(
        "corpus", batch, dedup_index="cidx", line_index="lidx",
        index_col="doc_id",
    )
    assert rep["n_dropped_dedup"] == 1
    assert rep["n_appended"] == 1
    stored = {
        r["doc_id"]: r["text"]
        for r in c.item("corpus").data.filter("doc_id >= 50").collect()
    }
    assert list(stored) == [60]
    assert shared in stored[60]  # the line was NOT lost
    # census owner is the surviving doc: a later batch carrying the
    # line loses it (the corpus owns it through doc 60)
    out, _ = c.dedup_lines_incremental(
        "lidx",
        spark.createDataFrame(
            [(200, shared)], "doc_id long, text string"
        ),
        update_index=False,
    )
    assert out.collect()[0]["text"] == ""


# ---------------------------------------------------------------------------
# cross-item census scope (round 6: shared census over several items)
# ---------------------------------------------------------------------------
def test_line_index_cross_item_scope(test_collection, spark):
    """One census over two corpus items: build over [a, b], then
    ingest into item c — lines owned by EITHER build source strip
    from the batch, the ingest target joins the recorded scope, and
    verify(None) treats an owner in ANY scoped item as live."""
    c = test_collection
    a = _frame(spark, [_doc(1, "alpha body", BOILER)])
    b = _frame(spark, [
        _doc(2, "beta body", BOILER2),
        _doc(3, "keeper line"),
    ])
    c.write("lc_a", a.toPandas(), index_col="doc_id")
    c.write("lc_b", b.toPandas(), index_col="doc_id")
    c.build_line_index("lcx", ["lc_a", "lc_b"])
    meta = c.get_item_metadata("lcx")[LI.META_KEY]
    assert meta["source_items"] == ["lc_a", "lc_b"]
    assert c.item("lcx").data.count() == 5  # 5 distinct lines

    # ingest into a THIRD item: loses lines owned by both sources
    rep = c.ingest(
        "lc_c",
        _frame(spark, [_doc(10, "gamma body", BOILER, BOILER2)]),
        line_index="lcx",
        create_missing=True,
    )
    assert rep["n_appended"] == 1
    stored = c.item("lc_c").data.collect()[0]["text"]
    assert BOILER not in stored and BOILER2 not in stored
    assert "gamma body" in stored

    meta2 = c.get_item_metadata("lcx", use_cache=False)[LI.META_KEY]
    assert meta2["source_items"] == ["lc_a", "lc_b", "lc_c"]
    audit = c.verify_index(None, "lcx", deep=True)
    assert audit["ok"], audit
    assert audit["items"] == ["lc_a", "lc_b", "lc_c"]

    # delete item b's doc: its lines orphan; scoped repair drops them
    c.delete_where("lc_b", [("doc_id", "==", 2)], repair_indexes=False)
    bad = c.verify_index(None, "lcx")
    assert not bad["ok"] and bad["n_orphan_owner"] == 2
    fix = c.repair_index(None, "lcx")
    assert fix["n_removed"] == 2
    assert c.verify_index(None, "lcx", deep=True)["ok"]
