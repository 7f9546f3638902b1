"""Persistent incremental gram-census index (substring_index.py): the
LSM sibling of the line census, giving exact substring dedup ACROSS
ingests in O(batch). Covers build, incremental span cutting against
the stored census, delta registration (the next batch loses passages
this batch introduced), EQUIVALENCE with the batch dedup_substrings
on the same union, the maintain() fold, registration from cleaned
text only (census ⊆ stored bytes), verify/repair, and the
ingest(substring_index=) wiring."""

from __future__ import annotations

import pytest

from pystore_spark import substring_index as SI
from pystore_spark.functions import text as X

# an 8+-token passage shared across docs (k=6 in these tests)
PASSAGE = "the quick brown fox jumps over the lazy dog tonight"
PASSAGE2 = "all rights reserved by the original author entirely ok"


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def census_col(test_collection, spark):
    c = test_collection
    corpus = _frame(
        spark,
        [
            (1, f"first doc body text here {PASSAGE}"),
            (2, f"second doc body wording {PASSAGE} trailing bits"),
            (3, "third doc body alone with its own words only"),
        ],
    )
    c.write("corpus", corpus.toPandas(), index_col="doc_id")
    c.build_substring_index("gidx", "corpus", k=6)
    return c


def test_build_census_contents(census_col):
    c = census_col
    idx = c.item("gidx").data.toPandas()
    assert set(idx.columns) >= {"ghp", "gh", "owner"}
    # every gram hash is distinct, owners are corpus ids
    assert idx["gh"].is_unique
    assert set(idx["owner"]) <= {1, 2, 3}
    meta = c.get_item_metadata("gidx")[SI.META_KEY]
    assert meta["delta_item"] == "gidx__delta"
    assert meta["k"] == 6


def test_incremental_cuts_stored_passages(census_col, spark):
    c = census_col
    batch = _frame(
        spark,
        [
            (10, f"novel content opens up {PASSAGE} and closes"),
            (11, f"{PASSAGE2} with fresh words following it"),
        ],
    )
    out, rep = c.dedup_substrings_incremental("gidx", batch)
    texts = {
        r["doc_id"]: r["text"] for r in out.orderBy("doc_id").collect()
    }
    # the corpus-owned passage is cut; novel text survives
    assert PASSAGE not in texts[10]
    assert "novel content opens up" in texts[10]
    assert "and closes" in texts[10]
    # PASSAGE2 is new -> kept intact, byte-identical doc
    assert texts[11] == f"{PASSAGE2} with fresh words following it"
    assert rep["broadcast_probe"] is True
    assert rep["n_new_grams"] > 0


def test_next_batch_loses_passages_registered_by_previous(
    census_col, spark
):
    c = census_col
    b1 = _frame(spark, [(10, f"{PASSAGE2} plus some fresh padding")])
    out1, _ = c.dedup_substrings_incremental("gidx", b1)
    assert out1.collect()[0]["text"] == (
        f"{PASSAGE2} plus some fresh padding"
    )
    # batch 2 repeats batch 1's passage: the DELTA census owns it now
    b2 = _frame(spark, [(20, f"{PASSAGE2} then own tail words here")])
    out2, _ = c.dedup_substrings_incremental("gidx", b2)
    t2 = out2.collect()[0]["text"]
    assert PASSAGE2 not in t2
    assert "own tail words here" in t2


def test_incremental_equals_batch_dedup_on_union(census_col, spark):
    """Corpus + batch processed incrementally gives each batch doc
    the SAME cleaned text as one batch dedup_substrings over the
    UNION (batch ids all above the stored ids — the append-only
    ingest ordering the equivalence holds under)."""
    c = census_col
    corpus = c.item("corpus").data.select("doc_id", "text")
    batch = _frame(
        spark,
        [
            (10, f"u1 novel words {PASSAGE} more u1 novel trailer"),
            (11, f"{PASSAGE2} u2 unique middle {PASSAGE} closing"),
            (12, f"{PASSAGE2} echoed from eleven plus u3 own tail"),
        ],
    )
    inc, _ = c.dedup_substrings_incremental(
        "gidx", batch, update_index=False
    )
    full = X.dedup_substrings(
        corpus.unionByName(batch), id_col="doc_id", k=6
    )
    inc_map = {r["doc_id"]: r["text"] for r in inc.collect()}
    full_map = {
        r["doc_id"]: r["cleaned_text"]
        for r in full.filter(full.doc_id >= 10).collect()
    }
    assert inc_map == full_map


def test_registration_censuses_cleaned_text_only(census_col, spark):
    """The census must own only STORED bytes: a gram inside a cut
    span never registers (it would strip future novel content while
    no stored doc carries it) — verified via deep fsck against the
    batch's cleaned output."""
    c = census_col
    batch = _frame(
        spark,
        [(10, f"alpha beta {PASSAGE} gamma delta epsilon zeta eta")],
    )
    out, rep = c.dedup_substrings_incremental("gidx", batch)
    cleaned = out.collect()[0]["text"]
    assert PASSAGE not in cleaned
    # store the cleaned batch so the census scope matches storage
    c.append("corpus", out, index_col="doc_id")
    chk = c.verify_index("corpus", "gidx", deep=True)
    assert chk["ok"], chk


def test_maintain_folds_delta(census_col, spark):
    c = census_col
    b = _frame(spark, [(10, f"fold me once {PASSAGE2} tail pad")])
    _, rep = c.dedup_substrings_incremental("gidx", b)
    n_delta = c.item("gidx__delta").data.count()
    assert n_delta == rep["n_new_grams"] > 0
    n_base = c.item("gidx").data.count()
    res = c.maintain("gidx")
    assert res["gidx"]["substring_index"]["grams_folded"] == n_delta
    assert c.item("gidx").data.count() == n_base + n_delta
    assert (not c.item_exists("gidx__delta")) or (
        c.item("gidx__delta").data.count() == 0
    )
    # removal still works from the folded base
    out, _ = c.dedup_substrings_incremental(
        "gidx", _frame(spark, [(30, f"{PASSAGE2} post fold words")]),
        update_index=False,
    )
    assert PASSAGE2 not in out.collect()[0]["text"]


def test_ingest_with_substring_index(census_col, spark):
    c = census_col
    batch = _frame(
        spark,
        [
            (10, f"ingest novel one {PASSAGE} extra"),
            (11, "ingest novel two with its own words"),
        ],
    )
    rep = c.ingest(
        "corpus", batch, substring_index="gidx", index_col="doc_id"
    )
    assert rep["n_appended"] == 2
    assert rep["substring_index"]["n_new_grams"] > 0
    stored = {
        r["doc_id"]: r["text"]
        for r in c.item("corpus").data.filter("doc_id >= 10").collect()
    }
    # the corpus-owned passage never reached storage
    assert PASSAGE not in stored[10]
    assert "ingest novel one" in stored[10]
    assert stored[11] == "ingest novel two with its own words"
    assert "substring_index:gidx" in rep["funnel"]
    # census ⊆ stored bytes holds through the ingest path
    chk = c.verify_index(None, "gidx", deep=True)
    assert chk["ok"], chk


def test_ingest_rejects_line_and_substring_combo(census_col, spark):
    c = census_col
    c.build_line_index("lidx", "corpus")
    with pytest.raises(ValueError, match="text-surgery"):
        c.ingest(
            "corpus",
            _frame(spark, [(50, "x y z")]),
            line_index="lidx",
            substring_index="gidx",
            index_col="doc_id",
        )


def test_ingest_with_dedup_index_registers_survivors_only(
    test_collection, spark
):
    """With a doc probe in the loop, grams owned solely by dropped
    docs must never register — registration re-censuses survivors'
    stored text. Doc 40 changes every 10th word of stored doc 3, so
    NO k=12 window matches (the exact-substring strip leaves it
    intact) while the MinHash probe still drops it; a buggy
    registration from the PRE-probe pending census would record
    doc-40-owned grams."""
    c = test_collection
    base3 = " ".join(f"w{i}" for i in range(60))
    corpus = _frame(
        spark,
        [
            (1, "opening doc " + " ".join(f"a{i}" for i in range(20))),
            (3, base3),
        ],
    )
    c.write("corpusL", corpus.toPandas(), index_col="doc_id")
    c.build_substring_index("gidx2", "corpusL", k=12)
    c.build_dedup_index(
        "didx2", "corpusL", threshold=0.3, num_hashes=16, bands=16
    )
    near_dup = base3
    for i in range(5, 60, 10):
        near_dup = near_dup.replace(f"w{i} ", f"CHANGED{i} ").replace(
            f" w{i}", f" CHANGED{i}"
        )
    batch = _frame(
        spark,
        [
            (40, near_dup),
            (41, " ".join(f"z{i}" for i in range(25))),
        ],
    )
    rep = c.ingest(
        "corpusL", batch,
        dedup_index="didx2", substring_index="gidx2",
        index_col="doc_id",
    )
    assert rep["n_dropped_dedup"] == 1
    assert rep["n_appended"] == 1
    # census audit: every gram owned by a stored doc (deep)
    chk = c.verify_index(None, "gidx2", deep=True)
    assert chk["ok"], chk
    # and no census row is owned by the dropped doc 40
    tiers = c.item("gidx2").data.select("owner")
    if c.item_exists("gidx2__delta"):
        tiers = tiers.unionByName(
            c.item("gidx2__delta").data.select("owner")
        )
    assert tiers.filter("owner = 40").count() == 0
    # the survivor's grams DID register
    assert tiers.filter("owner = 41").count() > 0


def test_build_overwrite_guard(census_col):
    from pystore_spark.exceptions import ItemExistsError

    c = census_col
    with pytest.raises(ItemExistsError):
        c.build_substring_index("gidx", "corpus", k=6)
    c.build_substring_index("gidx", "corpus", k=6, overwrite=True)
    assert c.item("gidx").data.count() > 0


def test_repair_drops_orphan_owners(census_col, spark):
    """After the corpus loses docs out-of-band, repair removes the
    census rows those docs owned — O(census + corpus ids)."""
    c = census_col
    c.delete_where("corpus", [("doc_id", "==", 2)])
    chk = c.verify_index("corpus", "gidx")
    if chk["n_orphan_owner"] == 0:
        pytest.skip("doc 2 owned no census row (all shared with 1)")
    rep = c.repair_index("corpus", "gidx")
    assert rep["n_removed"] == chk["n_orphan_owner"]
    assert c.verify_index("corpus", "gidx")["ok"]


def test_delete_where_repairs_substring_census(census_col):
    """delete_where(repair_indexes=True) must reach the gram census
    too (same repair-hook gap as the text index: the scope scan
    dispatched on dedup/line/vector sidecars only)."""
    c = census_col
    rep = c.delete_where(
        "corpus", [("doc_id", "==", 3)], repair_indexes=True
    )
    assert "gidx" in rep["index_repairs"]
    chk = c.verify_index(None, "gidx", deep=True)
    assert chk["ok"], chk
