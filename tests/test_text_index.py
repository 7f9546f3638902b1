"""Persistent inverted text index (text_index.py): BM25 retrieval in
O(query-term postings). Covers build, EQUIVALENCE with the batch
bm25_topk operator (shared scoring core — results must be identical),
incremental registration through ingest (survivors only, exact stats),
marker idempotence, the maintain() fold, and verify/repair."""

from __future__ import annotations

import pandas as pd
import pytest

from pystore_spark import text_index as TI
from pystore_spark.functions import text as X

QUERY = ["spark", "query", "window", "vector"]

VOCAB = (
    "spark query window vector join filter scan merge sort data "
    "table row group batch stream agg key value line part"
).split()


def _corpus(n, seed=0, start=0):
    import random

    rng = random.Random(seed)
    return pd.DataFrame({
        "doc_id": range(start, start + n),
        "text": [
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(8, 40)))
            for _ in range(n)
        ],
    })


@pytest.fixture()
def ti_col(test_collection, spark):
    c = test_collection
    c.write("corpus", _corpus(40), index_col="doc_id")
    c.build_text_index("tix", "corpus")
    return c


def _ranked(df):
    return [
        (r["doc_id"], r["bm25"])
        for r in df.orderBy("doc_id").collect()
    ]


def test_search_equals_batch_operator(ti_col, spark):
    c = ti_col
    got = c.search_bm25("tix", QUERY, top_k=10)
    exp = X.bm25_topk(
        c.item("corpus").data, QUERY, top_k=10
    )
    assert _ranked(got) == _ranked(exp)
    assert got.columns == ["doc_id", "bm25"]


def test_build_records_exact_stats(ti_col):
    meta = ti_col.get_item_metadata("tix")[TI.META_KEY]
    docs = ti_col.item("corpus").to_pandas(sort=False)
    assert meta["n_docs"] == len(docs)
    assert meta["total_dl"] == int(
        docs["text"].str.split().str.len().sum()
    )
    chk = ti_col.verify_index(None, "tix")
    assert chk["ok"], chk


def test_empty_query_raises(ti_col):
    with pytest.raises(ValueError, match="query_terms is empty"):
        ti_col.search_bm25("tix", [])


def test_ingest_registers_and_search_stays_exact(ti_col, spark):
    """ingest(text_index=) indexes the appended docs O(batch); a
    search after the ingest must equal the batch operator over the
    FULL stored corpus (delta postings + bumped stats both counted)."""
    c = ti_col
    batch = spark.createDataFrame(
        _corpus(15, seed=7, start=100)
    )
    rep = c.ingest(
        "corpus", batch, text_index="tix", index_col="doc_id"
    )
    assert rep["text_index"]["n_docs_indexed"] == 15
    assert "text_index:tix" in rep["funnel"]
    got = c.search_bm25("tix", QUERY, top_k=10)
    exp = X.bm25_topk(c.item("corpus").data, QUERY, top_k=10)
    assert _ranked(got) == _ranked(exp)
    chk = c.verify_index(None, "tix")
    assert chk["ok"], chk


def test_ingest_with_dedup_registers_survivors_only(
    test_collection, spark
):
    """A probe-dropped doc must contribute NEITHER postings NOR stats
    — otherwise every later search scores against phantom corpus
    members."""
    c = test_collection
    base = " ".join(VOCAB) + " " + " ".join(VOCAB[::-1])
    c.write(
        "corpusT",
        pd.DataFrame({"doc_id": [1], "text": [base]}),
        index_col="doc_id",
    )
    c.build_text_index("tix2", "corpusT")
    c.build_dedup_index(
        "didxT", "corpusT", threshold=0.3, num_hashes=16, bands=16
    )
    batch = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11],
        "text": [base + " extra", "novel words only here today"],
    }))
    rep = c.ingest(
        "corpusT", batch, dedup_index="didxT", text_index="tix2",
        index_col="doc_id",
    )
    assert rep["n_dropped_dedup"] == 1
    assert rep["text_index"]["n_docs_indexed"] == 1
    got = c.search_bm25("tix2", ["novel", "spark"], top_k=10)
    exp = X.bm25_topk(
        c.item("corpusT").data, ["novel", "spark"], top_k=10
    )
    assert _ranked(got) == _ranked(exp)
    chk = c.verify_index(None, "tix2")
    assert chk["ok"], chk


def test_register_marker_idempotent(ti_col, spark):
    """The two-marker contract: re-registering the same batch under
    the same marker bumps NEITHER the postings NOR the stats."""
    c = ti_col
    batch = spark.createDataFrame(_corpus(5, seed=3, start=500))
    TI.register_docs(c, "tix", batch, marker=("k", 1))
    meta1 = c.get_item_metadata("tix")[TI.META_KEY]
    n1 = c.item("tix__delta").data.count()
    TI.register_docs(c, "tix", batch, marker=("k", 1))  # replay
    meta2 = c.get_item_metadata("tix")[TI.META_KEY]
    assert meta2["n_docs"] == meta1["n_docs"]
    assert meta2["total_dl"] == meta1["total_dl"]
    assert c.item("tix__delta").data.count() == n1


def test_maintain_folds_delta(ti_col, spark):
    c = ti_col
    batch = spark.createDataFrame(_corpus(10, seed=5, start=200))
    c.ingest("corpus", batch, text_index="tix", index_col="doc_id")
    before = _ranked(c.search_bm25("tix", QUERY, top_k=10))
    rep = c.refresh_text_index("tix")
    assert rep["postings_folded"] > 0
    assert not c.item("tix__delta").data.count()
    after = _ranked(c.search_bm25("tix", QUERY, top_k=10))
    assert after == before
    chk = c.verify_index(None, "tix")
    assert chk["ok"], chk


def test_verify_flags_and_repair_fixes_drift(ti_col, spark):
    """Out-of-band corpus append -> missing docs; out-of-band corpus
    delete -> orphan postings + stale stats. repair_index fixes both
    O(drift) and resets the stats to corpus truth."""
    c = ti_col
    # drift 1: docs appended without the index in the loop
    c.append(
        "corpus",
        _corpus(6, seed=9, start=300),
        duplicate_handling="keep_all",
    )
    chk = c.verify_index(None, "tix")
    assert not chk["ok"]
    assert chk["n_missing"] == 6
    assert not chk["stats_ok"]
    rep = c.repair_index(None, "tix")
    assert rep["n_indexed"] == 6
    chk = c.verify_index(None, "tix")
    assert chk["ok"], chk
    # search exactness restored
    got = c.search_bm25("tix", QUERY, top_k=10)
    exp = X.bm25_topk(c.item("corpus").data, QUERY, top_k=10)
    assert _ranked(got) == _ranked(exp)
    # drift 2: docs deleted out-of-band
    c.delete_where("corpus", [("doc_id", "in", [0, 1, 2])])
    chk = c.verify_index(None, "tix")
    assert not chk["ok"]
    assert chk["n_orphans"] == 3
    rep = c.repair_index(None, "tix")
    assert rep["n_orphans_dropped"] == 3
    chk = c.verify_index(None, "tix")
    assert chk["ok"], chk
    got = c.search_bm25("tix", QUERY, top_k=10)
    exp = X.bm25_topk(c.item("corpus").data, QUERY, top_k=10)
    assert _ranked(got) == _ranked(exp)


def test_build_overwrite_guard(ti_col):
    from pystore_spark.exceptions import ItemExistsError

    with pytest.raises(ItemExistsError):
        ti_col.build_text_index("tix", "corpus")
    ti_col.build_text_index("tix", "corpus", overwrite=True)


def test_not_a_text_index_raises(test_collection):
    c = test_collection
    c.write(
        "plainT",
        pd.DataFrame({"doc_id": [1], "text": ["x y z"]}),
        index_col="doc_id",
    )
    from pystore_spark.exceptions import StorageError

    with pytest.raises(StorageError, match="not a text index"):
        c.search_bm25("plainT", ["x"])


def test_search_prunes_postings_files(test_collection, spark):
    """The O(query) claim, structurally: with the base postings split
    across several term-sorted files, a query-bag search must SELECT
    a strict subset of files via the manifest term zonemap — the scan
    never touches postings of terms outside the query."""
    c = test_collection
    c.write("corpusP", _corpus(120, seed=11), index_col="doc_id")
    c.build_text_index("tpx", "corpusP", npartitions=6)
    rep = c.item(
        "tpx",
        filters=[(
            "tp", "in",
            [TI.term_prefix("spark"), TI.term_prefix("vector")],
        )],
    ).scan_report()
    assert rep["n_files_live"] >= 4
    assert rep["n_files_selected"] < rep["n_files_live"]
    # and the pruned search is still exact
    got = _ranked(c.search_bm25("tpx", ["spark", "vector"], top_k=10))
    exp = _ranked(
        X.bm25_topk(c.item("corpusP").data, ["spark", "vector"], top_k=10)
    )
    assert got == exp


def test_fold_crash_then_refold_never_duplicates(ti_col, spark, monkeypatch):
    """Review finding (round 9): a crash between the fold's base
    overwrite and its delta trim leaves folded postings in BOTH
    tiers; a plain-union re-fold would duplicate them permanently
    (double tf/df -> wrong BM25 forever, invisible to fsck). The
    merge is BASE WINS on (term, doc) and search dedups its hit rows,
    so both the crash window and the re-fold stay exact."""
    import pystore_spark.dedup_index as DI

    c = ti_col
    batch = spark.createDataFrame(_corpus(10, seed=5, start=200))
    c.ingest("corpus", batch, text_index="tix", index_col="doc_id")
    exp = _ranked(
        X.bm25_topk(c.item("corpus").data, QUERY, top_k=10)
    )

    orig = DI.trim_delta

    def boom(*a, **k):
        raise RuntimeError("crash before trim")

    monkeypatch.setattr(DI, "trim_delta", boom)
    with pytest.raises(RuntimeError, match="crash before trim"):
        c.refresh_text_index("tix")
    monkeypatch.setattr(DI, "trim_delta", orig)
    # crash window: postings live in BOTH tiers — search still exact
    assert _ranked(c.search_bm25("tix", QUERY, top_k=10)) == exp
    # re-fold: no permanent duplication
    c.refresh_text_index("tix")
    assert _ranked(c.search_bm25("tix", QUERY, top_k=10)) == exp
    dup = (
        c.item("tix").data.groupBy("term", "doc_id").count()
        .filter("count > 1").count()
    )
    assert dup == 0
    chk = c.verify_index(None, "tix")
    assert chk["ok"], chk


def test_ingest_rejects_mismatched_id_cols(ti_col, spark):
    """Review finding (round 9): combining a text index with a dedup
    index keyed on a DIFFERENT id column used to silently filter
    nothing (phantom registrations); it now raises before any work."""
    c = ti_col
    docs = c.item("corpus").data.withColumnRenamed("doc_id", "uid")
    c.write("corpusU", docs.toPandas(), index_col="uid")
    c.build_dedup_index(
        "didxU", "corpusU", text_col="text", id_col="uid",
        threshold=0.3, num_hashes=16, bands=16,
    )
    with pytest.raises(ValueError, match="same id column"):
        c.ingest(
            "corpus",
            spark.createDataFrame(_corpus(2, seed=1, start=900)),
            dedup_index="didxU", text_index="tix",
            index_col="doc_id",
        )


def test_empty_corpus_search_keeps_id_type(test_collection, spark):
    """Review finding (round 9): the empty-index fast path used to
    hardcode a string doc_id; it now round-trips the indexed type."""
    c = test_collection
    empty = spark.createDataFrame([], "doc_id long, text string")
    c.build_text_index("tex", empty)
    out = c.search_bm25("tex", ["spark"])
    assert out.count() == 0
    assert dict(out.dtypes)["doc_id"] == "bigint"


def test_maintain_folds_and_verifies_text_index(ti_col, spark):
    """maintain() must fold the postings delta and include the text
    index in its verify sweep (the scoped-index list)."""
    c = ti_col
    c.ingest(
        "corpus",
        spark.createDataFrame(_corpus(5, seed=13, start=700)),
        text_index="tix", index_col="doc_id",
    )
    rep = c.maintain(verify_indexes=True)
    ti_rep = rep.get("tix") or {}
    assert ti_rep.get("text_index", {}).get("postings_folded", 0) > 0
    assert "verify" in ti_rep
    assert ti_rep["verify"]["ok"], ti_rep["verify"]


def test_multiquery_equals_per_query_search(ti_col, spark):
    """search_bm25_many: each bag's rows must EXACTLY equal its
    standalone search_bm25 top-k (contributions are query-independent
    — the shared pass can never change a score), with rank the
    1-based position."""
    c = ti_col
    bags = {
        "q1": QUERY,
        "q2": ["join", "filter", "table"],
        "q3": ["data", "merge"],
    }
    queries = spark.createDataFrame(
        [(q, ts) for q, ts in bags.items()],
        "query_id string, terms array<string>",
    )
    got = c.search_bm25_many("tix", queries, top_k=5)
    by_q: dict = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["bm25"])
        )
    for q, terms in bags.items():
        single = [
            (i + 1, r["doc_id"], r["bm25"])
            for i, r in enumerate(
                c.search_bm25("tix", terms, top_k=5).collect()
            )
        ]
        assert sorted(by_q[q]) == single, q


def test_multiquery_empty_terms_raises(ti_col, spark):
    queries = spark.createDataFrame(
        [("q1", [])], "query_id string, terms array<string>"
    )
    with pytest.raises(ValueError, match="no terms"):
        ti_col.search_bm25_many("tix", queries)


def test_delete_where_repairs_text_index(ti_col):
    """delete_where(repair_indexes=True) must reach the text index
    (the post-delete repair hook dispatched on dedup/line/vector
    sidecars only and skipped substring/text — the scope scan now
    covers all five index families)."""
    c = ti_col
    rep = c.delete_where(
        "corpus", [("doc_id", "in", [5, 6])], repair_indexes=True
    )
    assert rep["index_repairs"]["tix"]["n_orphans_dropped"] == 2
    chk = c.verify_index(None, "tix")
    assert chk["ok"], chk
    got = c.search_bm25("tix", QUERY, top_k=10)
    exp = X.bm25_topk(c.item("corpus").data, QUERY, top_k=10)
    assert _ranked(got) == _ranked(exp)


def test_describe_reports_index_roles(ti_col, spark):
    assert ti_col.describe("tix")["roles"].get("text_index")
    ti_col.register_benchmark(
        "bregD", "e1",
        spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        ),
        n=3,
    )
    assert ti_col.describe("bregD")["roles"].get("benchmark_registry")


def test_delete_half_corpus_repair_matches_fresh_build(ti_col, spark):
    """Round-9 verdict #5: a delete that removes corpus docs leaves
    the BM25 corpus stats (n_docs / total_dl) stale — a drifted avgdl
    skews EVERY score silently. delete_where(repair_indexes=True) must
    decrement them: after deleting half the corpus and repairing,
    search_bm25 must equal a FRESH index built over the survivors
    bit-for-bit."""
    c = ti_col
    rep = c.delete_where(
        "corpus", [("doc_id", "<", 20)], repair_indexes=True
    )
    assert rep["n_deleted"] == 20
    assert "tix" in rep["index_repairs"]

    audit = c.verify_index("corpus", "tix")
    assert audit["ok"] and audit["stats_ok"], audit
    assert audit["meta_n_docs"] == 20  # decremented, not build-time 40

    # fresh ground-truth index over the surviving corpus
    c.build_text_index("tix_fresh", "corpus")
    got = _ranked(c.search_bm25("tix", QUERY, top_k=10))
    want = _ranked(c.search_bm25("tix_fresh", QUERY, top_k=10))
    assert got == want  # bit-for-bit: same docs, same scores
    # and both equal the batch operator on the survivors
    exp = _ranked(
        X.bm25_topk(c.item("corpus").data, QUERY, top_k=10)
    )
    assert got == exp
