"""Persistent benchmark registry (benchmarks.py): register eval-set
n-grams once, scrub every later ingest against them — registration,
n-pinning, replace/unregister lifecycle, equivalence with the batch
decontaminate_spans operator, named-subset scrubs, and the
ingest(decontam_registry=) wiring (funnel row + report + cut-before-
storage semantics)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pystore_spark import benchmarks as BM
from pystore_spark.functions import text as X

# two 6+-token eval passages (n=4 in these tests)
EVAL1 = "the capital of france is paris obviously"
EVAL2 = "water boils at one hundred degrees celsius"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def reg_col(test_collection, spark):
    c = test_collection
    c.register_benchmark(
        "breg", "evalA", _docs(spark, [(0, EVAL1)]), n=4
    )
    c.register_benchmark(
        "breg", "evalB", _docs(spark, [(0, EVAL2)]), n=4
    )
    return c


def test_register_and_list(reg_col):
    c = reg_col
    got = c.registered_benchmarks("breg")
    assert [r["bench"] for r in got] == ["evalA", "evalB"]
    # EVAL1 has 7 tokens -> 4 distinct 4-grams; EVAL2 likewise 7 -> 4
    assert all(r["n_grams"] == 4 for r in got)
    meta = c.get_item_metadata("breg")[BM.META_KEY]
    assert meta["n"] == 4


def test_n_is_pinned(reg_col, spark):
    with pytest.raises(ValueError, match="pins n=4"):
        reg_col.register_benchmark(
            "breg", "evalC", _docs(spark, [(0, EVAL1)]), n=5
        )


def test_duplicate_name_needs_replace(reg_col, spark):
    c = reg_col
    with pytest.raises(ValueError, match="already registered"):
        c.register_benchmark(
            "breg", "evalA", _docs(spark, [(0, EVAL2)]), n=4
        )
    rep = c.register_benchmark(
        "breg", "evalA", _docs(spark, [(0, EVAL2)]), n=4, replace=True
    )
    assert rep["n_grams"] == 4
    # evalA now carries EVAL2's grams: scrubbing ONLY evalA cuts EVAL2
    out, r = c.decontaminate_against(
        "breg",
        _docs(spark, [(1, f"intro {EVAL2} outro")]),
        benchmarks=["evalA"],
    )
    assert EVAL2 not in out.collect()[0]["text"]
    assert r["n_docs_cleaned"] == 1


def test_short_benchmark_rejected(test_collection, spark):
    with pytest.raises(ValueError, match="no 4-grams"):
        test_collection.register_benchmark(
            "breg2", "tiny", _docs(spark, [(0, "too few")]), n=4
        )


def test_equivalence_with_batch_operator(reg_col, spark):
    """Registry scrub == decontaminate_spans over the union of the
    registered eval frames (same n): byte-identical cleaned text."""
    c = reg_col
    docs = _docs(spark, [
        (1, f"alpha beta {EVAL1} gamma delta"),
        (2, f"{EVAL2} standalone opener with more words after it"),
        (3, "entirely clean document with its own original words"),
    ])
    bench = _docs(spark, [(0, EVAL1), (1, EVAL2)])
    expected = {
        r["doc_id"]: r["cleaned_text"]
        for r in X.decontaminate_spans(docs, bench, n=4).collect()
    }
    out, rep = c.decontaminate_against("breg", docs)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == expected
    assert rep["n_docs_cleaned"] == 2
    assert rep["n_spans_removed"] >= 2
    # clean doc byte-identical (zero-hit passthrough)
    assert got[3] == "entirely clean document with its own original words"


def test_subset_and_unknown_benchmarks(reg_col, spark):
    c = reg_col
    doc = _docs(spark, [(1, f"x {EVAL1} y {EVAL2} z")])
    out, _ = c.decontaminate_against("breg", doc, benchmarks=["evalB"])
    text = out.collect()[0]["text"]
    assert EVAL1 in text and EVAL2 not in text
    with pytest.raises(ValueError, match="not registered"):
        c.decontaminate_against("breg", doc, benchmarks=["nope"])
    with pytest.raises(ValueError, match="list is empty"):
        c.decontaminate_against("breg", doc, benchmarks=[])


def test_unregister_lifecycle(reg_col, spark):
    c = reg_col
    rep = c.unregister_benchmark("breg", "evalA")
    assert not rep["registry_deleted"]
    assert [r["bench"] for r in c.registered_benchmarks("breg")] == [
        "evalB"
    ]
    # evalA's grams are gone: EVAL1 passes through untouched
    out, _ = c.decontaminate_against(
        "breg", _docs(spark, [(1, f"pre {EVAL1} post")])
    )
    assert EVAL1 in out.collect()[0]["text"]
    with pytest.raises(ValueError, match="not registered"):
        c.unregister_benchmark("breg", "evalA")
    # removing the last benchmark deletes the registry item
    rep = c.unregister_benchmark("breg", "evalB")
    assert rep["registry_deleted"]
    assert not c.item_exists("breg")


def test_not_a_registry_raises(test_collection, spark):
    c = test_collection
    c.write(
        "plain",
        pd.DataFrame({"doc_id": [1], "text": ["hello world here"]}),
        index_col="doc_id",
    )
    from pystore_spark.exceptions import StorageError

    with pytest.raises(StorageError, match="not a benchmark registry"):
        c.registered_benchmarks("plain")


def test_ingest_with_decontam_registry(reg_col, spark):
    """The daily-ingest wiring: eval spans are cut BEFORE storage,
    the funnel carries a decontam row, and the report counts match
    the materialized cut."""
    c = reg_col
    batch = _docs(spark, [
        (10, f"novel opener {EVAL1} novel closer words"),
        (11, "completely original document body with many words"),
    ])
    rep = c.ingest(
        "corpus_d", batch, decontam_registry="breg", index_col="doc_id"
    )
    assert rep["n_appended"] == 2
    assert rep["decontam"]["n_docs_cleaned"] == 1
    assert rep["decontam"]["n_spans_removed"] == 1
    assert "decontam:breg" in rep["funnel"]
    stored = {
        r["doc_id"]: r["text"]
        for r in c.item("corpus_d").data.collect()
    }
    assert EVAL1 not in stored[10]
    assert "novel opener" in stored[10]
    assert stored[11] == (
        "completely original document body with many words"
    )


def test_ingest_decontam_before_substring_census(reg_col, spark):
    """Order contract: decontam runs BEFORE the gram census strip and
    its registration — benchmark bytes never reach storage, so the
    census never comes to own them (a later batch keeps eval text
    only until ITS decontam cut, never loses it to a census owner)."""
    c = reg_col
    c.write(
        "corpus_s",
        pd.DataFrame({
            "doc_id": [0],
            "text": ["seed corpus document body with enough words"],
        }),
        index_col="doc_id",
    )
    c.build_substring_index("sgx", "corpus_s", k=4)
    b0 = _docs(spark, [(10, f"first batch start {EVAL1} first batch end")])
    rep = c.ingest(
        "corpus_s", b0, substring_index="sgx",
        decontam_registry="breg", index_col="doc_id",
    )
    stored = {
        r["doc_id"]: r["text"]
        for r in c.item("corpus_s").data.collect()
    }
    assert EVAL1 not in stored[10]
    # census registered only the CLEANED text's grams: no census row
    # may carry an eval token sequence
    assert rep["decontam"]["n_spans_removed"] == 1
    chk = c.verify_index(None, "sgx", deep=True)
    assert chk["ok"], chk


def test_failed_replace_preserves_old_benchmark(reg_col, spark):
    """Review finding (round 9): replace=True used to unregister the
    old grams BEFORE validating the replacement — a zero-gram frame
    raised AND destroyed the benchmark (silently ending its scrubs).
    Validation now runs first; the old grams survive the failure."""
    c = reg_col
    with pytest.raises(ValueError, match="no 4-grams"):
        c.register_benchmark(
            "breg", "evalA", _docs(spark, [(0, "too short")]),
            n=4, replace=True,
        )
    # old registration intact and still scrubbing
    assert [r["bench"] for r in c.registered_benchmarks("breg")] == [
        "evalA", "evalB",
    ]
    out, _ = c.decontaminate_against(
        "breg", _docs(spark, [(1, f"pre {EVAL1} post")]),
        benchmarks=["evalA"],
    )
    assert EVAL1 not in out.collect()[0]["text"]
