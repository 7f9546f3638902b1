"""Capstone lifecycle test: the round-5 feature set working TOGETHER
over a multi-day curated corpus — daily ingest through both persistent
indexes, GDPR deletion, retention, nightly maintenance with the fsck,
drift repair, and replay safety. Each step asserts the invariants the
individual suites pin, but across the interactions."""

from __future__ import annotations

import pandas as pd
import pytest

from pystore_spark import dedup_index as DI


BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "today while the sun shines over the quiet valley "
)
BOILER = "subscribe to our newsletter for daily updates"


def _day(ids, tail="", extra_line=None):
    # long shared body so the boiler line is a small Jaccard fraction
    # (stored docs are INDEXED with it; near-dups must clear 0.8)
    rows = []
    for i in ids:
        text = (
            BASE + f"tail {i} {tail} "
            + " ".join(f"filler{j} words here" for j in range(16))
        )
        if extra_line:
            text += "\n" + extra_line
        rows.append((i, text))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_full_curated_corpus_lifecycle(test_collection, spark):
    c = test_collection

    # day 0: bootstrap corpus + both persistent indexes
    c.write("corpus", _day(range(6), extra_line=BOILER),
            index_col="doc_id")
    c.build_dedup_index("didx", "corpus")
    c.build_line_index("lidx", "corpus")

    # day 1: ingest — near-dup of doc 2 drops, boilerplate line
    # (corpus-owned) is stripped, novel line registers
    novel_line = "a genuinely novel closing line"
    batch1 = pd.concat([
        _day([100], tail="novel prose about adaptive execution"),
        _day([101], extra_line=BOILER + "\n" + novel_line),
    ])
    batch1.loc[batch1.doc_id == 100, "text"] = (
        _day([2]).loc[0, "text"] + " tiny"  # near-dup of stored doc 2
    )
    rep = c.ingest(
        "corpus", spark.createDataFrame(batch1),
        dedup_index="didx", line_index="lidx", index_col="doc_id",
    )
    assert rep["n_dropped_dedup"] == 1 and rep["n_appended"] == 1
    stored = {r["doc_id"]: r["text"]
              for r in c.item("corpus").data.collect()}
    assert set(stored) == set(range(6)) | {101}
    assert BOILER not in stored[101]
    assert novel_line in stored[101]
    doc101_text = stored[101]

    # day 2: a batch repeating day 1's novel line loses it (census),
    # and a re-split near-dup of day 1's survivor drops (delta tier)
    d1_words = stored[101].split()
    resplit = (
        " ".join(d1_words[: len(d1_words) // 2]) + "\n"
        + " ".join(d1_words[len(d1_words) // 2:])
    )
    batch2 = pd.DataFrame(
        {
            "doc_id": [200, 201],
            "text": [
                resplit,
                "fresh second-day content with plenty of words\n"
                + novel_line,
            ],
        }
    )
    rep = c.ingest(
        "corpus", spark.createDataFrame(batch2),
        dedup_index="didx", line_index="lidx", index_col="doc_id",
    )
    assert rep["n_appended"] == 1
    stored = {r["doc_id"]: r["text"]
              for r in c.item("corpus").data.collect()}
    assert 200 not in stored
    assert novel_line not in stored[201]

    # nightly: maintenance folds the deltas; the fsck stays green
    c.maintain(verify_indexes=True)
    assert c.verify_index("corpus", "didx")["ok"]
    assert c.verify_index("corpus", "lidx")["ok"]

    # GDPR: doc 101 must go — the metadata-preserving delete keeps
    # every sidecar counter; the audit then reports the stale index
    # entries and repair heals them (and the orphaned census rows)
    totals_before = (
        c.get_item_metadata("corpus") or {}
    ).get("_ingest_totals")
    assert c.delete_where("corpus", [("doc_id", "==", 101)])[
        "n_deleted"
    ] == 1
    assert (
        c.get_item_metadata("corpus") or {}
    ).get("_ingest_totals") == totals_before
    audit = c.verify_index("corpus", "didx")
    assert not audit["ok"] and audit["n_stale"] == 1
    c.repair_index("corpus", "didx")
    c.repair_index("corpus", "lidx")
    assert c.verify_index("corpus", "didx")["ok"]
    assert c.verify_index("corpus", "lidx", deep=True)["ok"]

    # post-repair: a near-dup of the DELETED doc is novel again, and
    # the line it owned flows again (nothing stored carries it)
    batch3 = pd.DataFrame(
        {"doc_id": [300], "text": [doc101_text + " reprise"]}
    )
    rep = c.ingest(
        "corpus", spark.createDataFrame(batch3),
        dedup_index="didx", line_index="lidx", index_col="doc_id",
    )
    assert rep["n_appended"] == 1
    final = {r["doc_id"]: r["text"] for r in
             c.item("corpus").data.collect()}
    assert set(final) == set(range(6)) | {201, 300}
    assert novel_line in final[300]  # ownership returned with the doc
    assert c.verify_index("corpus", "didx")["ok"]
