"""Bloom-filter file skipping (pystore_spark/bloom.py).

The correctness contract under test: Bloom pruning NEVER changes a
query result (no false negatives — every stored value is hashed in),
it only shrinks the scanned file set; a proven-empty verdict must
imply a truly empty result. The reference engine has no file skipping
at all (pystore/item.py filters row-level over the full dataset), so
the parity bar is result equality, and the added value is the file
counts asserted here."""

from __future__ import annotations

import pandas as pd
import numpy as np
import pytest

from pystore_spark import bloom as bl


# ---------------------------------------------------------------------------
# unit: filter construction + membership
# ---------------------------------------------------------------------------


def test_no_false_negatives_exhaustive():
    vals = [f"id-{i}" for i in range(2000)]
    m, k, n, bits = bl.build_filter(vals)
    assert n == 2000 and bits is not None
    for v in vals:  # every inserted value must test positive
        h1, h2 = bl._hash_pair(v.encode())
        assert bl._test_bits(bits, h1, h2, m, k)


def test_false_positive_rate_sane():
    vals = [f"id-{i}" for i in range(5000)]
    m, k, n, bits = bl.build_filter(vals)
    assert bits is not None
    fp = 0
    probes = 5000
    for i in range(probes):
        h1, h2 = bl._hash_pair(f"absent-{i}".encode())
        fp += bl._test_bits(bits, h1, h2, m, k)
    # budgeted ~0.3% at BITS_PER_KEY=12/k=7; allow generous slack
    assert fp / probes < 0.02, f"FPR {fp/probes:.4f} too high"


def test_canonicalization_int_matches_numpy():
    # storage side hashes numpy ints, probe side Python ints
    assert bl._canon(np.int64(42)) == bl._canon(42)
    assert bl._canon(np.uint32(7)) == bl._canon(7)
    assert bl._canon("x") == b"x"
    assert bl._canon(True) is None  # bools excluded
    assert bl._canon(1.5) is None  # floats have no canonical bytes
    assert bl._canon(pd.Timestamp("2023-01-01")) is None


def test_saturation_disables_filter():
    # MIN_BITS floor with far more values than the fill budget
    vals = [f"v{i}" for i in range(200_000)]
    monkey = bl.MAX_BITS
    try:
        bl.MAX_BITS = bl.MIN_BITS  # force the cap down
        m, k, n, bits = bl.build_filter(vals)
        assert bits is None  # saturated → recorded as never-prunes
    finally:
        bl.MAX_BITS = monkey


def test_prune_dnf_and_conservatism():
    files = ["a.parquet", "b.parquet", "c.parquet"]

    def filt_for(values):
        m, k, n, bits = bl.build_filter(values)
        return (m, k, n, bits)

    blooms = {
        ("a.parquet", "id"): filt_for(["x", "y"]),
        ("b.parquet", "id"): filt_for(["z"]),
        # c has no bloom row → never pruned
    }
    kept, empty = bl.prune(files, [("id", "==", "z")], blooms, ["id"])
    assert "b.parquet" in kept and "c.parquet" in kept
    assert "a.parquet" not in kept and not empty
    # in-list unions the probes
    kept, empty = bl.prune(
        files, [("id", "in", ["x", "z"])], blooms, ["id"]
    )
    assert set(kept) == {"a.parquet", "b.parquet", "c.parquet"}
    # OR groups: [[id==x], [id==z]] keeps the union of matches
    kept, empty = bl.prune(
        files, [[("id", "==", "x")], [("id", "==", "z")]], blooms, ["id"]
    )
    assert "a.parquet" in kept and "b.parquet" in kept
    # untestable op passes through
    kept, empty = bl.prune(files, [("id", ">", "a")], blooms, ["id"])
    assert kept == files and not empty
    # non-bloom column passes through
    kept, empty = bl.prune(files, [("other", "==", "x")], blooms, ["id"])
    assert kept == files and not empty
    # miss on the only bloom-covered files, but c is conservative-kept
    blooms2 = {k: v for k, v in blooms.items()}
    kept, empty = bl.prune(
        ["a.parquet", "b.parquet"], [("id", "==", "absent")], blooms2,
        ["id"],
    )
    assert empty and kept == ["a.parquet", "b.parquet"]  # full-list convention
    # saturated row never prunes and never proves empty
    blooms3 = {("a.parquet", "id"): (bl.MIN_BITS, bl.K_HASHES, 9, None)}
    kept, empty = bl.prune(
        ["a.parquet"], [("id", "==", "absent")], blooms3, ["id"]
    )
    assert kept == ["a.parquet"] and not empty


def test_prune_null_probe_untestable():
    blooms = {("a.parquet", "id"): bl.build_filter(["x"])}
    kept, empty = bl.prune(
        ["a.parquet"], [("id", "==", None)], blooms, ["id"]
    )
    assert kept == ["a.parquet"] and not empty


# ---------------------------------------------------------------------------
# integration through the engine
# ---------------------------------------------------------------------------


@pytest.fixture()
def coll(test_store):
    return test_store.collection("bloom_tests", overwrite=True)


def _docs_frame(n=4000, prefix="doc", start="2023-01-01"):
    return pd.DataFrame(
        {
            "ts": pd.date_range(start, periods=n, freq="min"),
            "doc_id": [f"{prefix}-{i:06d}" for i in range(n)],
            "val": np.arange(n, dtype=float),
        }
    ).set_index("ts")


def test_point_lookup_prunes_and_matches(coll):
    pdf = _docs_frame()
    coll.write("docs", pdf, bloom=["doc_id"], npartitions=8)
    it = coll.item("docs", filters=[("doc_id", "==", "doc-000123")])
    rep = it.scan_report()
    assert rep["n_files_live"] == 8
    assert rep["n_files_selected"] <= 2  # ≥6 of 8 files bloom-skipped
    got = it.to_pandas(engine="spark")
    assert len(got) == 1 and got["doc_id"].iloc[0] == "doc-000123"
    # arrow engine sees the same single row through the same pruning
    got_a = coll.item(
        "docs", filters=[("doc_id", "==", "doc-000123")]
    ).to_pandas(engine="arrow")
    assert len(got_a) == 1


def test_miss_is_proven_empty(coll):
    coll.write("docs_m", _docs_frame(), bloom=["doc_id"], npartitions=8)
    it = coll.item("docs_m", filters=[("doc_id", "==", "zz-absent")])
    rep = it.scan_report()
    assert rep["bloom_proven_empty"] is True
    assert rep["n_files_selected"] == 0
    got = it.to_pandas(engine="spark")
    assert len(got) == 0
    # the physical plan collapses to an empty relation — no file scan
    plan = it.data._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "EmptyRelation" in plan


def test_in_list_probe(coll):
    coll.write("docs_in", _docs_frame(), bloom=["doc_id"], npartitions=8)
    ids = ["doc-000001", "doc-003999", "nope-1"]
    it = coll.item("docs_in", filters=[("doc_id", "in", ids)])
    got = it.to_pandas(engine="spark")
    assert sorted(got["doc_id"]) == ["doc-000001", "doc-003999"]
    assert it.scan_report()["n_files_selected"] <= 4


def test_result_parity_with_unbloomedtwin(coll):
    """Bloom pruning must be result-invisible: same frame with and
    without filters enabled, across ops and engines."""
    pdf = _docs_frame(1500)
    coll.write("twin_b", pdf, bloom=["doc_id"], npartitions=5)
    coll.write("twin_p", pdf, npartitions=5)
    for flt in (
        [("doc_id", "==", "doc-000700")],
        [("doc_id", "in", ["doc-000001", "doc-001499", "x"])],
        [[("doc_id", "==", "doc-000002")], [("val", ">", 1490.0)]],
        [("val", "<", 5.0)],
    ):
        a = coll.item("twin_b", filters=flt).to_pandas(engine="spark")
        b = coll.item("twin_p", filters=flt).to_pandas(engine="spark")
        pd.testing.assert_frame_equal(
            a.sort_index(), b.sort_index()
        )


def test_append_maintains_blooms(coll):
    coll.write("docs_a", _docs_frame(), bloom=["doc_id"], npartitions=4)
    extra = _docs_frame(200, prefix="new", start="2023-06-01")
    coll.append("docs_a", extra)
    it = coll.item("docs_a", filters=[("doc_id", "==", "new-000050")])
    got = it.to_pandas(engine="spark")
    assert len(got) == 1
    # old ids still found, absent ids still proven empty
    assert len(
        coll.item(
            "docs_a", filters=[("doc_id", "==", "doc-000005")]
        ).to_pandas(engine="spark")
    ) == 1
    assert (
        coll.item("docs_a", filters=[("doc_id", "==", "gone")])
        .scan_report()["bloom_proven_empty"]
    )


def test_delete_by_id_uses_blooms(coll):
    coll.write("docs_d", _docs_frame(), bloom=["doc_id"], npartitions=6)
    r = coll.delete_where("docs_d", [("doc_id", "==", "doc-000042")])
    assert r["n_deleted"] == 1
    assert (
        len(
            coll.item(
                "docs_d", filters=[("doc_id", "==", "doc-000042")]
            ).to_pandas(engine="spark")
        )
        == 0
    )
    # a miss delete is a proven no-op — no buckets touched
    r2 = coll.delete_where("docs_d", [("doc_id", "==", "absent-id")])
    assert r2["n_deleted"] == 0 and not r2["buckets_rewritten"]


def test_maintain_folds_sidecars(coll):
    from pathlib import Path

    coll.write("docs_f", _docs_frame(), bloom=["doc_id"], npartitions=4)
    coll.append("docs_f", _docs_frame(100, "n1", "2023-07-01"))
    coll.append("docs_f", _docs_frame(100, "n2", "2023-08-01"))
    item_path = Path(coll._item_path("docs_f"))
    before = list((item_path / "_blooms").glob("*.parquet"))
    assert len(before) >= 2  # one sidecar per commit
    res = coll.maintain("docs_f", refresh_rollups=False)["docs_f"]
    fold = res.get("bloom_fold")
    assert fold is not None and fold["sidecars_before"] >= 2
    after = list((item_path / "_blooms").glob("*.parquet"))
    assert len(after) == 1
    # post-fold probes still correct
    assert (
        len(
            coll.item(
                "docs_f", filters=[("doc_id", "==", "n2-000007")]
            ).to_pandas(engine="spark")
        )
        == 1
    )


def test_gc_spares_bloom_sidecars(coll):
    from pathlib import Path

    from pystore_spark import manifest as mf

    coll.write("docs_g", _docs_frame(500), bloom=["doc_id"], npartitions=2)
    removed = mf.gc_item(
        coll.path, "docs_g", retention=0.0, orphan_grace=0.0
    )
    item_path = Path(coll._item_path("docs_g"))
    assert list((item_path / "_blooms").glob("*.parquet"))
    assert (
        len(
            coll.item(
                "docs_g", filters=[("doc_id", "==", "doc-000003")]
            ).to_pandas(engine="spark")
        )
        == 1
    )


def test_set_bloom_backfill_and_disable(coll):
    coll.write("docs_s", _docs_frame(), npartitions=6)  # no blooms
    rep0 = coll.item(
        "docs_s", filters=[("doc_id", "==", "doc-000009")]
    ).scan_report()
    assert rep0["n_files_selected"] == 6  # nothing prunes string ids
    r = coll.set_bloom("docs_s", ["doc_id"])
    assert r["n_backfilled"] == 6
    rep1 = coll.item(
        "docs_s", filters=[("doc_id", "==", "doc-000009")]
    ).scan_report()
    assert rep1["n_files_selected"] <= 2
    assert (
        len(
            coll.item(
                "docs_s", filters=[("doc_id", "==", "doc-000009")]
            ).to_pandas(engine="spark")
        )
        == 1
    )
    off = coll.set_bloom("docs_s", None)
    assert off["columns"] == []
    rep2 = coll.item(
        "docs_s", filters=[("doc_id", "==", "doc-000009")]
    ).scan_report()
    assert rep2["n_files_selected"] == 6  # back to full candidate set


def test_snapshot_reads_resolve_blooms_through_base(coll):
    coll.write("docs_snap", _docs_frame(800), bloom=["doc_id"], npartitions=4)
    coll.create_snapshot("s1")
    it = coll.item(
        "docs_snap", snapshot="s1",
        filters=[("doc_id", "==", "doc-000100")],
    )
    got = it.to_pandas(engine="spark")
    assert len(got) == 1


def test_compact_rebuilds_blooms_for_rewritten_files(coll):
    coll.write("docs_c", _docs_frame(), bloom=["doc_id"], npartitions=8)
    coll.compact("docs_c", target_size_mb=64)
    it = coll.item("docs_c", filters=[("doc_id", "==", "doc-001234")])
    assert len(it.to_pandas(engine="spark")) == 1
    assert (
        coll.item("docs_c", filters=[("doc_id", "==", "nope")])
        .scan_report()["bloom_proven_empty"]
    )


def test_spark_build_parity_with_driver_build(coll):
    """The distributed builder must be bit-identical to the driver
    builder — the commit hook switches between them on staged file
    count, and a probe must see the same skip verdicts either way."""
    from pystore_spark import manifest as mfmod
    from pystore_spark import utils as u

    coll.write("docs_par", _docs_frame(3000), bloom=["doc_id"],
               npartitions=6)
    item_path = coll._item_path("docs_par")
    man = u.read_manifest(item_path)
    rels = list(man["files"])
    drv = {
        (r["file"], r["col"]): (r["m"], r["k"], r["n"], r["bits"])
        for r in bl.build_for_files(
            item_path, coll.fs, rels, ["doc_id"]
        )
    }
    spk = {
        (r["file"], r["col"]): (r["m"], r["k"], r["n"], r["bits"])
        for r in bl.build_for_files_spark(
            coll.spark, item_path, rels, ["doc_id"]
        )
    }
    assert drv == spk and len(drv) == len(rels)


def test_large_commit_uses_spark_build_and_probes_correctly(coll):
    """A >SPARK_BUILD_MIN_FILES commit goes through the executor-side
    builder inside the real commit hook; probes behave identically."""
    n_files = bl.SPARK_BUILD_MIN_FILES + 4
    coll.write("docs_big", _docs_frame(6000), bloom=["doc_id"],
               npartitions=n_files)
    rep = coll.item(
        "docs_big", filters=[("doc_id", "==", "doc-000042")]
    ).scan_report()
    assert rep["n_files_live"] == n_files
    assert rep["n_files_selected"] <= 3
    assert (
        len(
            coll.item(
                "docs_big", filters=[("doc_id", "==", "doc-000042")]
            ).to_pandas(engine="spark")
        )
        == 1
    )
    assert (
        coll.item("docs_big", filters=[("doc_id", "==", "absent")])
        .scan_report()["bloom_proven_empty"]
    )


# ---------------------------------------------------------------------------
# token mode (`contains` / `has_token` file skipping)
# ---------------------------------------------------------------------------


def test_tokens_interior_only_soundness():
    # tokens of a needle: interior tokens are complete in any match;
    # edge tokens may continue mid-word and must be dropped
    assert bl._tokens("stream filter") == [b"stream", b"filter"]
    assert bl._tokens("ream filt", interior_only=True) == []
    assert bl._tokens("a stream filt", interior_only=True) == [b"stream"]
    assert bl._tokens(" spaced out ", interior_only=True) == [
        b"spaced", b"out",
    ]
    # dedup + lowercase + min length 2
    assert bl._tokens("The THE the x ab") == [b"the", b"ab"]


def test_token_prune_contains_edge_token_not_false_negative():
    """A needle matching mid-word must never prune the file that
    contains it: 'ream filt' occurs inside 'stream filter'."""
    blooms = {
        ("f.parquet", "text"): bl.build_filter(
            ["the stream filter runs"], mode="tokens"
        )
    }
    cols = [{"col": "text", "mode": "tokens"}]
    kept, empty = bl.prune(
        ["f.parquet"], [("text", "contains", "ream filt")], blooms, cols
    )
    assert kept == ["f.parquet"] and not empty
    # full-phrase contains: interior token 'filter'? needle edges are
    # 'stream'(start) and 'runs'(end) — both dropped; 'filter' tested
    kept, empty = bl.prune(
        ["f.parquet"],
        [("text", "contains", "stream filter runs")],
        blooms, cols,
    )
    assert kept == ["f.parquet"]
    # absent interior token → proven empty
    kept, empty = bl.prune(
        ["f.parquet"],
        [("text", "contains", "a qqabsentqq z")],
        blooms, cols,
    )
    assert empty
    # has_token tests every token, single-token needles included
    kept, empty = bl.prune(
        ["f.parquet"], [("text", "has_token", "qqabsentqq")], blooms,
        cols,
    )
    assert empty
    kept, empty = bl.prune(
        ["f.parquet"], [("text", "has_token", "stream")], blooms, cols
    )
    assert kept == ["f.parquet"] and not empty


def _texts_frame(n=3000, marker_at=1234):
    rng = np.random.default_rng(3)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    texts = [" ".join(rng.choice(words, 12)) for _ in range(n)]
    texts[marker_at] = texts[marker_at] + " zzmarkerzz special"
    return pd.DataFrame(
        {
            "ts": pd.date_range("2023-01-01", periods=n, freq="min"),
            "doc_id": range(n),
            "text": texts,
        }
    ).set_index("ts"), texts


def test_token_bloom_through_engine(coll):
    pdf, texts = _texts_frame()
    coll.write(
        "toks", pdf, bloom=[{"col": "text", "mode": "tokens"}],
        npartitions=8,
    )
    it = coll.item("toks", filters=[("text", "has_token", "zzmarkerzz")])
    rep = it.scan_report()
    assert rep["n_files_live"] == 8 and rep["n_files_selected"] == 1
    got = it.to_pandas(engine="spark")
    assert got["doc_id"].tolist() == [1234]
    # arrow engine agrees (manual pyarrow expression path)
    assert len(it.to_pandas(engine="arrow")) == 1
    # absent token proven empty
    miss = coll.item(
        "toks", filters=[("text", "has_token", "qqabsentqq")]
    )
    assert miss.scan_report()["bloom_proven_empty"]
    assert len(miss.to_pandas(engine="spark")) == 0
    # substring correctness against the python model, incl. mid-word
    for needle in ("lph", "alpha", "o delta"):
        rows = coll.item(
            "toks", filters=[("text", "contains", needle)]
        ).to_pandas(engine="spark")
        assert len(rows) == sum(needle in t for t in texts)


def test_contains_without_bloom_still_works(coll):
    pdf, texts = _texts_frame(800, marker_at=123)
    coll.write("toks_plain", pdf, npartitions=3)
    rows = coll.item(
        "toks_plain", filters=[("text", "contains", "zzmarkerzz")]
    ).to_pandas(engine="spark")
    assert len(rows) == 1
    rows_a = coll.item(
        "toks_plain", filters=[("text", "has_token", "alpha")]
    ).to_pandas(engine="arrow")
    assert len(rows_a) == sum("alpha" in t.split() for t in texts[:800])


def test_contains_probe_never_false_negative_fuzz():
    """Soundness theorem, fuzzed: for ANY stored text and ANY
    substring needle of it, the token bloom must keep the file; for
    any complete token of the text, has_token must keep it."""
    from hypothesis import given, settings, strategies as st

    alphabet = "ab c1.-xyz "

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet=alphabet, min_size=1, max_size=60),
        st.integers(0, 59),
        st.integers(1, 60),
    )
    def run(text, start, length):
        blooms = {("f", "t"): bl.build_filter([text], mode="tokens")}
        cols = [{"col": "t", "mode": "tokens"}]
        needle = text[start : start + length]
        if needle:
            kept, _ = bl.prune(
                ["f"], [("t", "contains", needle)], blooms, cols
            )
            assert kept == ["f"], (text, needle)
        for tok in bl.TOKEN_RE.findall(text.lower()):
            kept, _ = bl.prune(
                ["f"], [("t", "has_token", tok)], blooms, cols
            )
            assert kept == ["f"], (text, tok)

    run()


def test_audit_contamination(coll):
    pdf, texts = _texts_frame(2000, marker_at=777)
    coll.write(
        "contam", pdf, bloom=[{"col": "text", "mode": "tokens"}],
        npartitions=6,
    )
    terms = ["zzmarkerzz", "qqabsentqq", "alpha", "echo foxtrot"]
    rep = coll.audit_contamination("contam", terms)
    assert rep["_audit"]["bloom_indexed"] is True
    assert rep["qqabsentqq"] == {
        "n_docs": 0, "proven_absent": True, "files_scanned": 0
    }
    assert rep["zzmarkerzz"]["n_docs"] == 1
    assert rep["zzmarkerzz"]["files_scanned"] <= 2
    # token-boundary counts match the python model
    assert rep["alpha"]["n_docs"] == sum(
        "alpha" in t.split() for t in texts
    )
    import re as _re

    pat = _re.compile(r"(^|[^0-9a-z])echo foxtrot([^0-9a-z]|$)")
    assert rep["echo foxtrot"]["n_docs"] == sum(
        bool(pat.search(t.lower())) for t in texts
    )
    # substring op variant
    rep2 = coll.audit_contamination(
        "contam", ["lph"], op="contains"
    )
    assert rep2["lph"]["n_docs"] == sum("lph" in t for t in texts)
    # unbloomed item: same counts, full scan, no proofs
    coll.write("contam_plain", pdf, npartitions=6)
    rep3 = coll.audit_contamination("contam_plain", terms)
    assert rep3["_audit"]["bloom_indexed"] is False
    assert rep3["zzmarkerzz"]["n_docs"] == 1
    assert rep3["qqabsentqq"]["n_docs"] == 0
    assert not rep3["qqabsentqq"]["proven_absent"]
