"""Real-BPE tokenizer tests (functions/bpe.py): merges-file format,
trainer determinism, parity of the engine's lowest-rank-first merge
loop with an INDEPENDENT sequential-fixpoint reference (the oracle's
algorithm, reimplemented here over Python strings rather than SQL),
and the Spark plan surfaces (vocab-join counts, per-row UDF, packed
export budgets)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pystore_spark.functions import bpe as B  # noqa: E402
from pystore_spark.functions.text import BPE_TOKEN_RE  # noqa: E402

SEP = "\x1f"


def seq_fixpoint_apply(word: str, merges) -> list[str]:
    """Independent reference: merges in rank order, ONE leftmost
    occurrence per step until the rank is exhausted — the EXACT
    algorithm of bpe_oracle_sql's recursive CTE (strpos + substr
    splice), so engine-vs-this parity is also engine-vs-oracle parity
    in Python. (A whole-string replace() would differ on repeated-
    char runs: it consumes the separator after each hit and skips the
    next occurrence — 'aaaaa' → [aa,a,aa] instead of the canonical
    [aa,aa,a].)"""
    if not word:
        return []
    s = SEP + SEP.join(word) + SEP
    for a, b in merges:
        pat, rep = SEP + a + SEP + b + SEP, SEP + a + b + SEP
        while True:
            p = s.find(pat)
            if p < 0:
                break
            s = s[:p] + rep + s[p + len(pat):]
    return s.strip(SEP).split(SEP)


def pretoks(text: str) -> list[str]:
    return [m.group(0) for m in re.finditer(BPE_TOKEN_RE, text or "")]


# adversarial fixtures: cascades (repeated chars re-forming the same
# pair), overlapping occurrences, contractions, digit grouping,
# punctuation runs, words untouched by any merge
FIXTURES = [
    "aaaa", "aaaaa", "abababa", "aabbaabb",
    "scan scan window order sort part agg value line key",
    "the parser can't won't it's they're we've i'm we'll i'd",
    "12345 007 9 1234567890",
    "hello, world!!! ... ---",
    "supercalifragilistic", "zzzz qqq xyxyxy",
    "", "   ", "\n\t",
    "mixedCASE Words And SCAN ORDER",
]


def test_merges_resource_wellformed_and_roundtrip(tmp_path):
    merges = B.load_merges()
    assert len(merges) == 48
    assert all(a and b and " " not in a and " " not in b
               for a, b in merges)
    # every merged symbol is the concatenation of prior symbols or
    # single chars — the defining closure property of a merge list
    symbols = {a for a, _ in merges} | {b for _, b in merges}
    for s in symbols:
        assert len(s) >= 1
    p = tmp_path / "m.txt"
    B.save_merges(merges, str(p))
    assert B.load_merges(str(p)) == merges
    assert p.read_text().startswith("#version: 0.2\n")


def test_load_merges_rejects_malformed(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("#version: 0.2\na b c\n")
    with pytest.raises(ValueError, match="malformed"):
        B.load_merges(str(p))
    p.write_text("#version: 0.2\n")
    with pytest.raises(ValueError, match="no merge rules"):
        B.load_merges(str(p))


def test_trainer_deterministic():
    counts = {"scan": 10, "scans": 4, "canal": 3, "ban": 2, "a": 7}
    m1 = B.train_bpe_from_counts(counts, 10)
    m2 = B.train_bpe_from_counts(dict(reversed(list(counts.items()))), 10)
    assert m1 == m2  # insertion order of the counts dict is irrelevant
    assert m1  # learns something
    # first merge is the most frequent pair: 'a n' (scan*10 + scans*4
    # + canal*3 + ban*2 = 19) vs 'c a' (17) vs 's c' (14)
    assert m1[0] == ("a", "n")


def test_engine_apply_matches_sequential_fixpoint_reference():
    merges = B.load_merges()
    rank = {m: i for i, m in enumerate(merges)}
    words = set()
    for t in FIXTURES:
        words.update(pretoks(t))
    for w in sorted(words):
        assert B.apply_bpe_word(w, rank, merges) == \
            seq_fixpoint_apply(w, merges), w
    # and under a handcrafted cascade-heavy merge table
    cascade = [("a", "a"), ("aa", "aa"), ("b", "a"), ("ab", "ab")]
    crank = {m: i for i, m in enumerate(cascade)}
    for w in ["aaaa", "aaaaa", "aaaaaaa", "ba", "baa", "abab",
              "ababab", "aabb", "bbaa"]:
        assert B.apply_bpe_word(w, crank, cascade) == \
            seq_fixpoint_apply(w, cascade), w


def test_equivalence_on_full_corpus_vocabulary():
    """Engine (lowest-rank-first) == oracle (sequential fixpoint) on
    EVERY distinct pre-token of the sf0.001 and sf0.01 documents —
    the equivalence the driver's hash gate relies on, pinned in-repo."""
    import duckdb

    merges = B.load_merges()
    rank = {m: i for i, m in enumerate(merges)}
    con = duckdb.connect()
    words = set()
    for sf in ("sf0.001", "sf0.01"):
        for (t,) in con.execute(
            "SELECT text FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet')"
        ).fetchall():
            words.update(pretoks(t))
    con.close()
    assert words
    for w in sorted(words):
        assert B.apply_bpe_word(w, rank, merges) == \
            seq_fixpoint_apply(w, merges), w


def test_bpe_token_counts_frame(spark):
    merges = B.load_merges()
    rank = {m: i for i, m in enumerate(merges)}
    rows = [
        (0, "scan the window order by key"),
        (1, ""),            # empty doc → 0/0 via the outer join
        (2, "   \n\t "),    # whitespace-only → 0/0
        (3, "scan scan scan"),
        (4, "can't stop won't stop 123 456789 !!!"),
        (5, None),          # null text → 0/0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_pretokens"], r["n_bpe_tokens"])
        for r in B.bpe_token_counts(df, "text", "doc_id").collect()
    }
    for did, text in rows:
        toks = pretoks(text or "")
        want = (
            len(toks),
            sum(len(B.apply_bpe_word(w, rank, merges)) for w in toks),
        )
        assert got[did] == want, (did, text)
    # subword counts exceed pre-token counts on OOV-ish words and
    # never fall below one per pre-token
    assert got[4][1] > got[4][0]


def test_count_udf_matches_vocab_join_path(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"scan window {i} order can't value-{i} !!!")
         for i in range(50)] + [(999, "")],
        "doc_id long, text string",
    )
    via_join = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_token_counts(df, "text", "doc_id").collect()
    }
    via_udf = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", B.bpe_count_udf()(F.col("text")).alias("n")
        ).collect()
    }
    assert via_join == via_udf


def test_train_bpe_distributed_wrapper(spark):
    df = spark.createDataFrame(
        [(i, "scan window order " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    merges = B.train_bpe(df, "text", n_merges=6)
    assert len(merges) == 6
    assert all(isinstance(a, str) and isinstance(b, str)
               for a, b in merges)
    # deterministic across runs
    assert merges == B.train_bpe(df, "text", n_merges=6)


def test_export_training_shards_bpe_budget(test_collection, spark):
    """token_counter='bpe' packs on REAL merge-loop counts: n_tokens
    in the export equals the vocab-join path's n_bpe_tokens, and the
    sidecar records the unit a trainer should expect."""
    import pandas as pd

    c = test_collection
    docs = pd.DataFrame({
        "doc_id": range(12),
        "text": [f"scan window order sort part value key {i}"
                 for i in range(12)],
    })
    c.write("bpe_corpus", docs, index_col="doc_id")
    rep = c.export_training_shards(
        "bpe_export", "bpe_corpus", n_shards=2, pack_budget=30,
        token_counter="bpe",
    )
    assert rep["token_counter"] == "bpe"
    out = c.item("bpe_export").data
    truth = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_token_counts(
            c.item("bpe_corpus").data, "text", "doc_id"
        ).collect()
    }
    for r in out.select("doc_id", "n_tokens", "pack_id").collect():
        assert r["n_tokens"] == truth[r["doc_id"]]
        assert r["pack_id"] >= 0
    with pytest.raises(ValueError, match="token_counter"):
        c.export_training_shards(
            "bpe_export2", "bpe_corpus", token_counter="wordpiece",
        )


# ---------------------------------------------------------------------------
# encode to ids (round-6 continuation: the full trainer hand-off)
# ---------------------------------------------------------------------------
def test_vocab_deterministic_and_json_roundtrip(tmp_path):
    import json

    merges = B.load_merges()
    v = B.bpe_vocab(merges)
    # base alphabet: single chars by codepoint; merges at 257+rank
    assert v["a"] == ord("a") and v["!"] == ord("!")
    a, b = merges[0]
    assert v[a + b] == 257
    assert B.bpe_vocab(merges) == v  # deterministic
    p = tmp_path / "vocab.json"
    B.save_vocab(merges, str(p))
    assert json.loads(p.read_text()) == {k: i for k, i in v.items()}


def test_encode_ids_matches_pure_python(spark):
    merges = B.load_merges()
    rank = {m: i for i, m in enumerate(merges)}
    vocab = B.bpe_vocab(merges)
    rows = [
        (0, "scan the window order by key"),
        (1, ""),
        (2, "can't stop éé 123 !!!"),  # é is <256 → codepoint id
        (3, "scan scan scan"),
        (4, None),
        (5, "Āā beyond latin1"),  # ≥U+0100 → UNK
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["input_ids"]
        for r in B.bpe_encode_ids(df, "text", "doc_id").collect()
    }
    for did, text in rows:
        want = [
            vocab.get(t, B.UNK_ID)
            for w in pretoks(text or "")
            for t in B.apply_bpe_word(w, rank, merges)
        ]
        assert got[did] == want, (did, text)
    assert B.UNK_ID in got[5]
    # ids concatenate in document order, and counts line up
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_token_counts(df, "text", "doc_id").collect()
    }
    for did in got:
        assert len(got[did]) == counts[did]


def test_export_training_shards_encode_ids(test_collection):
    import pandas as pd

    from pyspark.sql import functions as F

    c = test_collection
    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": [f"scan window order part {i}" for i in range(8)],
    })
    c.write("ids_corpus", docs, index_col="doc_id")
    rep = c.export_training_shards(
        "ids_export", "ids_corpus", n_shards=2, pack_budget=20,
        token_counter="bpe", encode_ids=True,
    )
    assert rep["encode_ids"] is True and rep["token_counter"] == "bpe"
    out = c.item("ids_export").data
    assert "input_ids" in out.columns
    # the pack budget counted exactly what the shards carry
    bad = out.filter(
        F.size("input_ids") != F.col("n_tokens")
    ).count()
    assert bad == 0
    # ids match the standalone encoder
    truth = {
        r["doc_id"]: r["input_ids"]
        for r in B.bpe_encode_ids(
            c.item("ids_corpus").data, "text", "doc_id"
        ).collect()
    }
    for r in out.select("doc_id", "input_ids").collect():
        assert r["input_ids"] == truth[r["doc_id"]]


# ---------------------------------------------------------------------------
# equivalence hardening: static theorem condition + property fuzzing
# ---------------------------------------------------------------------------
def test_merges_satisfy_order_equivalence_condition():
    """STATIC proof obligation that makes engine ≡ oracle a theorem
    for ALL inputs, not just tested corpora: applying merges in rank
    order can only diverge from lowest-rank-first iteration if some
    LATER merge creates a symbol string an EARLIER pair references
    (then the later merge could spawn an occurrence of the earlier
    pair that rank-order application never revisits). The shipped
    merges violate neither clause: merged symbol strings are all
    distinct, and no later concat equals an earlier pair component.
    If retraining ever breaks this, THIS test fails before any oracle
    hash mismatch can."""
    merges = B.load_merges()
    syms = [a + b for a, b in merges]
    assert len(set(syms)) == len(syms)
    for e, (a, b) in enumerate(merges):
        for l in range(e + 1, len(merges)):
            assert syms[l] != a and syms[l] != b, (
                f"merge {l} creates {syms[l]!r}, a component of the "
                f"earlier pair {merges[e]!r} — rank-order application "
                "no longer equals lowest-rank-first"
            )


def test_property_engine_equals_reference_on_random_words():
    """Hypothesis fuzz: arbitrary short words over a small alphabet
    (maximizing cascades and overlaps) tokenize identically under the
    engine's lowest-rank-first loop and the oracle's leftmost-splice
    sequential formulation, for the shipped merges AND a handcrafted
    cascade-heavy table. Also: concatenating the subtokens always
    reconstructs the word (losslessness)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    shipped = B.load_merges()
    srank = {m: i for i, m in enumerate(shipped)}
    cascade = [("a", "a"), ("aa", "aa"), ("b", "a"), ("ab", "ab")]
    crank = {m: i for i, m in enumerate(cascade)}

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="abcers t!", min_size=0, max_size=24))
    def check(word):
        for merges, rank in ((shipped, srank), (cascade, crank)):
            # per-word semantics: strip the pre-tokenizer concern by
            # checking each pre-token of the fuzzed string
            for w in pretoks(word):
                got = B.apply_bpe_word(w, rank, merges)
                assert got == seq_fixpoint_apply(w, merges), (
                    w, merges[:4],
                )
                assert "".join(got) == w  # lossless segmentation

    check()


def test_export_bpe_counts_row_preserving_on_duplicate_ids(
    test_collection, spark
):
    """The batch BPE count join keys on a text hash against a
    DISTINCT-text counts frame — many-to-one by construction: stored
    duplicate ids must neither multiply export rows nor inflate
    n_tokens (an id-keyed inner join did both)."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 1, 2],
            "text": [
                "same text here",
                "same text here",
                "another document with more words",
            ],
        }
    )
    c = test_collection
    c.write("bpc", spark.createDataFrame(docs), npartitions=1)
    assert c.item("bpc").data.count() == 3  # dups stored as-is
    c.export_training_shards(
        "bpc_exp", "bpc", id_col="doc_id", n_shards=2,
        pack_budget=30, token_counter="bpe",
    )
    out = c.item("bpc_exp").data.toPandas()
    assert len(out) == 3  # row-preserving
    truth = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_token_counts(
            c.item("bpc").data.dropDuplicates(["doc_id"]),
            "text", "doc_id",
        ).collect()
    }
    for _, r in out.iterrows():
        assert r["n_tokens"] == truth[r["doc_id"]], r["doc_id"]
    assert "_bpe_tkey" not in out.columns
