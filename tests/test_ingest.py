"""Collection.ingest — the one-call daily pipeline operation:
CurationPipeline stages on the incoming batch, persistent-index
near-dedup against the stored corpus, append, funnel stamped into the
item metadata. Composes surfaces that are individually covered by
test_pipeline.py and test_dedup_index.py; here the contract is the
composition and its accounting."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


from pystore_spark.pipeline import CurationPipeline

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "today while the sun shines bright over the quiet green valley "
)


def _docs(ids, tail=""):
    return pd.DataFrame(
        {
            "doc_id": list(ids),
            "text": [
                BASE
                + f"unique tail {i} "
                + "filler words here " * 3
                + tail
                for i in ids
            ],
        }
    )


def _spark_docs(spark, ids, tail=""):
    return spark.createDataFrame(_docs(ids, tail))


def test_ingest_pipeline_only_filters_and_stamps(test_collection, spark):
    c = test_collection
    batch = pd.concat(
        [
            _docs(range(6)),
            pd.DataFrame({"doc_id": [90, 91], "text": ["x", "yy z"]}),
        ]
    )
    sbatch = spark.createDataFrame(batch)
    p = CurationPipeline(sbatch).filter_min_chars(50)
    rep = c.ingest("docs", sbatch, pipeline=p)
    assert rep["n_incoming"] == 8
    assert rep["n_curated"] == 6
    assert rep["n_appended"] == 6
    assert rep["n_dropped_dedup"] == 0
    assert rep["funnel"]["input"] == 8
    assert rep["funnel"]["min_chars>=50"] == 6
    stored = c.item("docs").data
    assert stored.count() == 6
    meta = c.get_item_metadata("docs")
    assert meta["_last_ingest"]["n_appended"] == 6
    assert meta["_ingest_totals"] == {
        "n_batches": 1, "n_incoming": 8, "n_appended": 6,
    }


def test_ingest_applies_transforms_to_stored_text(test_collection, spark):
    c = test_collection
    shared = "this boilerplate footer line is shared by both docs"
    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    f"{BASE}own line one\n{shared}",
                    f"{shared}\n{BASE}own line two",
                ],
            }
        )
    )
    p = CurationPipeline(batch.limit(0)).dedup_lines()
    c.ingest("docs", batch, pipeline=p)
    stored = (
        c.item("docs").data.orderBy("doc_id").toPandas()
    )
    # the non-owner doc lost the shared line BEFORE storage
    assert shared in stored.loc[0, "text"]
    assert shared not in stored.loc[1, "text"]
    assert len(stored) == 2


def test_ingest_with_dedup_index_drops_corpus_dups(test_collection):
    c = test_collection
    c.write("corpus", _docs(range(10)), index_col="doc_id")
    c.build_dedup_index("cidx", "corpus")
    stored = _docs(range(10))
    inc = pd.DataFrame(
        {
            "doc_id": [100, 101],
            "text": [
                stored.loc[3, "text"],  # near-dup of stored doc 3
                BASE * 2 + "entirely fresh content words " * 5,
            ],
        }
    )
    spark = c.spark
    sinc = spark.createDataFrame(inc)
    p = CurationPipeline(sinc).filter_min_chars(10)
    rep = c.ingest(
        "corpus",
        sinc,
        pipeline=p,
        dedup_index="cidx",
        index_col="doc_id",
    )
    assert rep["n_curated"] == 2
    assert rep["n_dropped_dedup"] == 1
    assert rep["n_appended"] == 1
    assert rep["funnel"]["dedup_index:cidx"] == 1
    ids = {
        r["doc_id"] for r in c.item("corpus").data.select("doc_id").collect()
    }
    assert 101 in ids and 100 not in ids


def test_ingest_creates_missing_item(test_collection, spark):
    c = test_collection
    rep = c.ingest("fresh", _spark_docs(spark, range(4)))
    assert rep["n_appended"] == 4
    assert c.item("fresh").data.count() == 4
    # second batch appends
    rep2 = c.ingest("fresh", _spark_docs(spark, range(10, 14)))
    assert rep2["n_appended"] == 4
    assert c.item("fresh").data.count() == 8
    meta = c.get_item_metadata("fresh")
    assert meta["_ingest_totals"]["n_batches"] == 2
    assert meta["_ingest_totals"]["n_appended"] == 8


def test_ingest_record_funnel_false_skips_stamp(test_collection, spark):
    c = test_collection
    rep = c.ingest(
        "docs", _spark_docs(spark, range(3)), record_funnel=False
    )
    assert rep["funnel"] == {}
    meta = c.get_item_metadata("docs") or {}
    assert "_last_ingest" not in meta
    assert c.item("docs").data.count() == 3


def test_async_ingest(test_collection, spark):
    import asyncio

    from pystore_spark.async_operations import AsyncCollection

    async def run():
        c = AsyncCollection(test_collection)
        return await c.ingest("docs", _spark_docs(spark, range(5)))

    rep = asyncio.run(run())
    assert rep["n_appended"] == 5


def test_ingest_funnel_disambiguates_repeated_stage_names(
    test_collection, spark
):
    c = test_collection
    batch = _spark_docs(spark, range(5))
    p = (
        CurationPipeline(batch)
        .filter_min_chars(10)
        .scrub_pii()
        .filter_min_chars(10)
    )
    rep = c.ingest("docs", batch, pipeline=p)
    # both min_chars stages appear; the final stage's count feeds
    # n_curated (positional, not dict-collapsed)
    assert "min_chars>=10" in rep["funnel"]
    assert "min_chars>=10#2" in rep["funnel"]
    assert rep["n_curated"] == 5 and rep["n_appended"] == 5


def test_ingest_single_execution_of_global_stages(test_collection, spark):
    """record_funnel=True must not re-run shuffling stages for the
    append: CurationPipeline.run checkpoints each global stage's
    output, so a nondeterministic-if-recomputed marker survives
    identically into the stored item."""
    c = test_collection
    batch = _spark_docs(spark, range(6))
    calls = {"n": 0}

    def marked_dedup(df):
        calls["n"] += 1
        return df

    p = CurationPipeline(batch).filter_min_chars(10)
    p.transform("marker", marked_dedup)
    p._stages.append(("noop_global", "global", marked_dedup))
    rep = c.ingest("docs", batch, pipeline=p)
    # each stage's df->df factory invoked exactly once for the whole
    # ingest (plan built once; checkpoint prevents re-execution)
    assert calls["n"] == 2
    assert rep["n_appended"] == 6


# ---------------------------------------------------------------------------
# export_training_shards
# ---------------------------------------------------------------------------
def test_export_training_shards_roundtrip(test_collection, spark):
    c = test_collection
    c.write("corpus", _docs(range(40)), index_col="doc_id")
    rep = c.export_training_shards(
        "corpus_shards", "corpus", n_shards=4, pack_budget=64
    )
    assert rep["n_rows"] == 40
    assert rep["shards_nonempty"] == 4
    out = c.item("corpus_shards").data
    cols = set(out.columns)
    assert {"doc_id", "text", "shard", "shard_pos", "n_tokens",
            "pack_id"} <= cols
    assert out.count() == 40
    # hive partition column survives the manifest read; shard filter
    # prunes to one shard's rows
    one = out.filter(F.col("shard") == 0).toPandas()
    assert 0 < len(one) < 40
    meta = c.get_item_metadata("corpus_shards")
    assert meta["_training_export"]["n_shards"] == 4
    assert meta["_training_export"]["n_rows"] == 40


def test_export_training_shards_deterministic_layout(
    test_collection, spark
):
    """Same corpus, different input partitioning -> identical
    (shard, shard_pos, doc_id) assignment and identical within-shard
    order on read-back."""
    c = test_collection
    pdf = _docs(range(60))
    c.write("corpus", pdf, index_col="doc_id")

    def export(name, src_df):
        c.export_training_shards(name, src_df, n_shards=4)
        return (
            c.item(name)
            .data.orderBy("shard", "shard_pos", "doc_id")
            .select("doc_id", "shard")
            .toPandas()
            .reset_index(drop=True)
        )

    base = c.item("corpus").data
    a = export("exp_a", base)
    b = export("exp_b", base.repartition(7))
    pd.testing.assert_frame_equal(a, b)


def test_export_training_shards_overwrite_guard(test_collection, spark):
    import pytest

    from pystore_spark.exceptions import ItemExistsError

    c = test_collection
    c.export_training_shards("exp", _spark_docs(spark, range(5)), n_shards=2)
    with pytest.raises(ItemExistsError):
        c.export_training_shards(
            "exp", _spark_docs(spark, range(5)), n_shards=2
        )
    c.export_training_shards(
        "exp", _spark_docs(spark, range(8)), n_shards=2, overwrite=True
    )
    assert c.item("exp").data.count() == 8


def test_export_salt_changes_assignment(test_collection, spark):
    c = test_collection
    src = _spark_docs(spark, range(30))
    c.export_training_shards("e1", src, n_shards=4)
    c.export_training_shards("e2", src, n_shards=4, salt="epoch2")
    a = c.item("e1").data.select("doc_id", "shard").toPandas()
    b = c.item("e2").data.select("doc_id", "shard").toPandas()
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (m["shard_a"] != m["shard_b"]).any()


def test_export_packs_contiguous_in_file_order(test_collection, spark):
    """Packing must follow the PHYSICAL sort (shard_pos, id): in each
    shard file's row order, pack_id is non-decreasing, so a trainer
    streams fixed-token batches without buffering the shard."""
    c = test_collection
    c.export_training_shards(
        "packed", _spark_docs(spark, range(40)), n_shards=3,
        pack_budget=64,
    )
    pdf = (
        c.item("packed")
        .data.orderBy("shard", "shard_pos", "doc_id")
        .select("shard", "pack_id")
        .toPandas()
    )
    for _, grp in pdf.groupby("shard"):
        seq = grp["pack_id"].tolist()
        assert seq == sorted(seq), f"non-contiguous packs: {seq}"
        assert seq[0] == 0


def test_export_shard_reads_prune_partitions(test_collection, spark):
    """A shard filter on the export item must land in PartitionFilters
    (hive dir pruning before any I/O) — the 'readers stream shards
    independently' claim."""
    c = test_collection
    c.export_training_shards(
        "exp_prune", _spark_docs(spark, range(50)), n_shards=4
    )
    plan = (
        c.item("exp_prune")
        .data.filter(F.col("shard") == 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "shard" in pf and "= 2" in pf


def test_concurrent_ingest_totals_never_lose_increments(
    test_collection, spark
):
    """Concurrent ingests on one item, serialized the documented way
    (CollectionLock around the data path): the metadata stamp's CAS
    accumulation still recomputes totals from fresh state, so
    n_batches/n_appended sum to the true totals."""
    import threading

    from pystore_spark.transactions import CollectionLock

    c = test_collection
    c.ingest("docs", _spark_docs(spark, range(3)))
    errs = []

    def run(lo):
        try:
            with CollectionLock(c):
                c.ingest("docs", _spark_docs(spark, range(lo, lo + 4)))
        except Exception as exc:
            errs.append(exc)

    threads = [
        threading.Thread(target=run, args=(10,)),
        threading.Thread(target=run, args=(20,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    meta = c.get_item_metadata("docs")
    assert meta["_ingest_totals"]["n_batches"] == 3
    assert meta["_ingest_totals"]["n_appended"] == 11
    assert c.item("docs").data.count() == 11


def test_update_metadata_cas_counter_under_contention(
    test_collection, spark
):
    """update_metadata_cas alone, hammered by threads with NO other
    serialization: every increment survives — the local conditional
    put is process-atomic (per-path lock closing the etag-check /
    replace TOCTOU) and losers retry against fresh state."""
    import threading

    from pystore_spark import utils

    c = test_collection
    c.write("ctr", _docs(range(2)), index_col="doc_id")
    path = c._item_path("ctr")

    def bump(meta):
        meta["_n"] = int(meta.get("_n", 0)) + 1
        return meta

    threads = [
        threading.Thread(
            target=lambda: utils.update_metadata_cas(
                path, bump, retries=50
            )
        )
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    man = utils.read_manifest(path)
    assert man["metadata"]["_n"] == 8


def test_export_jsonl_trainer_handoff(test_collection, spark, tmp_path):
    """JSONL export: deterministic shard dirs of gzip jsonl parts a
    trainer reads back line-by-line; same md5 assignment as the
    parquet shard export."""
    import gzip
    import json
    from pathlib import Path

    c = test_collection
    c.write("corpus", _docs(range(30)), index_col="doc_id")
    out = str(tmp_path / "handoff")
    rep = c.export_jsonl("corpus", out, n_shards=4)
    assert rep["n_rows"] == 30

    shard_dirs = sorted(p.name for p in Path(out).iterdir()
                        if p.name.startswith("shard="))
    assert len(shard_dirs) == 4
    seen = set()
    for d in shard_dirs:
        for part in (Path(out) / d).glob("*.json.gz"):
            with gzip.open(part, "rt") as f:
                for line in f:
                    row = json.loads(line)
                    seen.add(row["doc_id"])
                    assert "text" in row
    assert seen == set(range(30))

    # deterministic across runs; errorifexists guards accidental reuse
    import pytest

    with pytest.raises(Exception):
        c.export_jsonl("corpus", out, n_shards=4)
    rep2 = c.export_jsonl("corpus", out, n_shards=4, overwrite=True)
    assert rep2["n_rows"] == 30


def test_export_splits_long_documents(test_collection, spark):
    """split_max_tokens chunks long docs BEFORE sharding/packing: each
    chunk ships as its own row with id '{doc}#{chunk}', every chunk
    fits the window, no token lost at the seams, short docs pass
    through one-to-one."""
    import pandas as pd

    c = test_collection
    long_text = " ".join(f"w{i}" for i in range(100))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [long_text, "short doc only five tokens"],
        }
    )
    c.write("corpus", docs, index_col="doc_id")
    rep = c.export_training_shards(
        "sh",
        "corpus",
        n_shards=2,
        pack_budget=64,
        split_max_tokens=40,
        split_overlap=4,
    )
    out = c.item("sh").data.toPandas()
    # doc 1: starts 0,36,72 -> 3 chunks; doc 2: 1 chunk
    assert rep["n_rows"] == len(out) == 4
    ids = sorted(out["doc_id"])
    assert ids == ["1#0", "1#1", "1#2", "2#0"]
    by = dict(zip(out["doc_id"], out["text"]))
    toks = long_text.split()
    assert by["1#0"] == " ".join(toks[0:40])
    assert by["1#1"] == " ".join(toks[36:76])
    assert by["1#2"] == " ".join(toks[72:100])
    assert by["2#0"] == "short doc only five tokens"
    # packing counted CHUNK tokens (all <= budget)
    assert (out["n_tokens"] <= 40).all()


def test_export_split_composite_ids_are_injective(test_collection):
    """A source id containing '#' must not collide with another doc's
    chunk id (doc '1#0' vs doc '1' chunk 0): '#'/'\\' escape before
    the separator joins, and NULL ids raise instead of silently
    collapsing to the bare chunk number (concat_ws skips NULLs)."""
    import pandas as pd
    import pytest

    c = test_collection
    long_text = " ".join(f"w{i}" for i in range(50))
    docs = pd.DataFrame(
        {
            "doc_id": ["1", "1#0"],
            "text": [long_text, "short doc"],
        }
    )
    c.write("corpus2", docs, index_col="doc_id")
    c.export_training_shards(
        "sh2", "corpus2", n_shards=1, split_max_tokens=40,
    )
    out = c.item("sh2").data.toPandas()
    assert len(out) == len(set(out["doc_id"])) == 3
    # doc '1' chunk 0 and doc '1#0' chunk 0 stay distinct
    assert "1#0" in set(out["doc_id"])          # doc '1', chunk 0
    assert "1\\#0#0" in set(out["doc_id"])      # doc '1#0', chunk 0

    nulls = pd.DataFrame({"doc_id": [None], "text": ["x y z"]})
    c.write("corpus3", nulls, index_col="doc_id")
    with pytest.raises(Exception, match="non-NULL"):
        c.export_training_shards(
            "sh3", "corpus3", n_shards=1, split_max_tokens=4,
        )


def test_refresh_training_shards_incremental_equals_full_reexport(
    test_collection, spark
):
    """Incremental shard refresh: after appends, an upsert, and a
    delete, refreshing ONLY the affected shards must equal a full
    re-export bit-for-bit (every post-shard stage is shard-local), and
    shards no changed doc touches must keep their EXACT files (the
    partition-scoped manifest swap never rewrites them)."""
    from pystore_spark import utils as U

    c = test_collection
    c.write("corpus", _docs(range(40)), index_col="doc_id")
    c.export_training_shards(
        "shards", "corpus", n_shards=8, pack_budget=64
    )
    man0 = U.read_manifest(c._item_path("shards"))
    files0 = {}
    for f in man0["files"]:
        files0.setdefault(f.split("/")[0], set()).add(f)

    # mutate the corpus: 3 new docs, 1 updated (keep_last upsert),
    # 1 deleted
    c.append("corpus", _docs(range(40, 43)))
    upd = _docs([3])
    upd["text"] = "completely rewritten text for document three " * 3
    c.append("corpus", upd)  # keep_last upsert on doc_id
    c.delete_where("corpus", [("doc_id", "==", 7)])
    changed = [3, 7, 40, 41, 42]

    rep = c.refresh_training_shards("shards", changed)
    assert 1 <= len(rep["shards"]) <= 5  # md5 scatter, ≤ one per id

    # ground truth: a full re-export of the current corpus
    c.export_training_shards(
        "shards_full", "corpus", n_shards=8, pack_budget=64
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

    # untouched shards kept their exact committed files
    man1 = U.read_manifest(c._item_path("shards"))
    files1 = {}
    for f in man1["files"]:
        files1.setdefault(f.split("/")[0], set()).add(f)
    touched = {f"shard={s}" for s in rep["shards"]}
    for d, fl in files0.items():
        if d not in touched:
            assert files1.get(d) == fl, d
    for d in touched:
        if d in files0 and d in files1:
            assert files1[d] != files0[d], d
    # metadata stats refreshed + refresh counted
    em = c.get_item_metadata("shards")["_training_export"]
    assert em["n_rows"] == 42 and em["n_refreshes"] == 1


def test_refresh_training_shards_split_chunks_and_empty_shard(
    test_collection, spark
):
    """Split-export refresh: a text edit that CHANGES a doc's chunk
    count must rebuild both the old chunks' shards (found via the
    persisted _src_id column) and the new ones; deleting the only doc
    of a shard drops that shard from the manifest."""
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
        "sh", "corpus", n_shards=6, split_max_tokens=40,
        split_overlap=4,
    )
    # doc 1 shrinks from 3 chunks to 1; doc 5 is deleted outright
    upd = pd.DataFrame(
        {"doc_id": [1], "text": ["now just a handful of tokens"]}
    )
    c.append("corpus", upd)
    c.delete_where("corpus", [("doc_id", "==", 5)])

    rep = c.refresh_training_shards("sh", [1, 5])
    c.export_training_shards(
        "sh_full", "corpus", n_shards=6, split_max_tokens=40,
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
    assert rep["n_shards_rebuilt"] + rep["n_shards_dropped"] >= 1
    # old chunk ids of doc 1 are gone, the single new chunk remains
    ids = set(got["doc_id"])
    assert "1#0" in ids and "1#1" not in ids and "1#2" not in ids
    assert not any(i.startswith("5#") for i in ids)


def test_delete_where_refresh_exports_reaches_training_shards(
    test_collection, spark
):
    """GDPR completeness: a takedown must reach the shards a trainer
    actually reads, not just the source item. delete_where(
    refresh_exports=True) captures the matching ids before the rows
    vanish and rebuilds only their shards in every export of the item;
    update_where gets the same flag. Exports the automatic path can't
    serve report a reason instead of failing the DML."""
    c = test_collection
    c.write("corpus", _docs(range(30)), index_col="doc_id")
    c.export_training_shards("exp_a", "corpus", n_shards=8)
    c.export_training_shards(
        "exp_b", "corpus", n_shards=4, pack_budget=64
    )
    assert sorted(c.exports_of("corpus")) == ["exp_a", "exp_b"]

    rep = c.delete_where(
        "corpus", [("doc_id", "in", [4, 9])], refresh_exports=True
    )
    assert rep["n_deleted"] == 2
    er = rep["export_refreshes"]
    assert set(er) == {"exp_a", "exp_b"}
    for name in ("exp_a", "exp_b"):
        assert "error" not in er[name]
        ids = {
            r["doc_id"]
            for r in c.item(name).data.select("doc_id").collect()
        }
        assert ids == set(range(30)) - {4, 9}

    # update flows through too: the exported text follows the source
    upd = c.update_where(
        "corpus", [("doc_id", "==", 5)],
        {"text": F.lit("redacted text five")},
        refresh_exports=True,
    )
    assert upd["n_updated"] == 1 and set(upd["export_refreshes"]) == {
        "exp_a", "exp_b"
    }
    (row,) = (
        c.item("exp_a").data.filter(F.col("doc_id") == 5)
        .select("text").collect()
    )
    assert row["text"] == "redacted text five"
    # equivalence with a fresh export of the mutated corpus
    c.export_training_shards("exp_ref", "corpus", n_shards=8)
    cols = ["shard", "shard_pos", "doc_id", "text"]
    got = (
        c.item("exp_a").data.select(cols).orderBy(*cols)
        .toPandas().reset_index(drop=True)
    )
    want = (
        c.item("exp_ref").data.select(cols).orderBy(*cols)
        .toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_describe_reports_export_role_and_lineage(
    test_collection, spark
):
    c = test_collection
    c.write("corpus", _docs(range(10)), index_col="doc_id")
    c.export_training_shards("expd", "corpus", n_shards=2)
    d = c.describe("expd")
    assert d["roles"].get("training_export")
    assert c.describe("corpus")["exports_of"] == ["expd"]


def test_refresh_staled_shard_files_are_gc_able(
    test_collection, spark, monkeypatch
):
    """The partition-scoped refresh moves replaced shard files to the
    manifest's stale map; the standard retention GC must reclaim them
    (hive shard dirs are just parent dirs to the manifest protocol)."""
    from pystore_spark import config
    from pystore_spark import utils as U

    c = test_collection
    c.write("corpus", _docs(range(20)), index_col="doc_id")
    c.export_training_shards("expg", "corpus", n_shards=4)
    c.append("corpus", _docs(range(20, 23)))
    rep = c.refresh_training_shards("expg", [20, 21, 22])
    man = U.read_manifest(c._item_path("expg"))
    n_stale = len(man.get("stale") or {})
    # ≥1: every rebuilt shard that HAD files stales them (an affected
    # shard can have been empty pre-refresh, so not necessarily ≥
    # n_shards_rebuilt)
    assert n_stale >= 1 and rep["n_shards_rebuilt"] >= 1
    monkeypatch.setattr(config, "STALE_RETENTION_SECONDS", 0.0)
    removed = c.recover_item("expg")
    assert removed >= n_stale
    man2 = U.read_manifest(c._item_path("expg"))
    assert not man2.get("stale")
    assert c.item("expg").data.count() == 23  # live set intact


def test_verify_export_flags_drift_and_refresh_repairs(
    test_collection, spark
):
    """verify_export: the export-side fsck (sibling of verify_index).
    Out-of-band source changes leave the export silently stale — the
    audit reports missing docs (under-sampled by trainers) and stale
    docs (taken-down content still shipping); refresh with the
    missing/stale ids repairs, audit goes green."""
    c = test_collection
    c.write("corpus", _docs(range(20)), index_col="doc_id")
    c.export_training_shards("expv", "corpus", n_shards=4)
    assert c.verify_export("expv")["ok"]

    # out-of-band drift: docs added and deleted WITHOUT refresh
    c.append("corpus", _docs([50, 51]))
    c.delete_where("corpus", [("doc_id", "==", 3)])
    audit = c.verify_export("expv")
    assert not audit["ok"]
    assert audit["n_missing"] == 2 and audit["n_stale"] == 1
    assert audit["missing_sample"] == [50, 51]
    assert audit["stale_sample"] == [3]
    assert audit["samples_escaped"] is False

    # the audit's samples drive the repair directly (unsplit export)
    c.refresh_training_shards(
        "expv", audit["missing_sample"] + audit["stale_sample"]
    )
    after = c.verify_export("expv")
    assert after["ok"] and after["n_exported_docs"] == 21


def test_maintain_audits_training_exports(test_collection, spark):
    """Round-10 verdict #6: indexes got the nightly fsck via
    maintain(verify_indexes=True) but exports only on demand. Seed
    out-of-band drift (source changes WITHOUT refresh_exports) and
    maintain must surface it under verify_export — report-only, the
    export itself untouched."""
    c = test_collection
    c.write("corpus", _docs(range(20)), index_col="doc_id")
    c.export_training_shards("expm", "corpus", n_shards=4)

    res = c.maintain("expm", verify_indexes=True)
    assert res["expm"]["verify_export"]["ok"]

    c.append("corpus", _docs([70, 71]))
    c.delete_where("corpus", [("doc_id", "==", 2)])
    res = c.maintain("expm", verify_indexes=True)
    audit = res["expm"]["verify_export"]
    assert not audit["ok"]
    assert audit["n_missing"] == 2 and audit["n_stale"] == 1
    # report-only: the export still has the stale doc until a
    # deliberate refresh repairs it
    ids = {
        r["doc_id"]
        for r in c.item("expm").data.select("doc_id").collect()
    }
    assert 2 in ids and 70 not in ids
    # without the flag, no export audit runs
    res2 = c.maintain("expm", verify_indexes=False)
    assert "verify_export" not in res2["expm"]
