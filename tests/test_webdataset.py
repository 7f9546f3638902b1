"""WebDataset tar shard export (pystore_spark/webdataset.py)."""

from __future__ import annotations

import json
import os
import tarfile

import pandas as pd
import pytest

from pystore_spark.exceptions import StorageError


@pytest.fixture()
def docs(spark):
    import pyspark.sql.functions as F

    rows = [
        (i, f"document body {i} " + "x" * (i % 7), f"src{i % 3}", i * 10)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, score bigint"
    )
    return df.withColumn("payload", F.encode(F.col("text"), "utf-8"))


def _read_tar(path):
    out = {}
    with tarfile.open(path) as t:
        for m in t.getmembers():
            out[m.name] = t.extractfile(m).read()
    return out


def test_roundtrip_members(test_collection, docs, tmp_path):
    rep = test_collection.export_webdataset(
        docs, str(tmp_path / "wds"), binary_col="payload", n_shards=4
    )
    assert rep["n_samples"] == 60
    assert rep["n_shards"] == 4
    seen = set()
    for s in rep["shards"]:
        members = _read_tar(s["path"])
        keys = {n.split(".")[0] for n in members}
        assert len(members) == 3 * len(keys) == 3 * s["n_samples"]
        for k in keys:
            meta = json.loads(members[f"{k}.json"])
            assert meta["doc_id"] == int(k)
            assert set(meta) == {"doc_id", "source", "score"}
            assert members[f"{k}.txt"] == members[f"{k}.bin"]
            assert members[f"{k}.txt"].decode().startswith(
                f"document body {k} "
            )
        seen |= {int(k) for k in keys}
    assert seen == set(range(60))


def test_byte_determinism_across_layouts(test_collection, docs, tmp_path):
    a = test_collection.export_webdataset(
        docs, str(tmp_path / "a"), n_shards=4
    )
    # different physical layout + row order must not change a byte
    shuffled = docs.repartition(7).sortWithinPartitions("source")
    b = test_collection.export_webdataset(
        shuffled, str(tmp_path / "b"), n_shards=4
    )
    assert [
        (s["shard"], s["n_samples"], s["md5"]) for s in a["shards"]
    ] == [(s["shard"], s["n_samples"], s["md5"]) for s in b["shards"]]


def test_salt_changes_assignment(test_collection, docs, tmp_path):
    a = test_collection.export_webdataset(
        docs, str(tmp_path / "a"), n_shards=4
    )
    b = test_collection.export_webdataset(
        docs, str(tmp_path / "b"), n_shards=4, salt="epoch1"
    )
    assert [s["md5"] for s in a["shards"]] != [
        s["md5"] for s in b["shards"]
    ]
    assert sum(s["n_samples"] for s in b["shards"]) == 60


def test_overwrite_guard(test_collection, docs, tmp_path):
    out = str(tmp_path / "wds")
    test_collection.export_webdataset(docs, out, n_shards=2)
    with pytest.raises(StorageError, match="not empty"):
        test_collection.export_webdataset(docs, out, n_shards=2)
    rep = test_collection.export_webdataset(
        docs, out, n_shards=2, overwrite=True
    )
    assert rep["n_samples"] == 60
    assert not [
        f for f in os.listdir(out) if f.startswith(".tmp-")
    ]


def test_item_source_and_text_only(test_collection, docs, tmp_path):
    test_collection.write("corpus", docs.drop("payload"),
                          index_col="doc_id")
    rep = test_collection.export_webdataset(
        "corpus", str(tmp_path / "wds"), n_shards=2
    )
    assert rep["n_samples"] == 60
    members = _read_tar(rep["shards"][0]["path"])
    assert all(n.endswith((".txt", ".json")) for n in members)


def test_missing_column_rejected(test_collection, docs, tmp_path):
    with pytest.raises(ValueError, match="not in source"):
        test_collection.export_webdataset(
            docs, str(tmp_path / "w"), binary_col="nope"
        )
