"""WebDataset-style tar shard export — the multimodal training
hand-off.

The WebDataset convention (public format used by large-scale vision /
multimodal training loaders): a dataset is a set of ``.tar`` shards;
each sample's members share a key prefix and carry one file per
modality — ``{key}.txt`` for text, ``{key}.json`` for metadata,
``{key}.bin`` for an opaque binary payload (image/audio bytes — the
engine treats them as opaque, matching functions/multimodal.py).

Distribution model (the part that must survive 100 TB):

* shard assignment + within-shard order come from
  :func:`pystore_spark.functions.sampling.assign_shards` — md5 of the
  key IS the global shuffle, so the contents of every shard are a
  pure function of the data, independent of cluster size, partition
  layout, or execution order;
* one ``repartition(n_shards, "shard")`` + ``sortWithinPartitions``
  lands each shard's rows contiguously and sorted inside one task —
  the only shuffle in the job;
* each task streams its shards to tar files directly (mapInPandas —
  the tar serialization is per-row Python I/O, the honest sink cost;
  everything before it is JVM);
* tar bytes are canonical: USTAR format, zeroed mtime/uid/gid, sorted
  member order, compact sorted-key JSON — so two exports of the same
  data are BYTE-identical and the per-shard md5 in the returned
  manifest is a reproducible content address (verified by
  tests/test_webdataset.py on shuffled inputs);
* crash/retry safe: tars materialize under a task-unique ``.tmp-*``
  name and ``os.replace`` into place — a re-run of a failed task
  overwrites, never corrupts or duplicates.

Reference parity: the reference engine has no tar export; this is a
beyond-reference capability alongside export_jsonl (trainer text
hand-off) and export_training_shards (packed parquet shards).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
import uuid
from typing import TYPE_CHECKING, Iterator, Sequence

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

REPORT_SCHEMA = (
    "shard bigint, path string, n_samples bigint, n_bytes bigint, "
    "md5 string"
)


def _json_bytes(rec: dict) -> bytes:
    """Canonical JSON: sorted keys, compact separators, non-native
    types (timestamps, decimals) via str — deterministic bytes."""
    return json.dumps(
        rec, sort_keys=True, separators=(",", ":"), default=str,
        ensure_ascii=False,
    ).encode("utf-8")


def _add_member(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0  # zeroed metadata → byte-deterministic archives
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(payload))


def write_shard_tars(
    out_dir: str,
    key_col: str,
    text_col: str | None,
    binary_col: str | None,
    meta_cols: Sequence[str],
) -> "callable":
    """Build the mapInPandas function: consumes (shard, shard_pos,
    *cols)-sorted batches, streams one tar per shard (shards are
    contiguous within a task after the repartition+sort), yields one
    report row per finished shard."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cur_shard: int | None = None
        tar: tarfile.TarFile | None = None
        tmp_path = final_path = ""
        n_samples = 0
        reports: list[dict] = []

        def finish() -> None:
            nonlocal tar, n_samples
            if tar is None:
                return
            tar.close()
            os.replace(tmp_path, final_path)
            h = hashlib.md5()
            with open(final_path, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            reports.append(
                {
                    "shard": cur_shard,
                    "path": final_path,
                    "n_samples": n_samples,
                    "n_bytes": os.path.getsize(final_path),
                    "md5": h.hexdigest(),
                }
            )
            tar = None
            n_samples = 0

        for pdf in batches:
            for rec in pdf.to_dict("records"):
                shard = int(rec["shard"])
                if shard != cur_shard:
                    finish()
                    cur_shard = shard
                    final_path = os.path.join(
                        out_dir, f"shard-{shard:06d}.tar"
                    )
                    # task-unique tmp: a retried task re-streams and
                    # re-replaces; a crashed attempt leaves only .tmp-*
                    tmp_path = os.path.join(
                        out_dir,
                        f".tmp-{uuid.uuid4().hex}-{shard:06d}.tar",
                    )
                    tar = tarfile.open(
                        tmp_path, "w", format=tarfile.USTAR_FORMAT
                    )
                key = str(rec[key_col])
                if text_col is not None and rec.get(text_col) is not None:
                    _add_member(
                        tar, f"{key}.txt",
                        str(rec[text_col]).encode("utf-8"),
                    )
                if binary_col is not None:
                    payload = rec.get(binary_col)
                    if payload is not None:
                        _add_member(tar, f"{key}.bin", bytes(payload))
                meta = {c: rec.get(c) for c in meta_cols}
                meta[key_col] = rec[key_col]
                _add_member(tar, f"{key}.json", _json_bytes(meta))
                n_samples += 1
        finish()
        yield pd.DataFrame(
            reports,
            columns=["shard", "path", "n_samples", "n_bytes", "md5"],
        )

    return run


def export(
    collection,
    source,
    out_dir: str,
    key_col: str = "doc_id",
    text_col: str | None = "text",
    binary_col: str | None = None,
    n_shards: int = 16,
    salt: str = "",
    overwrite: bool = False,
) -> dict:
    """Implementation of :meth:`Collection.export_webdataset`."""
    from pystore_spark.exceptions import StorageError
    from pystore_spark.functions import sampling as SA

    df: "DataFrame" = (
        collection.item(source).data
        if isinstance(source, str)
        else source
    )
    for c in (key_col, text_col, binary_col):
        if c is not None and c not in df.columns:
            raise ValueError(f"column {c!r} not in source frame")
    if os.path.exists(out_dir) and os.listdir(out_dir):
        if not overwrite:
            raise StorageError(
                f"out_dir {out_dir!r} is not empty; pass overwrite=True"
            )
        for f in os.listdir(out_dir):
            if f.startswith("shard-") or f.startswith(".tmp-"):
                os.remove(os.path.join(out_dir, f))
    os.makedirs(out_dir, exist_ok=True)

    meta_cols = [
        c
        for c in df.columns
        if c not in (key_col, text_col, binary_col)
    ]
    sharded = (
        SA.assign_shards(df, key_col, n_shards, salt)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos", key_col)
        .drop("shard_pos")
    )
    run = write_shard_tars(
        out_dir, key_col, text_col, binary_col, meta_cols
    )
    shards = sorted(
        (r.asDict() for r in
         sharded.mapInPandas(run, REPORT_SCHEMA).collect()),
        key=lambda d: d["shard"],
    )
    return {
        "out_dir": out_dir,
        "n_shards": len(shards),
        "n_samples": sum(s["n_samples"] for s in shards),
        "shards": shards,
    }
