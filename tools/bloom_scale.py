"""Bloom file-skipping scale evidence: id point-lookup cost vs corpus
size.

The bloom sidecar's 100 TB claim (bloom.py): an equality probe on a
hash-distributed string id touches only the files whose per-file
filter admits the value — O(1-ish file reads) — while the same probe
without blooms must scan every live file (zonemaps cannot skip on
md5-shaped ids). Measured directly: build a corpus item at 1× and one
at 10× (more files, same file size), then time present-id and
absent-id lookups with blooms on vs off on the SAME data. Decisive
evidence: bloomed probe time stays ~flat at 10× the corpus (and the
absent-id probe is proven empty with zero file reads), while the
unbloomed probe time grows with the file count.

Writes BENCH_BLOOM.json at the repo root.
Usage: python tools/bloom_scale.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _time_lookup(col, item, ids):
    t0 = time.perf_counter()
    n = 0
    for i in ids:
        it = col.item(item, filters=[("id_str", "==", i)])
        n += it.data.count()
    return time.perf_counter() - t0, n


def main() -> None:
    import hashlib

    import numpy as np
    import pandas as pd

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.session import get_spark

    spark = get_spark(app_name="bloom_scale")
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    out: dict = {"metric": "bloom_point_lookup_scaling", "cases": {}}
    tmp = tempfile.mkdtemp(prefix="ps_bloom_scale_")
    old_path = cfg._path
    try:
        cfg.set_path(tmp)
        col = ps.store("bloom_scale", spark=spark).collection("c")

        def build(label: str, n_rows: int, n_files: int):
            df = (
                spark.range(n_rows)
                .withColumn("doc_id", F.col("id"))
                .withColumn(
                    "id_str", F.md5(F.col("id").cast("string"))
                )
                .withColumn(
                    "payload",
                    F.concat(F.lit("x" * 64), F.col("id").cast("string")),
                )
                .drop("id")
            )
            col.write(
                label, df, index_col="doc_id",
                npartitions=n_files, bloom=["id_str"],
            )
            return n_rows

        # warmup (JVM + codegen + first manifest commit)
        build("warm", 10_000, 2)
        _time_lookup(
            col, "warm",
            [hashlib.md5(b"1").hexdigest(), "zz-absent"],
        )

        rng = np.random.default_rng(7)
        for label, n_rows, n_files in (
            ("x1_200k_16f", 200_000, 16),
            ("x10_2m_160f", 2_000_000, 160),
        ):
            build(label, n_rows, n_files)
            present = [
                hashlib.md5(str(int(v)).encode()).hexdigest()
                for v in rng.integers(0, n_rows, 8)
            ]
            absent = [f"zz-absent-{i}" for i in range(8)]
            t_p, n_p = _time_lookup(col, label, present)
            t_a, n_a = _time_lookup(col, label, absent)
            rep = col.item(
                label, filters=[("id_str", "==", present[0])]
            ).scan_report()
            # blooms off: same item, same probes, full candidate set
            col.set_bloom(label, None)
            t_p0, _ = _time_lookup(col, label, present)
            t_a0, _ = _time_lookup(col, label, absent)
            col.set_bloom(label, ["id_str"])
            out["cases"][label] = {
                "n_rows": n_rows,
                "n_files_live": rep["n_files_live"],
                "files_selected_present": rep["n_files_selected"],
                "present_bloom_sec": round(t_p, 4),
                "present_nobloom_sec": round(t_p0, 4),
                "absent_bloom_sec": round(t_a, 4),
                "absent_nobloom_sec": round(t_a0, 4),
                "rows_found_present": n_p,
                "rows_found_absent": n_a,
            }
        x1 = out["cases"]["x1_200k_16f"]
        x10 = out["cases"]["x10_2m_160f"]
        out["probe_time_ratio_at_10x_bloom"] = round(
            x10["present_bloom_sec"] / x1["present_bloom_sec"], 3
        )
        out["probe_time_ratio_at_10x_nobloom"] = round(
            x10["present_nobloom_sec"] / x1["present_nobloom_sec"], 3
        )
        out["speedup_present_at_10x"] = round(
            x10["present_nobloom_sec"] / x10["present_bloom_sec"], 3
        )
        out["speedup_absent_at_10x"] = round(
            x10["absent_nobloom_sec"] / x10["absent_bloom_sec"], 3
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)
    dest = Path(__file__).resolve().parent.parent / "BENCH_BLOOM.json"
    dest.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
