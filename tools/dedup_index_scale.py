"""Dedup-index scale evidence: probe cost vs corpus size.

The whole point of the persistent incremental near-dedup index
(dedup_index.py) is that appending a batch costs O(batch + touched
index files), NOT O(corpus). This tool measures it directly: build
the index over the sf0.01 corpus (500 docs) and the sf0.1 corpus
(5,000 docs), then probe the SAME 100-document batch against each and
compare wall time. A corpus-proportional probe would show ~10×; the
index probe should be near-flat (fixed job latency + the touched
band-key files).

For contrast it also times the BATCH pipeline's way of answering the
same question — near_dedup over (corpus ∪ batch) — which re-signs the
corpus and IS corpus-proportional.

Writes BENCH_DEDUP_INDEX.json at the repo root.
Usage: python tools/dedup_index_scale.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.functions.dedup import near_dedup
    from pystore_spark.session import get_spark
    from pystore_spark.sources import load_table

    spark = get_spark(app_name="dedup_index_scale")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ps_didx_scale_")
    old_path = cfg._path
    out: dict = {"metric": "dedup_index_probe_vs_corpus_size"}
    try:
        cfg.set_path(tmp)
        col = ps.store("scale", spark=spark).collection("c")
        results = {}
        for sf, label in (("sf0.01", "corpus_500"), ("sf0.1", "corpus_5000")):
            docs = load_table(
                spark, f"/root/testdata/{sf}", "documents"
            ).select("doc_id", "text")
            batch = (
                docs.orderBy("doc_id")
                .limit(100)
                .withColumn("doc_id", F.col("doc_id") + 1_000_000)
            ).localCheckpoint(eager=True)
            item, idx = f"corpus_{label}", f"idx_{label}"
            t0 = time.perf_counter()
            col.write(item, docs, index_col="doc_id")
            col.build_dedup_index(idx, item)
            build_sec = time.perf_counter() - t0

            col.probe_dedup_index(idx, batch).collect()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                col.probe_dedup_index(idx, batch).collect()
                best = min(best, time.perf_counter() - t0)

            # the batch pipeline's equivalent: re-derive over the union
            t0 = time.perf_counter()
            near_dedup(
                docs.unionByName(batch), "text", "doc_id"
            ).count()
            batch_pipeline_sec = time.perf_counter() - t0

            results[label] = {
                "build_sec": round(build_sec, 2),
                "probe_sec": round(best, 2),
                "batch_near_dedup_sec": round(batch_pipeline_sec, 2),
            }
        r5, r50 = results["corpus_500"], results["corpus_5000"]
        out["results"] = results
        out["probe_ratio_10x_corpus"] = round(
            r50["probe_sec"] / r5["probe_sec"], 2
        )
        out["batch_pipeline_ratio_10x_corpus"] = round(
            r50["batch_near_dedup_sec"] / r5["batch_near_dedup_sec"], 2
        )
        out["verdict"] = (
            "probe is corpus-independent"
            if out["probe_ratio_10x_corpus"] < 2.0
            else "probe scales with corpus — REGRESSION"
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)

    Path(
        Path(__file__).resolve().parent.parent / "BENCH_DEDUP_INDEX.json"
    ).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
