"""Substring-index scale evidence: incremental span-cut cost vs
corpus size.

The persistent gram census (substring_index.py) claims cross-ingest
exact substring dedup in O(batch): the batch's distinct gram hashes
broadcast against one parallel census scan — never a census shuffle,
never the O(corpus) gram re-shuffle the batch operator
(functions/text.dedup_substrings) pays per run. Measured directly:
build the census over the sf0.1 corpus (5k docs) and a 10x
key-shifted, token-decorated replication (50k docs, ~10x distinct
grams), then run dedup_substrings_incremental on the SAME
100-document batch against each. The batch pipeline's way —
dedup_substrings over (corpus ∪ batch) — is also timed: it re-grams
and re-shuffles the corpus, so it is asymptotically
corpus-proportional; the decisive evidence is the probe ratio
staying ~flat at 10× the census.

Writes BENCH_SUBSTRING_INDEX.json at the repo root.
Usage: python tools/substring_index_scale.py
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
    from pystore_spark.functions.text import dedup_substrings
    from pystore_spark.session import get_spark
    from pystore_spark.sources import load_table

    spark = get_spark(app_name="substring_index_scale")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ps_sidx_scale_")
    old_path = cfg._path
    out: dict = {"metric": "substring_index_probe_vs_corpus_size"}
    K = 8
    try:
        cfg.set_path(tmp)
        col = ps.store("scale", spark=spark).collection("c")
        base = load_table(
            spark, "/root/testdata/sf0.1", "documents"
        ).select("doc_id", "text")

        def replicate(k: int):
            """k key-shifted copies with per-copy TOKEN prefixes, so
            every gram of a decorated copy is distinct — the census
            grows ~k×. Copy 0 stays UNDECORATED: the probe batch is
            undecorated base text, so both corpus sizes hand the
            probe the identical hit set (otherwise the big-corpus
            probe would do zero removals and the ratio would compare
            different work)."""
            if k == 1:
                return base
            copies = [base] + [
                base.select(
                    (F.col("doc_id") + 100_000 * i).alias("doc_id"),
                    F.array_join(
                        F.transform(
                            F.split("text", r"\s+"),
                            lambda t: F.concat(F.lit(f"c{i}_"), t),
                        ),
                        " ",
                    ).alias("text"),
                )
                for i in range(1, k)
            ]
            u = copies[0]
            for c in copies[1:]:
                u = u.unionByName(c)
            return u

        results = {}
        for k, label in ((1, "corpus_5k"), (10, "corpus_50k")):
            docs = replicate(k).localCheckpoint(eager=True)
            batch = (
                base.orderBy("doc_id")
                .limit(100)
                .withColumn("doc_id", F.col("doc_id") + 10_000_000)
            ).localCheckpoint(eager=True)
            item, idx = f"corpus_{label}", f"gidx_{label}"
            t0 = time.perf_counter()
            col.write(item, docs, index_col="doc_id")
            col.build_substring_index(idx, item, k=K)
            build_sec = time.perf_counter() - t0

            # warm + min-of-3 (update_index=False: measure the probe
            # and span cut, not the delta append)
            col.dedup_substrings_incremental(
                idx, batch, update_index=False
            )
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                col.dedup_substrings_incremental(
                    idx, batch, update_index=False
                )
                best = min(best, time.perf_counter() - t0)

            t0 = time.perf_counter()
            dedup_substrings(
                docs.unionByName(batch), id_col="doc_id", k=K
            ).count()
            batch_pipeline_sec = time.perf_counter() - t0

            results[label] = {
                "build_sec": round(build_sec, 2),
                "probe_sec": round(best, 2),
                "batch_dedup_substrings_sec": round(
                    batch_pipeline_sec, 2
                ),
            }
        r5, r50 = results["corpus_5k"], results["corpus_50k"]
        out["results"] = results
        out["probe_ratio_10x_corpus"] = round(
            r50["probe_sec"] / r5["probe_sec"], 2
        )
        out["batch_pipeline_ratio_10x_corpus"] = round(
            r50["batch_dedup_substrings_sec"]
            / r5["batch_dedup_substrings_sec"],
            2,
        )
        out["verdict"] = (
            "incremental span cut is corpus-independent"
            if out["probe_ratio_10x_corpus"] < 2.0
            else "span cut scales with corpus — REGRESSION"
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)

    Path(
        Path(__file__).resolve().parent.parent
        / "BENCH_SUBSTRING_INDEX.json"
    ).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
